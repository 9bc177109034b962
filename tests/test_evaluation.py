"""PRDC + VGG feature-extractor tests."""

import jax
import numpy as np
import pytest

from srgan_tpu.evaluation import GANEvaluation, compute_prdc, evaluation_init
from srgan_tpu.evaluation.features import init_vgg, preprocess_for_vgg
from srgan_tpu.evaluation.harness import comparison_table
from srgan_tpu.evaluation.prdc import compute_prdc_numpy


def test_prdc_matches_numpy_oracle(rng):
    real = rng.standard_normal((64, 16)).astype(np.float32)
    fake = (rng.standard_normal((48, 16)) * 1.2 + 0.3).astype(np.float32)
    got = compute_prdc(real, fake, nearest_k=5)
    ref = compute_prdc_numpy(real, fake, nearest_k=5)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=2e-3), k


def test_prdc_matches_vendored_prdc_package():
    """Pin against the vendored prdc==0.2 algorithm (the exact package the
    reference calls, evaluation.py:98-110) — a third-party oracle, including
    asymmetric set sizes."""
    from vendor_prdc import compute_prdc as prdc_pkg

    local = np.random.default_rng(11)  # own rng: keep the shared fixture's
    real = local.standard_normal((128, 24)).astype(np.float32)  # stream intact
    fake = (local.standard_normal((77, 24)) * 0.8 + 0.5).astype(np.float32)
    got = compute_prdc(real, fake, nearest_k=5)
    ref = prdc_pkg(real, fake, nearest_k=5)
    for k in ref:
        assert got[k] == pytest.approx(float(ref[k]), abs=2e-3), k


def test_prdc_matches_vendored_package_with_duplicates():
    """Duplicate points give zero kth-NN radii for small k — the strict '<'
    comparisons must agree with the package bit-for-bit (this requires the
    exact diff-based distances; the Gram identity would turn the zero radii
    into ~1e-3)."""
    from vendor_prdc import compute_prdc as prdc_pkg

    local = np.random.default_rng(12)
    base = local.standard_normal((20, 8)).astype(np.float32)
    real = np.concatenate([base, base, base], axis=0)        # every point x3
    fake = np.concatenate([base[:10], base[:10],
                           local.standard_normal((25, 8)).astype(np.float32)])
    for k in (1, 3, 5):
        got = compute_prdc(real, fake, nearest_k=k)
        ref = prdc_pkg(real, fake, nearest_k=k)
        for key in ref:
            assert got[key] == pytest.approx(float(ref[key]), abs=1e-4), (
                key, k)


def test_prdc_identical_distributions(rng):
    """Same distribution -> all metrics near 1 (precision/recall/coverage)."""
    x = rng.standard_normal((200, 8)).astype(np.float32)
    got = compute_prdc(x[:100], x[100:], nearest_k=5)
    assert got["precision"] > 0.9
    assert got["recall"] > 0.9
    assert got["coverage"] > 0.85
    assert got["density"] > 0.7


def test_prdc_disjoint_distributions(rng):
    a = rng.standard_normal((80, 8)).astype(np.float32)
    b = rng.standard_normal((80, 8)).astype(np.float32) + 100.0
    got = compute_prdc(a, b, nearest_k=5)
    assert got["precision"] == 0.0
    assert got["recall"] == 0.0
    assert got["coverage"] == 0.0
    assert got["density"] == 0.0


def test_prdc_exact_match_identity(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    got = compute_prdc(x, x, nearest_k=5)
    ref = compute_prdc_numpy(x, x, nearest_k=5)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-3)


def test_vgg_feature_shapes():
    _, variables = init_vgg(jax.random.PRNGKey(0))
    from srgan_tpu.evaluation.features import VGG19BN
    model = VGG19BN()
    x = np.zeros((2, 224, 224, 3), np.float32)
    feat = model.apply(variables, x, output="feature")
    assert feat.shape == (2, 4096)
    score = model.apply(variables, x, output="score")
    assert score.shape == (2, 1000)
    # 16 convs in vgg19
    assert "conv_15" in variables["params"]
    assert "conv_16" not in variables["params"]


def test_preprocess_pipeline(rng):
    imgs = rng.uniform(-1, 1, (3, 128, 128, 3)).astype(np.float32)
    out = preprocess_for_vgg(imgs)
    assert out.shape == (3, 224, 224, 3)
    # ImageNet normalization: channel means shifted below zero typically
    assert np.isfinite(out).all()
    assert out.std() > 0.5


def test_evaluation_init_layout():
    d = evaluation_init(["vgg-initialization"], (0, 1), ("precision",))
    assert d["vgg-initialization"][0][1]["precision"] == []


def test_gan_evaluation_end_to_end(rng):
    """Random-init VGG extractor + PRDC over tiny image sets: same set ->
    high coverage; disjoint color distributions -> lower coverage."""
    ev = GANEvaluation("vgg-initialization", seed=0)
    a = rng.uniform(-1, 1, (12, 128, 128, 3)).astype(np.float32)
    same = ev.get_prdc(a, a.copy(), nearest_k=3)
    assert same["precision"] == pytest.approx(1.0)
    assert same["coverage"] == pytest.approx(1.0)

    table = evaluation_init(["vgg-initialization"], (0, 1))
    table["vgg-initialization"][0][1]["precision"].append(same["precision"])
    table["vgg-initialization"][0][0]["precision"].append(0.5)
    table["vgg-initialization"][1][0]["precision"].append(0.25)
    table["vgg-initialization"][1][1]["precision"].append(0.75)
    mat = comparison_table(table, "vgg-initialization", "precision", (0, 1))
    assert mat.shape == (2, 2) and mat[0, 1] == pytest.approx(1.0)


def test_gan_evaluation_requires_weights_for_pretrained():
    with pytest.raises(ValueError):
        GANEvaluation("vgg-ImageNet")
