"""Trainer semantics tests — the behavioral spec from SURVEY.md §2.3.

Uses a tiny 32px config (d_num_cls=2 so the solo class heads' 8/4 kernels
match the 8x8/4x4 trunk maps) to keep CPU compile fast.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.configs import (
    ExperimentConfig,
    LossWeights,
    ModelConfig,
    TrainConfig,
    srgan_nopretraining,
)
from srgan_tpu.training import GANTrainer

HW = 32


def tiny_cfg(trainer="srgan", k=2, **loss_kw) -> ExperimentConfig:
    model = ModelConfig(image_size=HW, g_nch=8, g_res_num=1, d_nch=8,
                        d_num_cls=2, e_nch=8, e_num_cls=2)
    train = TrainConfig(batch_size=8, unrolled_k=k, encoded_feature="mu")
    loss = LossWeights.proposed_kl(**loss_kw)
    return ExperimentConfig(name="tiny", model=model, train=train, loss=loss,
                            trainer=trainer)


def make_batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(-1, 1, (b, HW, HW, 3)).astype(np.float32)
    src = rng.integers(0, 4, b)
    # target != source, like get_target's shuffled column 0 (util.py:268-319)
    tgt = (src + rng.integers(1, 4, b)) % 4
    return {"image": jnp.asarray(img),
            "source_label": jnp.asarray(src),
            "target_label": jnp.asarray(tgt)}


def leaves_close(a, b):
    return all(np.allclose(x, y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def leaves_equal_trees(a, b):
    return jax.tree.all(jax.tree.map(lambda x, y: bool(jnp.all(x == y)), a, b))


@pytest.mark.parametrize("trainer", ["srgan", "singlegan_solo", "singlegan"])
def test_train_step_runs_and_updates(trainer):
    cfg = tiny_cfg(trainer)
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    batch = make_batch()
    new_state, metrics = t.step(state, batch, jax.random.PRNGKey(1))

    for k_, v in metrics.items():
        assert np.isfinite(float(v)), f"{k_} not finite"
    # all three nets actually moved
    assert not leaves_close(new_state.g_params, state.g_params)
    assert not leaves_close(new_state.e_params, state.e_params)
    assert int(new_state.step) == 1
    # proposed-KL metrics present, conventional-KL absent
    assert "loss_batch_KL" in metrics and "loss_KL" not in metrics


def test_unrolled_restore_semantics():
    """unrolled_restore=True: after the step, D params must equal the
    snapshot taken after the FIRST D update (the reference's documented
    intent) — not the k-th — while D's Adam state keeps all k updates.
    Default (False, the reference's ACTUAL no-op restore): D keeps all k
    updates, so k=1 and k=3 end at different D params."""
    import dataclasses

    def with_restore(cfg):
        return dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, unrolled_restore=True))

    cfg_k1 = with_restore(tiny_cfg("srgan", k=1))
    cfg_k3 = with_restore(tiny_cfg("srgan", k=3))
    t1 = GANTrainer(cfg_k1, donate=False)
    t3 = GANTrainer(cfg_k3, donate=False)
    s1 = t1.init_state(jax.random.PRNGKey(0), image_size=HW)
    s3 = t3.init_state(jax.random.PRNGKey(0), image_size=HW)
    assert leaves_equal_trees(s1.d_params, s3.d_params)

    batch = make_batch()
    n1, _ = t1.step(s1, batch, jax.random.PRNGKey(1))
    n3, _ = t3.step(s3, batch, jax.random.PRNGKey(1))
    # same rng => same first D update => same restored D params
    assert leaves_close(n1.d_params, n3.d_params)
    # but Adam moments differ (k=3 kept stepping)
    assert not leaves_close(n1.d_opt, n3.d_opt)

    # default = reference behavior: no restore, k=3 keeps all 3 updates
    t3_ref = GANTrainer(tiny_cfg("srgan", k=3), donate=False)
    s3_ref = t3_ref.init_state(jax.random.PRNGKey(0), image_size=HW)
    n3_ref, _ = t3_ref.step(s3_ref, batch, jax.random.PRNGKey(1))
    assert not leaves_close(n3_ref.d_params, n1.d_params)


def test_conventional_kl_gating():
    cfg = tiny_cfg("srgan")
    cfg = dataclasses.replace(cfg, loss=LossWeights.conventional_kl(cls=1.0))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, encoded_feature="latent"))
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    _, metrics = t.step(state, make_batch(), jax.random.PRNGKey(1))
    assert "loss_KL" in metrics
    assert "loss_batch_KL" not in metrics and "loss_hist" not in metrics


def test_frozen_encoder_trunk():
    """nb05 freeze trick: only fcmean/fcvar of E may change."""
    cfg = tiny_cfg("srgan")
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW,
                         freeze_pretrained=True)
    new_state, _ = t.step(state, make_batch(), jax.random.PRNGKey(1))
    for key in state.e_params:
        before = jax.tree.leaves(state.e_params[key])
        after = jax.tree.leaves(new_state.e_params[key])
        moved = not all(np.allclose(a, b) for a, b in zip(before, after))
        if key == "fcmean":
            assert moved, f"{key} should train"
        elif key == "fcvar":
            # trainable but EXACTLY zero-grad in mu-mode proposed-KL: logvar
            # feeds nothing (true of the reference too — sampling off, KL
            # off), and a zero-grad Adam step at t=1 moves nothing, so the
            # params must be bit-identical
            assert not moved, ("fcvar is trainable but must receive exactly "
                               "zero grads in mu-mode proposed-KL")
        else:
            assert not moved, f"{key} should be frozen"


def test_per_domain_adam_isolation():
    """Per-domain D: a domain absent from the batch gets zero grads; with
    zero-initialized Adam moments its params must stay identical to a
    zero-grad Adam step (i.e. unchanged)."""
    cfg = tiny_cfg("singlegan", k=1)
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    batch = make_batch()
    # force all source labels to 0 and targets to 1: domains 2, 3 are absent
    batch["source_label"] = jnp.zeros(8, jnp.int32)
    batch["target_label"] = jnp.ones(8, jnp.int32)
    new_state, _ = t.step(state, batch, jax.random.PRNGKey(1))
    d_old = jax.device_get(state.d_params)
    d_new = jax.device_get(new_state.d_params)
    for leaf_old, leaf_new in zip(jax.tree.leaves(d_old),
                                  jax.tree.leaves(d_new)):
        # domains 2 and 3 saw no data -> untouched
        np.testing.assert_allclose(leaf_old[2], leaf_new[2])
        np.testing.assert_allclose(leaf_old[3], leaf_new[3])
        # domain 0 (real) and 1 (fake) trained
    moved = any(not np.allclose(lo[0], ln[0]) for lo, ln in
                zip(jax.tree.leaves(d_old), jax.tree.leaves(d_new)))
    assert moved


def test_deterministic_given_rng():
    cfg = tiny_cfg("srgan", k=1)
    t = GANTrainer(cfg, donate=False)
    batch = make_batch()
    s1 = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    s2 = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    n1, m1 = t.step(s1, batch, jax.random.PRNGKey(7))
    n2, m2 = t.step(s2, batch, jax.random.PRNGKey(7))
    assert float(m1["errG"]) == float(m2["errG"])
    assert leaves_close(n1.g_params, n2.g_params)


def test_lr_schedule():
    cfg = tiny_cfg("srgan")
    t = GANTrainer(cfg, donate=False)
    lr0 = t.lr_at(0)
    lr5 = t.lr_at(5)
    assert lr0 == (1e-4, 1e-4, 1e-4)  # quirk #3: all actual LRs are 1e-4
    assert lr5[0] == pytest.approx(1e-4 * 0.95**5)


def test_transform_and_encode_roundtrip():
    cfg = tiny_cfg("srgan")
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    batch = make_batch()
    fake, latent = t.transform(state, batch["image"], batch["target_label"],
                               rng=jax.random.PRNGKey(2))
    assert fake.shape == batch["image"].shape
    assert latent.shape == (8, cfg.model.ndim)
    mu, logvar, cls_out = t.encode(state, fake)
    assert mu.shape == (8, cfg.model.ndim)
    assert cls_out.shape == (8, 4)
    # a single 1-D latent broadcasts across the batch (sweep-notebook usage,
    # util.py:356-373) and equals the explicitly tiled call
    one = np.asarray(jax.random.normal(jax.random.PRNGKey(7),
                                       (cfg.model.ndim,)))
    f1, l1 = t.transform(state, batch["image"], batch["target_label"],
                         latent=one)
    f2, _ = t.transform(state, batch["image"], batch["target_label"],
                        latent=np.tile(one, (8, 1)))
    assert l1.shape == (8, cfg.model.ndim)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))
