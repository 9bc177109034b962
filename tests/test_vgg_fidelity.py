"""VGG19-BN evaluator fidelity vs a hand-built torch twin.

Round-3 closure of the last unverified parity link: the reference's whole
quantitative quality story is PRDC over VGG19-BN features
(/root/reference/pyfiles/evaluation.py:13-36 feature path, :65-83
preprocess, :98-110 get_prdc).  torchvision is absent in this environment,
but VGG19-BN's topology is public (torchvision cfg "E"), so we hand-build
the exact torch module the reference wraps and pin:

  1. import direction — a randomized torch state dict pulled through
     ``import_torch_vgg`` produces matching 4096-d features AND score
     logits at 224px
  2. export direction — ``export_torch_vgg`` loads back into the torch
     twin with ``strict=True`` and reproduces our outputs; a second
     import round-trips bitwise
  3. the FULL ``get_prdc`` pipeline (min-max -> PIL 128 -> 224 ->
     ImageNet normalize -> batched features -> PRDC) vs a torch-side
     replica of evaluation.py:65-110 built from the reference's own
     ``util.image_from_output`` and the vendored third-party prdc oracle
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from srgan_tpu.evaluation.features import VGG19_CFG, VGG19BN, init_vgg  # noqa: E402
from srgan_tpu.evaluation.harness import GANEvaluation  # noqa: E402
from srgan_tpu.utils.checkpoint import (  # noqa: E402
    export_torch_vgg,
    import_torch_vgg,
)

REF_PYFILES = "/root/reference/pyfiles"


class TorchVGG19BN(tnn.Module):
    """The public torchvision vgg19_bn topology (cfg "E"), hand-built so
    its state-dict naming (features.N.*, classifier.N.*) matches what
    torchvision would produce — the module the reference's ``vgg_model``
    wraps (evaluation.py:44-52)."""

    def __init__(self, num_classes: int = 1000):
        super().__init__()
        layers, in_ch = [], 3
        for v in VGG19_CFG:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(in_ch, v, 3, padding=1),
                           tnn.BatchNorm2d(v), tnn.ReLU(inplace=True)]
                in_ch = v
        self.features = tnn.Sequential(*layers)
        self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(torch.flatten(x, 1))


class TorchVggModel:
    """Replica of the reference's ``vgg_model`` (evaluation.py:13-36).

    Note the reference quirk: ``list(model.avgpool.children())`` is EMPTY
    (AdaptiveAvgPool2d has no children), so its feature path skips the
    avgpool entirely — identity at 224px input, which the preprocess
    guarantees.  Replicated verbatim."""

    def __init__(self, model):
        self.feature_extractor = tnn.Sequential(
            *(list(model.features.children())
              + list(model.avgpool.children())))
        self.fcs = tnn.Sequential(*list(model.classifier.children())[:6])
        self.model = model

    def get(self, x, output_type="score"):
        with torch.no_grad():
            if output_type == "feature":
                return self.fcs(torch.flatten(self.feature_extractor(x), 1))
            return self.model(x)


def _randomize(model: TorchVGG19BN, seed: int = 0) -> None:
    """Give every parameter AND every BN running stat a non-trivial value
    so a silent wiring mistake cannot hide behind zeros/ones."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                fan_out = m.kernel_size[0] * m.kernel_size[1] * m.out_channels
                m.weight.normal_(0, (2.0 / fan_out) ** 0.5, generator=g)
                m.bias.normal_(0, 0.05, generator=g)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.7, 1.3, generator=g)
                m.bias.normal_(0, 0.05, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
            elif isinstance(m, tnn.Linear):
                m.weight.normal_(0, 0.01, generator=g)
                m.bias.normal_(0, 0.01, generator=g)
    model.eval()


def _state_dict_numpy(model) -> dict:
    # .numpy().copy(): torch aliases storage; copies keep the dict stable
    return {k: v.detach().numpy().copy()
            for k, v in model.state_dict().items()}


def _jax_apply(variables, x_nchw: np.ndarray, output: str) -> np.ndarray:
    model = VGG19BN(num_classes=1000)
    x = np.transpose(x_nchw, (0, 2, 3, 1))
    return np.asarray(model.apply(variables, x, output=output))


@pytest.fixture(scope="module")
def twin():
    model = TorchVGG19BN()
    _randomize(model, seed=0)
    return model


def test_vgg_import_feature_and_score_fidelity(twin):
    """Randomized torch weights -> import_torch_vgg -> identical 4096-d
    features and 1000-d scores at the exact eval geometry (224px)."""
    variables = import_torch_vgg(_state_dict_numpy(twin))
    rng = np.random.default_rng(1)
    # ImageNet-normalized-looking input: zero-ish mean, unit-ish scale
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)

    ref = TorchVggModel(twin)
    want_feat = ref.get(torch.from_numpy(x), "feature").numpy()
    want_score = ref.get(torch.from_numpy(x), "score").numpy()

    got_feat = _jax_apply(variables, x, "feature")
    got_score = _jax_apply(variables, x, "score")

    assert got_feat.shape == (2, 4096) and want_feat.shape == (2, 4096)
    # 16 convs + 16 BNs of fp32 accumulate reassociation error; the feature
    # magnitudes here are O(1)
    np.testing.assert_allclose(got_feat, want_feat, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(got_score, want_score, atol=2e-3, rtol=1e-3)


def test_vgg_imagenet_arm_from_pth_full_geometry(twin, tmp_path):
    """VERDICT r4 item 5: the vgg-ImageNet arm (evaluation.py:45-55) proven
    end-to-end at the exact torchvision geometry, offline.  A full-size
    synthetic vgg19_bn .pth (1000 classes, torchvision features.N/
    classifier.N key layout, ~575 MB) goes through the exact
    scripts/evaluate_prdc.py wiring — torch.save file ->
    load_torch_state_dict -> import_torch_vgg -> GANEvaluation
    ("vgg-ImageNet") — and must (a) match the torch twin's 4096-d features
    at 224px and (b) drive get_prdc to the perfect real-vs-real fixpoint."""
    import torch

    from srgan_tpu.utils.checkpoint import load_torch_state_dict

    pth = tmp_path / "vgg19_bn_synthetic.pth"
    torch.save(twin.state_dict(), pth)
    sd = load_torch_state_dict(str(pth))
    # exact torchvision key layout: 16 convs/BNs under features.N, the
    # 3-Linear classifier under classifier.{0,3,6}
    assert "features.0.weight" in sd and "features.50.running_var" in sd
    assert sd["classifier.6.weight"].shape == (1000, 4096)
    variables = import_torch_vgg(sd)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    want = TorchVggModel(twin).get(torch.from_numpy(x), "feature").numpy()
    got = _jax_apply(variables, x, "feature")
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    ev = GANEvaluation("vgg-ImageNet", variables=variables)
    imgs = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    m = ev.get_prdc(imgs, imgs.copy(), nearest_k=2)
    assert m["precision"] == 1.0 and m["recall"] == 1.0
    assert m["coverage"] == 1.0 and np.isfinite(m["density"])


def test_vgg_export_roundtrip(twin):
    """Our random init -> export_torch_vgg -> strict torch load -> same
    outputs; import(export(v)) is bitwise v."""
    import jax

    _, variables = init_vgg(jax.random.PRNGKey(7))
    sd = export_torch_vgg(variables)

    model = TorchVGG19BN()
    tensors = {k: torch.from_numpy(np.array(v))   # writable copies
               for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=True)
    assert not missing and not unexpected
    model.eval()

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    want = TorchVggModel(model).get(torch.from_numpy(x), "feature").numpy()
    got = _jax_apply(variables, x, "feature")
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    # bitwise round-trip
    back = import_torch_vgg({k: v.numpy().copy() for k, v in tensors.items()})
    import jax

    flat1, _ = jax.tree_util.tree_flatten_with_path(variables)
    flat2, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _ref_util():
    if not os.path.isdir(REF_PYFILES):
        pytest.skip("reference checkout not available")
    if "prdc" not in sys.modules:
        stub = types.ModuleType("prdc")
        stub.compute_prdc = None
        sys.modules["prdc"] = stub
    sys.path.insert(0, REF_PYFILES)
    try:
        import util as ref_util
    finally:
        sys.path.remove(REF_PYFILES)
    return ref_util


def test_get_prdc_pipeline_vs_torch_replica(twin):
    """END-TO-END pin: GANEvaluation.get_prdc == a torch replica of
    evaluation.py:65-110 (reference's own image_from_output + PIL
    Resize(128)->Resize(224) + ImageNet normalize + batched twin features
    + the vendored prdc oracle)."""
    from PIL import Image

    from tests.vendor_prdc import compute_prdc as oracle_prdc

    ref_util = _ref_util()
    rng = np.random.default_rng(3)
    # smooth random images in [-1, 1] (NCHW for the torch side)
    def make_images(n):
        base = rng.standard_normal((n, 3, 8, 8)).astype(np.float32)
        t = torch.nn.functional.interpolate(
            torch.from_numpy(base), size=(32, 32), mode="bilinear",
            align_corners=False)
        return np.tanh(t.numpy() * 1.5)

    true_nchw, pred_nchw = make_images(10), make_images(10)

    # ---- torch-side replica of GAN_evaluation (evaluation.py:65-110) ----
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def replica_preprocess(arr_nchw):
        out = []
        for i in range(arr_nchw.shape[0]):
            t = torch.from_numpy(arr_nchw[i:i + 1])
            pil = ref_util.image_from_output(t)[0]   # reference min-max+PIL
            pil = pil.resize((128, 128), Image.BILINEAR)
            pil = pil.resize((224, 224), Image.BILINEAR)
            a = np.asarray(pil, np.float32) / 255.0  # ToTensor
            a = (a - mean) / std                     # Normalize
            out.append(np.transpose(a, (2, 0, 1)))
        return torch.from_numpy(np.stack(out))

    ref_model = TorchVggModel(twin)

    def replica_features(t, batch=32):
        feats = []
        for s in range(0, t.shape[0], batch):
            feats.append(ref_model.get(t[s:s + batch], "feature").numpy())
        return np.concatenate(feats, axis=0)

    f1 = replica_features(replica_preprocess(true_nchw))
    f2 = replica_features(replica_preprocess(pred_nchw))
    want = oracle_prdc(f1, f2, nearest_k=3)

    # ---- our pipeline ----
    variables = import_torch_vgg(_state_dict_numpy(twin))
    ev = GANEvaluation("vgg-ImageNet", variables=variables)
    got = ev.get_prdc(np.transpose(true_nchw, (0, 2, 3, 1)),
                      np.transpose(pred_nchw, (0, 2, 3, 1)), nearest_k=3)

    for m in ("precision", "recall", "density", "coverage"):
        np.testing.assert_allclose(got[m], want[m], atol=1e-6,
                                   err_msg=f"PRDC metric {m} diverged")
