"""Checkpoint tests: orbax roundtrip + torch .pth import mapping.

The .pth importers are tested with synthetic state dicts that carry the
reference's exact key names and tensor layouts (built from our own param
shapes — no reference code involved): every torch key must be consumed,
every target param assigned with the right shape, and a known value must
land transposed correctly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from srgan_tpu.nn import (
    Encoder,
    EncoderClassifier,
    SingleDiscriminatorSoloMulti,
    SingleGenerator,
)
from srgan_tpu.utils.checkpoint import (
    import_torch_encoder,
    import_torch_generator,
    import_torch_solo_discriminator,
    import_torch_vgg,
    load_torch_state_dict,
    restore_checkpoint,
    save_checkpoint,
)


def tree_shapes(tree):
    return {jax.tree_util.keystr(k): v.shape for k, v in
            jax.tree_util.tree_leaves_with_path(tree)}


def to_torch_sd(params, rng):
    """Build a reference-keyed torch state dict shaped like our generator
    params (layout converted to torch conventions)."""
    sd = {}

    def conv_t(a):      # HWIO -> OIHW
        return torch.tensor(np.transpose(a, (3, 2, 0, 1)))

    def convT_t(a):     # (kh,kw,in,out) -> (in,out,kh,kw)
        return torch.tensor(np.transpose(a, (2, 3, 0, 1)))

    def lin_t(a):
        return torch.tensor(np.transpose(a))

    num_cls, res_num = 2, 1
    for i in range(num_cls + 1):
        p = params[f"down_conv_{i}"]
        sd[f"down_convs.{i}.weight"] = conv_t(rng.standard_normal(
            np.shape(p["kernel"]), dtype=np.float32))
        cn = params[f"down_cnorm_{i}"]
        sd[f"down_cnorms.{i}.ConBias.0.weight"] = lin_t(
            rng.standard_normal(np.shape(cn["con_bias"]["kernel"]),
                                dtype=np.float32))
        sd[f"down_cnorms.{i}.ConBias.0.bias"] = torch.tensor(
            rng.standard_normal(np.shape(cn["con_bias"]["bias"]),
                                dtype=np.float32))
        sd[f"down_cnorms.{i}.weight"] = torch.tensor(
            rng.standard_normal(np.shape(cn["scale"]), dtype=np.float32))
        sd[f"down_cnorms.{i}.bias"] = torch.tensor(
            rng.standard_normal(np.shape(cn["bias"]), dtype=np.float32))
    for i in range(res_num):
        r = params[f"res_{i}"]
        for c in ("c1", "c2"):
            sd[f"resBlocks.{i}.{c}.weight"] = conv_t(rng.standard_normal(
                np.shape(r[c]["kernel"]), dtype=np.float32))
        for cn_name in ("cn1", "cn2"):
            cn = r[cn_name]
            sd[f"resBlocks.{i}.{cn_name}.ConBias.0.weight"] = lin_t(
                rng.standard_normal(np.shape(cn["con_bias"]["kernel"]),
                                    dtype=np.float32))
            sd[f"resBlocks.{i}.{cn_name}.ConBias.0.bias"] = torch.tensor(
                rng.standard_normal(np.shape(cn["con_bias"]["bias"]),
                                    dtype=np.float32))
            sd[f"resBlocks.{i}.{cn_name}.weight"] = torch.tensor(
                rng.standard_normal(np.shape(cn["scale"]), dtype=np.float32))
            sd[f"resBlocks.{i}.{cn_name}.bias"] = torch.tensor(
                rng.standard_normal(np.shape(cn["bias"]), dtype=np.float32))
    for j in range(num_cls):
        p = params[f"up_conv_{j}"]
        sd[f"up_convs.{j}.weight"] = convT_t(rng.standard_normal(
            np.shape(p["kernel"]), dtype=np.float32))
    sd[f"up_convs.{num_cls}.weight"] = conv_t(rng.standard_normal(
        np.shape(params["up_conv_out"]["kernel"]), dtype=np.float32))
    return sd


def test_generator_import_roundtrip(tmp_path, rng):
    g = SingleGenerator(nch=8, num_cls=2, res_num=1)
    x = jnp.zeros((1, 32, 32, 3))
    c = jnp.zeros((1, 12))
    params = g.init(jax.random.PRNGKey(0), x, c)["params"]

    sd = to_torch_sd(params, rng)
    path = tmp_path / "gen.pth"
    torch.save(sd, str(path))

    loaded = load_torch_state_dict(str(path))
    imported = import_torch_generator(loaded, num_cls=2, res_num=1)
    assert tree_shapes(imported) == tree_shapes(params)
    # layout correctness: torch OIHW row 0 == our HWIO [:, :, :, 0]
    w_t = sd["down_convs.0.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(imported["down_conv_0"]["kernel"])[:, :, :, 0],
        np.transpose(w_t[0], (1, 2, 0)))
    # imported params actually run
    out = g.apply({"params": imported}, jnp.ones((1, 32, 32, 3)), c)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_generator_import_rejects_leftover_keys(rng):
    g = SingleGenerator(nch=8, num_cls=2, res_num=1)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                    jnp.zeros((1, 12)))["params"]
    sd = {k: v.numpy() for k, v in to_torch_sd(params, rng).items()}
    sd["bogus.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError):
        import_torch_generator(sd, num_cls=2, res_num=1)


def test_solo_discriminator_import(rng):
    d = SingleDiscriminatorSoloMulti(nch=8, num_cls=3, n_class=4,
                                     cls_kernels=(8, 4))
    params = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    sd = {}
    for trunk in ("discriminator1", "discriminator2"):
        for i in range(3):
            k = np.shape(params[trunk][f"conv_{i}"]["kernel"])
            sd[f"{trunk}.down_convs.{2 * i}.weight"] = np.transpose(
                rng.standard_normal(k, dtype=np.float32), (3, 2, 0, 1))
    for name in ("last_layer1", "last_layer2",
                 "classification_layer1", "classification_layer2"):
        k = np.shape(params[name]["kernel"])
        w = np.transpose(rng.standard_normal(k, dtype=np.float32),
                         (3, 2, 0, 1))
        b = rng.standard_normal(np.shape(params[name]["bias"]),
                                dtype=np.float32)
        if "classification" in name:
            sd[f"{name}.0.weight"], sd[f"{name}.0.bias"] = w, b
        else:
            sd[f"{name}.weight"], sd[f"{name}.bias"] = w, b
    imported = import_torch_solo_discriminator(sd, num_cls=3)
    assert tree_shapes(imported) == tree_shapes(params)


def test_encoder_import_and_classifier_transfer(rng):
    e = Encoder(nch=8, num_cls=2, num_con=4)
    params = e.init({"params": jax.random.PRNGKey(0),
                     "reparam": jax.random.PRNGKey(1)},
                    jnp.zeros((1, 64, 64, 3)))["params"]
    sd = {}
    sd["first_layer.weight"] = np.transpose(rng.standard_normal(
        np.shape(params["first_layer"]["kernel"]), dtype=np.float32),
        (3, 2, 0, 1))
    sd["first_layer.bias"] = rng.standard_normal(
        np.shape(params["first_layer"]["bias"]), dtype=np.float32)
    for i in range(2):
        blk = params[f"layers_{i}"]
        sd[f"layers.{i}.conv1.weight"] = np.transpose(rng.standard_normal(
            np.shape(blk["conv1"]["kernel"]), dtype=np.float32), (3, 2, 0, 1))
        sd[f"layers.{i}.cmp.0.weight"] = np.transpose(rng.standard_normal(
            np.shape(blk["cmp_conv"]["kernel"]), dtype=np.float32),
            (3, 2, 0, 1))
        sd[f"layers.{i}.shortcut.1.weight"] = np.transpose(
            rng.standard_normal(np.shape(blk["shortcut_conv"]["kernel"]),
                                dtype=np.float32), (3, 2, 0, 1))
        sd[f"layers.{i}.shortcut.1.bias"] = rng.standard_normal(
            np.shape(blk["shortcut_conv"]["bias"]), dtype=np.float32)
    for fc in ("fcmean", "fcvar", "fcclass"):
        sd[f"{fc}.weight"] = np.transpose(rng.standard_normal(
            np.shape(params[fc]["kernel"]), dtype=np.float32))
        sd[f"{fc}.bias"] = rng.standard_normal(
            np.shape(params[fc]["bias"]), dtype=np.float32)
    imported = import_torch_encoder(sd, num_cls=2, conditional=False)
    assert tree_shapes(imported) == tree_shapes(params)


def test_vgg_import(rng):
    from srgan_tpu.evaluation.features import init_vgg
    _, variables = init_vgg(jax.random.PRNGKey(0), num_classes=10)
    p = variables["params"]
    sd = {}
    seq = 0
    conv_i = 0
    from srgan_tpu.evaluation.features import VGG19_CFG
    for v in VGG19_CFG:
        if v == "M":
            seq += 1
            continue
        k = np.shape(p[f"conv_{conv_i}"]["kernel"])
        sd[f"features.{seq}.weight"] = np.transpose(
            rng.standard_normal(k, dtype=np.float32), (3, 2, 0, 1))
        sd[f"features.{seq}.bias"] = np.zeros(v, np.float32)
        sd[f"features.{seq + 1}.weight"] = np.ones(v, np.float32)
        sd[f"features.{seq + 1}.bias"] = np.zeros(v, np.float32)
        sd[f"features.{seq + 1}.running_mean"] = np.zeros(v, np.float32)
        sd[f"features.{seq + 1}.running_var"] = np.ones(v, np.float32)
        sd[f"features.{seq + 1}.num_batches_tracked"] = np.zeros((), np.int64)
        seq += 3
        conv_i += 1
    for t_idx, name in ((0, "fc0"), (3, "fc1"), (6, "fc2")):
        k = np.shape(p[name]["kernel"])
        sd[f"classifier.{t_idx}.weight"] = np.transpose(
            rng.standard_normal(k, dtype=np.float32))
        sd[f"classifier.{t_idx}.bias"] = np.zeros(k[1], np.float32)
    imported = import_torch_vgg(sd)
    assert tree_shapes(imported["params"]) == tree_shapes(p)
    assert "bn_0" in imported["batch_stats"]


def test_orbax_roundtrip(tmp_path):
    state = {"a": jnp.arange(5, dtype=jnp.float32),
             "nested": {"b": jnp.ones((2, 3))}}
    save_checkpoint(str(tmp_path / "ckpt"), state, step=3)
    restored = restore_checkpoint(str(tmp_path / "ckpt"),
                                  jax.tree.map(jnp.zeros_like, state), step=3)
    np.testing.assert_array_equal(restored["a"], np.arange(5))
    np.testing.assert_array_equal(restored["nested"]["b"], np.ones((2, 3)))


def test_torch_export_roundtrip_and_reference_load(tmp_path):
    """Exporters are exact inverses of the importers, and the exported .pth
    loads into the reference's own torch modules reproducing our outputs."""
    import sys
    import types

    import jax
    import jax.numpy as jnp
    import pytest

    torch = pytest.importorskip("torch")

    from srgan_tpu.nn import SingleGenerator
    from srgan_tpu.utils.checkpoint import (
        export_torch_generator,
        import_torch_generator,
        save_torch_state_dict,
    )

    gen = SingleGenerator(nch_in=3, nch=8, reduce=2, num_cls=2, res_num=1,
                          num_con=12)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                      jnp.zeros((1, 12)))["params"]

    sd = export_torch_generator(params, num_cls=2, res_num=1)
    back = import_torch_generator(sd, num_cls=2, res_num=1)
    for (pa, pb) in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    # the reference torch module must accept it strictly and agree on outputs
    if "prdc" not in sys.modules:
        stub = types.ModuleType("prdc")
        stub.compute_prdc = None
        sys.modules["prdc"] = stub
    sys.path.insert(0, "/root/reference/pyfiles")
    try:
        import model as ref
    finally:
        sys.path.remove("/root/reference/pyfiles")
    net = ref.SingleGenerator(3, 8, 2, 2, 1, "instance", num_con=12)
    pth = str(tmp_path / "g.pth")
    save_torch_state_dict(pth, sd)
    net.load_state_dict(torch.load(pth, weights_only=True), strict=True)
    net.eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    cond = rng.standard_normal((2, 12)).astype(np.float32)
    ours = gen.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond))
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
                     torch.from_numpy(cond))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               theirs.numpy(), atol=1e-5, rtol=1e-5)


def test_torch_export_classifier_roundtrip():
    import jax
    import jax.numpy as jnp

    from srgan_tpu.nn import EncoderClassifier
    from srgan_tpu.utils.checkpoint import (
        export_torch_classifier,
        import_torch_classifier,
    )

    clf = EncoderClassifier(nch_in=3, nch_out=8, nch=8, num_cls=2, num_con=4)
    params = clf.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3)))["params"]
    sd = export_torch_classifier(params, num_cls=2)
    back = import_torch_classifier(sd, num_cls=2)
    for (pa, pb) in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_checkpoint_format_versioning(tmp_path):
    """Round-4 version guard: the round-3 pre-flipped ConvTranspose layout
    is stamped on disk; unversioned checkpoints refuse to restore silently
    (ADVICE r3: layouts changed without a marker)."""
    from srgan_tpu.utils.checkpoint import (
        CKPT_FORMAT_VERSION,
        checkpoint_format_version,
    )

    k = jnp.arange(2 * 2 * 3 * 4, dtype=jnp.float32).reshape(2, 2, 3, 4)
    state = {"g_params": {"up_conv_0": {"kernel": k},
                          "up_conv_out": {"kernel": k}}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, step=1)
    assert checkpoint_format_version(path) == CKPT_FORMAT_VERSION
    # a step dir passed directly resolves the parent's stamp
    assert checkpoint_format_version(path + "/step_1") == CKPT_FORMAT_VERSION
    target = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, target, step=1)
    np.testing.assert_array_equal(restored["g_params"]["up_conv_0"]["kernel"], k)

    # unversioned (pre-round-3) checkpoint: loud failure by default
    os.remove(os.path.join(path, "format.json"))
    assert checkpoint_format_version(path) is None
    with pytest.raises(ValueError, match="format.json"):
        restore_checkpoint(path, target, step=1)
    # caller asserts it's already the new layout -> restored untouched
    ok = restore_checkpoint(path, target, step=1, unversioned="preflipped")
    np.testing.assert_array_equal(ok["g_params"]["up_conv_0"]["kernel"], k)
    # caller says rounds-1-2 layout -> ConvTranspose kernels auto-flipped,
    # plain convs (up_conv_out) untouched
    mig = restore_checkpoint(path, target, step=1, unversioned="unflipped")
    np.testing.assert_array_equal(
        mig["g_params"]["up_conv_0"]["kernel"], np.asarray(k)[::-1, ::-1])
    np.testing.assert_array_equal(mig["g_params"]["up_conv_out"]["kernel"], k)

    # future format version -> refuse
    import json
    with open(os.path.join(path, "format.json"), "w") as f:
        json.dump({"format_version": CKPT_FORMAT_VERSION + 1}, f)
    with pytest.raises(ValueError, match="format_version"):
        restore_checkpoint(path, target, step=1)
