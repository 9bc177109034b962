"""Model-family tests: shapes, dtypes, conditioning behavior.

Shape oracle: the reference architectures at the notebook configs
(nb01 cell 13 / nb02-05 cells 13+20): 128px input, G(nch=64, reduce=2,
num_cls=2, res_num=6, num_con=12), D(nch=64, num_cls=4), E(nch=64, num_cls=4,
ndim=8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.nn import (
    Encoder,
    EncoderClassifier,
    EncoderOriginal,
    SingleDiscriminatorOriginalMulti,
    SingleDiscriminatorSoloMulti,
    SingleGenerator,
)

B, H = 2, 128


@pytest.fixture(scope="module")
def img():
    return jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (B, H, H, 3)).astype(np.float32))


@pytest.fixture(scope="module")
def cond():
    rng = np.random.default_rng(1)
    onehot = np.eye(4, dtype=np.float32)[rng.integers(0, 4, B)]
    latent = rng.standard_normal((B, 8), dtype=np.float32)
    return jnp.asarray(np.concatenate([onehot, latent], 1))


def test_generator_shapes_and_range(img, cond):
    g = SingleGenerator()
    variables = g.init(jax.random.PRNGKey(0), img, cond)
    out = g.apply(variables, img, cond)
    assert out.shape == (B, H, H, 3)
    assert out.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh
    # channel progression 64 -> 128 -> 256 (num_cls=2)
    p = variables["params"]
    assert p["down_conv_0"]["kernel"].shape == (7, 7, 3, 64)
    assert p["down_conv_1"]["kernel"].shape == (4, 4, 64, 128)
    assert p["down_conv_2"]["kernel"].shape == (4, 4, 128, 256)
    assert p["res_0"]["c1"]["kernel"].shape == (3, 3, 256, 256)
    assert p["up_conv_0"]["kernel"].shape == (4, 4, 256, 128)
    assert p["up_conv_out"]["kernel"].shape == (7, 7, 64, 3)
    # conditioning enters every down cnorm + res block
    assert p["down_cnorm_0"]["con_bias"]["kernel"].shape == (12, 64)
    assert p["res_5"]["cn2"]["con_bias"]["kernel"].shape == (12, 256)


def test_generator_style_sensitivity(img):
    """Different style latents must produce different outputs (the whole point
    of CBINorm injection)."""
    g = SingleGenerator()
    onehot = jnp.tile(jnp.eye(4)[:1], (B, 1))
    c1 = jnp.concatenate([onehot, jnp.ones((B, 8))], 1)
    c2 = jnp.concatenate([onehot, -jnp.ones((B, 8))], 1)
    variables = g.init(jax.random.PRNGKey(0), img, c1)
    o1 = g.apply(variables, img, c1)
    o2 = g.apply(variables, img, c2)
    assert float(jnp.mean(jnp.abs(o1 - o2))) > 1e-3


def test_discriminator_original_multi_shapes(img):
    d = SingleDiscriminatorOriginalMulti(num_cls=4)
    variables = d.init(jax.random.PRNGKey(0), img)
    out1, out2 = d.apply(variables, img)
    # 128 -> 64 -> 32 -> 16 -> 8, final k4 s1 p1 -> 7
    assert out1.shape == (B, 7, 7, 1)
    # half-res path: 64 -> ... -> 4 -> 3
    assert out2.shape == (B, 3, 3, 1)


def test_discriminator_solo_multi_shapes(img):
    d = SingleDiscriminatorSoloMulti(num_cls=4, n_class=4)
    variables = d.init(jax.random.PRNGKey(0), img)
    (adv1, adv2), (cls1, cls2) = d.apply(variables, img)
    assert adv1.shape == (B, 7, 7, 1) and adv2.shape == (B, 3, 3, 1)
    assert cls1.shape == (B, 4) and cls2.shape == (B, 4)
    np.testing.assert_allclose(np.asarray(cls1).sum(1), 1.0, rtol=1e-5)
    # trunk channel caps: min(dim*2, nch*8) = 512 / 256
    p = variables["params"]
    assert p["last_layer1"]["kernel"].shape == (4, 4, 512, 1)
    assert p["last_layer2"]["kernel"].shape == (4, 4, 256, 1)
    assert p["classification_layer1"]["kernel"].shape == (8, 8, 512, 4)
    assert p["classification_layer2"]["kernel"].shape == (4, 4, 256, 4)


def test_encoder_original(img):
    e = EncoderOriginal(nch_out=8, num_cls=4)
    onehot = jnp.tile(jnp.eye(4)[:1], (B, 1))
    variables = e.init({"params": jax.random.PRNGKey(0),
                        "reparam": jax.random.PRNGKey(1)}, img, onehot)
    code, mu, logvar = e.apply(variables, img, onehot,
                               rngs={"reparam": jax.random.PRNGKey(2)})
    assert code.shape == mu.shape == logvar.shape == (B, 8)
    # trunk 64 -> 1024 over 4 blocks
    assert variables["params"]["fcmean"]["kernel"].shape == (1024, 8)
    # reparametrization actually samples
    code2, mu2, _ = e.apply(variables, img, onehot,
                            rngs={"reparam": jax.random.PRNGKey(3)})
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), rtol=1e-5)
    assert float(jnp.mean(jnp.abs(code - code2))) > 1e-4


def test_encoder_srgan(img):
    e = Encoder(nch_out=8, num_cls=4, num_con=4)
    variables = e.init({"params": jax.random.PRNGKey(0),
                        "reparam": jax.random.PRNGKey(1)}, img)
    code, mu, logvar, cls_out, att = e.apply(
        variables, img, rngs={"reparam": jax.random.PRNGKey(2)})
    assert code.shape == (B, 8) and cls_out.shape == (B, 4)
    assert att is None


def test_encoder_classifier_transfers_into_encoder(img):
    """Classifier params drop into Encoder by name (the nb05 strict=False
    load, util.py:236-266): shared trunk + fcclass keys are identical."""
    clf = EncoderClassifier()
    enc = Encoder()
    v_clf = clf.init(jax.random.PRNGKey(0), img)
    v_enc = enc.init({"params": jax.random.PRNGKey(1),
                      "reparam": jax.random.PRNGKey(2)}, img)
    clf_keys = set(v_clf["params"].keys())
    enc_keys = set(v_enc["params"].keys())
    assert clf_keys <= enc_keys
    assert enc_keys - clf_keys == {"fcmean", "fcvar"}

    out = clf.apply(v_clf, img)
    assert out.shape == (B, 4)
    np.testing.assert_allclose(np.asarray(out).sum(1), 1.0, rtol=1e-5)

    # graft classifier params into the encoder; class head must agree
    merged = dict(v_enc["params"])
    merged.update(v_clf["params"])
    _, _, _, cls_out, _ = enc.apply({"params": merged}, img,
                                    rngs={"reparam": jax.random.PRNGKey(3)})
    np.testing.assert_allclose(np.asarray(jax.nn.softmax(cls_out, axis=-1)),
                               np.asarray(out), rtol=1e-4, atol=1e-5)


def test_generator_batch_norm_variant(img, cond):
    """norm_type='batch' (CBBNorm path) initializes and runs with mutable
    batch stats."""
    g = SingleGenerator(norm_type="batch")
    variables = g.init(jax.random.PRNGKey(0), img, cond)
    assert "batch_stats" in variables
    out, updates = g.apply(variables, img, cond, train=True,
                           mutable=["batch_stats"])
    assert out.shape == (B, H, H, 3)
    out_eval = g.apply({"params": variables["params"],
                        "batch_stats": updates["batch_stats"]},
                       img, cond, train=False)
    assert out_eval.shape == (B, H, H, 3)
