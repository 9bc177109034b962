"""Numerical parity of layer primitives vs torch CPU (the reference's op
semantics).  Torch is used only as an oracle — the implementation is pure JAX.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from srgan_tpu.nn.layers import (
    CBINorm,
    Conv2d,
    ConvTranspose2d,
    avg_pool2d,
    instance_norm,
)


def nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_hwio(w_oihw: np.ndarray) -> np.ndarray:
    return np.transpose(w_oihw, (2, 3, 1, 0))


@pytest.mark.parametrize("k,s,p,cin,cout,hw", [
    (7, 1, 3, 3, 64, 32),
    (4, 2, 1, 3, 64, 32),
    (3, 1, 1, 8, 8, 16),
    (1, 1, 0, 8, 4, 16),
    (7, 2, 1, 3, 16, 33),   # encoder stem: odd output size
])
def test_conv2d_matches_torch(rng, k, s, p, cin, cout, hw):
    x = rng.standard_normal((2, cin, hw, hw), dtype=np.float32)
    w = rng.standard_normal((cout, cin, k, k), dtype=np.float32) * 0.1
    b = rng.standard_normal((cout,), dtype=np.float32)

    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=s, padding=p).numpy()

    m = Conv2d(cout, k, s, p, use_bias=True)
    params = {"params": {"kernel": jnp.asarray(to_hwio(w)),
                         "bias": jnp.asarray(b)}}
    out = m.apply(params, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-4)


def test_conv2d_reflect_padding(rng):
    x = rng.standard_normal((2, 8, 16, 16), dtype=np.float32)
    w = rng.standard_normal((8, 8, 3, 3), dtype=np.float32) * 0.1
    xp = F.pad(torch.tensor(x), (1, 1, 1, 1), mode="reflect")
    ref = F.conv2d(xp, torch.tensor(w), stride=1, padding=0).numpy()

    m = Conv2d(8, 3, 1, 1, use_bias=False, padding_mode="reflect")
    params = {"params": {"kernel": jnp.asarray(to_hwio(w))}}
    out = m.apply(params, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p,cin,cout,hw", [
    (4, 2, 1, 16, 8, 8),    # generator up conv shape
    (4, 2, 1, 256, 128, 32),
])
def test_conv_transpose2d_matches_torch(rng, k, s, p, cin, cout, hw):
    x = rng.standard_normal((2, cin, hw, hw), dtype=np.float32)
    w = rng.standard_normal((cin, cout, k, k), dtype=np.float32) * 0.1

    ref = F.conv_transpose2d(torch.tensor(x), torch.tensor(w), stride=s,
                             padding=p).numpy()
    assert ref.shape[-1] == (hw - 1) * s - 2 * p + k

    m = ConvTranspose2d(cout, k, s, p, use_bias=False)
    # internal layout: (kh, kw, in, out) spatially pre-flipped — produced
    # by the canonical torch->internal converter
    from srgan_tpu.utils.checkpoint import _convT_w
    kernel = _convT_w(w)
    out = m.apply({"params": {"kernel": kernel}}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref,
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("win,s,p,cip,hw", [
    (3, 2, 1, False, 128),   # the multi-scale D downsampler (model.py:286)
    (2, 2, 0, True, 62),     # encoder BasicBlock pool, odd input
    (2, 2, 0, True, 31),
])
def test_avg_pool2d_matches_torch(rng, win, s, p, cip, hw):
    x = rng.standard_normal((2, 4, hw, hw), dtype=np.float32)
    ref = F.avg_pool2d(torch.tensor(x), win, stride=s, padding=p,
                       count_include_pad=cip).numpy()
    out = avg_pool2d(jnp.asarray(nhwc(x)), win, s, p, count_include_pad=cip)
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref,
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 16, 16), dtype=np.float32)
    ref = F.instance_norm(torch.tensor(x), eps=1e-5).numpy()
    out = instance_norm(jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-4)


def test_cbinorm_semantics(rng):
    """CBINorm = IN(x) + tanh(cond @ W + b), then affine (model.py:54-67)."""
    x = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    cond = rng.standard_normal((2, 12), dtype=np.float32)
    m = CBINorm(4, affine=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cond))
    out = m.apply(variables, jnp.asarray(x), jnp.asarray(cond))

    p = variables["params"]
    w, b = np.asarray(p["con_bias"]["kernel"]), np.asarray(p["con_bias"]["bias"])
    tar = np.tanh(cond @ w + b)[:, None, None, :]
    xin = np.asarray(instance_norm(jnp.asarray(x)))
    expect = (xin + tar) * np.asarray(p["scale"]) + np.asarray(p["bias"])
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
    # torch-1.4 affine init: scale=1, bias=0
    np.testing.assert_array_equal(np.asarray(p["scale"]), np.ones(4))
    np.testing.assert_array_equal(np.asarray(p["bias"]), np.zeros(4))


def test_torch_default_init_distribution():
    """Conv kernels ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (quirk ledger #1:
    weights_init is a no-op so torch defaults are the effective init)."""
    m = Conv2d(64, 4, 2, 1, use_bias=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    k = np.asarray(variables["params"]["kernel"])
    bound = 1.0 / np.sqrt(3 * 4 * 4)
    assert k.min() >= -bound and k.max() <= bound
    assert k.std() == pytest.approx(2 * bound / np.sqrt(12), rel=0.1)
