"""Loss-stack unit tests against closed-form / numpy / torch oracles
(SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from srgan_tpu.configs import LossWeights
from srgan_tpu.ops import losses as L


def test_lsgan_loss_matches_mse(rng):
    outs = [jnp.asarray(rng.standard_normal((4, 7, 7, 1), dtype=np.float32)),
            jnp.asarray(rng.standard_normal((4, 3, 3, 1), dtype=np.float32))]
    got = L.lsgan_loss(outs, 1.0)
    ref = np.mean([np.mean((np.asarray(o) - 1.0) ** 2) for o in outs])
    assert got == pytest.approx(ref, rel=1e-6)


def test_masked_lsgan_matches_subset(rng):
    out = rng.standard_normal((6, 5, 5, 1), dtype=np.float32)
    mask = np.array([1, 0, 1, 1, 0, 0], np.float32)
    got = L.masked_lsgan_loss([jnp.asarray(out)], 0.0, jnp.asarray(mask))
    ref = np.mean(out[mask.astype(bool)] ** 2)
    assert got == pytest.approx(ref, rel=1e-5)


def test_masked_lsgan_empty_mask_is_zero(rng):
    out = jnp.asarray(rng.standard_normal((4, 5, 5, 1), dtype=np.float32))
    got = L.masked_lsgan_loss([out], 1.0, jnp.zeros(4))
    assert float(got) == 0.0


def test_kl_loss_closed_form(rng):
    mu = rng.standard_normal((8, 8), dtype=np.float32)
    logvar = rng.standard_normal((8, 8), dtype=np.float32) * 0.1
    got = L.kl_loss(jnp.asarray(mu), jnp.asarray(logvar))
    ref = -0.5 * np.sum(1 + logvar - mu**2 - np.exp(logvar))
    assert got == pytest.approx(ref, rel=1e-5)


def test_batch_kl_matches_reference_formula(rng):
    """var = torch.var(mu, 0) [unbiased] * n/(n-1) — the double-correction
    quirk (util_notebook.py:316)."""
    mu = rng.standard_normal((16, 8), dtype=np.float32)
    n = 16
    got = L.batch_kl_loss(jnp.asarray(mu), n)
    t = torch.tensor(mu)
    var = (torch.var(t, dim=0) * n / (n - 1)).numpy()
    mean = mu.mean(0)
    ref = -0.5 * np.sum(1 + np.log(var) - mean**2 - var)
    assert got == pytest.approx(ref, rel=1e-4)


def test_corrcoef_matches_numpy(rng):
    x = rng.standard_normal((5, 120), dtype=np.float32)
    got = np.asarray(L.corrcoef(jnp.asarray(x)))
    ref = np.corrcoef(x)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_corrcoef_loss_identity_is_zero():
    """Perfectly decorrelated rows -> loss 0."""
    n = 64
    x = np.zeros((2, n), np.float32)
    x[0] = np.sin(np.arange(n))
    x[1] = np.cos(2 * np.arange(n))
    v = float(L.corrcoef_loss(jnp.asarray(x)))
    corr = np.corrcoef(x)
    expect = np.sum(np.abs(np.clip(corr, -1, 1) - np.eye(2))) / 2
    assert v == pytest.approx(expect, abs=1e-5)


def test_gaussian_histogram_matches_reference_formula(rng):
    x = rng.standard_normal(200).astype(np.float32)
    bins, vmin, vmax, sigma = 50, -10.0, 10.0, 0.2
    got = np.asarray(L.gaussian_histogram(jnp.asarray(x), bins, vmin, vmax, sigma))
    delta = (vmax - vmin) / bins
    centers = vmin + delta * (np.arange(bins) + 0.5)
    diff = x[None, :] - centers[:, None]
    ref = (np.exp(-0.5 * (diff / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi))
           * delta).sum(1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)
    # mass ~= fraction of samples in range * delta-normalized KDE integral
    assert got.sum() == pytest.approx(len(x), rel=0.05)


def test_histogram_imitation_matches_torch_kldiv(rng):
    """loss = sum_dims F.kl_div(log(p), target, reduction='sum')
    (util.py:547-553)."""
    mu = rng.standard_normal((64, 8)).astype(np.float32)
    target = np.asarray(L.histogram_target(jax.random.PRNGKey(0)))
    got = float(L.histogram_imitation_loss(jnp.asarray(mu),
                                           jnp.asarray(target),
                                           use_pallas=False))
    ref = 0.0
    for i in range(mu.shape[1]):
        h = np.asarray(L.gaussian_histogram(jnp.asarray(mu[:, i])))
        p = h / h.sum() + 1e-8
        ref += F.kl_div(torch.tensor(np.log(p)), torch.tensor(target),
                        None, None, "sum").item()
    assert got == pytest.approx(ref, rel=1e-3)


def test_histogram_target_is_normalized():
    t = np.asarray(L.histogram_target(jax.random.PRNGKey(1)))
    assert t.shape == (50,)
    assert t.sum() == pytest.approx(1.0, abs=1e-3)
    assert (t > 0).all()


def test_diversification_gating():
    """corr/hist only fire when batch_KL > 0 (quirk ledger #2)."""
    mu = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8),
                                                              dtype=np.float32))
    logvar = jnp.zeros_like(mu)
    target = L.histogram_target(jax.random.PRNGKey(0))

    w_off = LossWeights(KL=0.0, batch_KL=0.0, corr_enc=100.0, hist=100.0)
    err, m = L.diversification_loss(mu, logvar, weights=w_off, n_batch=16,
                                    hist_target=target, use_pallas=False)
    assert float(err) == 0.0 and m == {}

    w_on = LossWeights(KL=0.0, batch_KL=10.0, corr_enc=100.0, hist=100.0)
    err, m = L.diversification_loss(mu, logvar, weights=w_on, n_batch=16,
                                    hist_target=target, use_pallas=False)
    assert set(m) == {"loss_batch_KL", "loss_corr", "loss_hist"}
    assert np.isfinite(float(err))


def test_pallas_histogram_matches_jnp(rng):
    """Pallas kernel (interpret mode on CPU) == jnp reference, fwd + grad."""
    from srgan_tpu.ops.pallas.histogram import soft_histogram_cols
    mu = jnp.asarray(rng.standard_normal((32, 8), dtype=np.float32))
    got = soft_histogram_cols(mu)
    ref = jax.vmap(lambda col: L.gaussian_histogram(col), in_axes=1)(mu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def f_pallas(m):
        return jnp.sum(soft_histogram_cols(m) ** 2)

    def f_ref(m):
        return jnp.sum(jax.vmap(lambda c: L.gaussian_histogram(c),
                                in_axes=1)(m) ** 2)

    g1 = jax.grad(f_pallas)(mu)
    g2 = jax.grad(f_ref)(mu)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_fused_diversification_matches_jnp(rng):
    """Fused Pallas kernel (interpret on CPU) == the three jnp losses,
    values and gradients."""
    from srgan_tpu.ops.pallas.diversification import fused_diversification
    mu = jnp.asarray(rng.standard_normal((32, 8), dtype=np.float32))
    target = L.histogram_target(jax.random.PRNGKey(0))
    got = fused_diversification(mu, target, n_batch_cfg=32)
    ref = jnp.stack([
        L.batch_kl_loss(mu, 32),
        L.corrcoef_loss(mu.T),
        L.histogram_imitation_loss(mu, target, use_pallas=False),
    ])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    w = jnp.asarray([10.0, 100.0, 100.0])

    def f_fused(m):
        return jnp.sum(fused_diversification(m, target, 32) * w)

    def f_ref(m):
        return (10.0 * L.batch_kl_loss(m, 32)
                + 100.0 * L.corrcoef_loss(m.T)
                + 100.0 * L.histogram_imitation_loss(m, target,
                                                     use_pallas=False))

    g1 = jax.grad(f_fused)(mu)
    g2 = jax.grad(f_ref)(mu)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_fused_cbinorm_kernel_matches_reference():
    """Fused Pallas instance-norm kernel (interpret on CPU) == the jnp
    CBINorm math, forward and gradients."""
    import jax
    import jax.numpy as jnp
    from srgan_tpu.ops.pallas.norm import fused_cbinorm

    rng = np.random.default_rng(5)
    B, H, W, C = 3, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 2)
    t = jnp.asarray(np.tanh(rng.standard_normal((B, C))).astype(np.float32))
    g = jnp.asarray(rng.uniform(0.5, 1.5, (C,)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))

    def ref(x, t, g, b, relu):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        out = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
        out = (out + t[:, None, None, :]) * g + b
        return jnp.maximum(out, 0.0) if relu else out

    for relu in (False, True):
        got = fused_cbinorm(x, t, g, b, 1e-5, relu)
        want = ref(x, t, g, b, relu)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

        def loss_f(fn):
            return lambda *a: jnp.sum(jnp.sin(fn(*a) * 0.7))

        gf = jax.grad(loss_f(lambda x, t, g, b: fused_cbinorm(
            x, t, g, b, 1e-5, relu)), argnums=(0, 1, 2, 3))(x, t, g, b)
        gr = jax.grad(loss_f(lambda x, t, g, b: ref(x, t, g, b, relu)),
                      argnums=(0, 1, 2, 3))(x, t, g, b)
        for a, e in zip(gf, gr):
            np.testing.assert_allclose(a, e, atol=2e-5, rtol=2e-4)


def test_fused_cbinorm_tail_geometry():
    """Regression (round-3 advisor finding): H*W > 2048 and not a multiple
    of 2048 (e.g. 48x48 -> 2304) must include the remainder rows in the
    stats AND write them — previously they were silently dropped."""
    import jax
    import jax.numpy as jnp
    from srgan_tpu.ops.pallas.norm import fused_cbinorm

    rng = np.random.default_rng(11)
    B, H, W, C = 2, 48, 48, 8        # hw = 2304 = 2048 + 256 tail
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    t = jnp.asarray(np.tanh(rng.standard_normal((B, C))).astype(np.float32))
    g = jnp.asarray(rng.uniform(0.5, 1.5, (C,)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))

    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    want = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)
            + t[:, None, None, :]) * g + b

    got = fused_cbinorm(x, t, g, b, 1e-5, False)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
