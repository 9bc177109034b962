"""Fused Pallas kernel for the full diversification-loss stack.

One VMEM-resident pass over the style means ``mu`` (B, D) computes all three
restriction losses of the proposed method (reference util_notebook.py:314-332
+ util.py:470-553):

    batch-KL   -0.5 sum(1 + log v - m^2 - v),  v with the reference's double
               bias correction (unbiased over the batch, then * n_cfg/(n_cfg-1))
    corr       sum|corrcoef(mu^T) - I| / (D(D-1))
    histogram  sum_d KL(target || softhist(mu[:, d]))

mu is read from HBM once and all three reductions (moments, D x D Gram
matrix, per-dim KDE histograms) happen on-chip — vs. the reference's separate
torch kernels with three HBM round-trips.  The backward pass is the jax.grad
of the jnp reference composition (a (B, 8) op; XLA fuses it — writing it in
Pallas buys nothing), registered through custom_vjp so the primal runs the
fused kernel.

Returns the three RAW (unweighted) losses; gating/weights stay in
``ops.losses.diversification_loss``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_kernel(mu_ref, target_ref, out_ref, *, n_batch_cfg, bins, vmin,
                  vmax, sigma):
    mu = mu_ref[:].astype(jnp.float32)                   # (B, D)
    B, D = mu.shape

    # ---- moments (shared by batch-KL and corr); the variance comes from
    # raw moments rather than diag(cov) — Mosaic can't relayout the matmul
    # output for a masked axis-reduce ("Offset change")
    s1 = jnp.sum(mu, axis=0)                             # (D,)
    mean = s1 / B
    centered = mu - mean[None, :]
    var_unb = jnp.sum(centered * centered, axis=0) / (B - 1)      # (D,)
    cov = jnp.dot(centered.T, centered,
                  preferred_element_type=jnp.float32) / (B - 1)   # (D, D)
    row = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    eye = (row == col).astype(jnp.float32)

    # ---- batch-KL with the double bias correction (quirk #12)
    v = var_unb * n_batch_cfg / (n_batch_cfg - 1)
    bkl = -0.5 * jnp.sum(1.0 + jnp.log(v) - mean**2 - v)

    # ---- correlation loss
    std = jnp.sqrt(var_unb)
    corr = cov / std[None, :] / std[:, None]
    corr = jnp.clip(corr, -1.0, 1.0)
    corr_loss = jnp.sum(jnp.abs(corr - eye)) / (D * (D - 1))

    # ---- histogram-imitation loss
    delta = (vmax - vmin) / bins
    norm = delta / (sigma * math.sqrt(2.0 * math.pi))
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1).astype(
        jnp.float32)
    centers = vmin + delta * (b_idx + 0.5)               # (1, bins)
    target = target_ref[0, :]                            # (bins,)
    log_target = jnp.log(target)
    hist_loss = jnp.float32(0.0)
    for d in range(D):                                   # static, tiny
        colv = mu[:, d].reshape(-1, 1)                   # (B, 1)
        z = (colv - centers) / sigma                     # (B, bins)
        h = jnp.sum(jnp.exp(-0.5 * z * z) * norm, axis=0)
        p = h / jnp.sum(h) + 1e-8
        hist_loss = hist_loss + jnp.sum(target * (log_target - jnp.log(p)))

    out_ref[0, 0] = bkl
    out_ref[0, 1] = corr_loss
    out_ref[0, 2] = hist_loss


def _reference_jnp(mu, target, n_batch_cfg, bins, vmin, vmax, sigma):
    from srgan_tpu.ops import losses as L

    bkl = L.batch_kl_loss(mu, n_batch_cfg)
    corr = L.corrcoef_loss(mu.T.astype(jnp.float32))
    hist = L.histogram_imitation_loss(mu, target, bins, vmin, vmax, sigma,
                                      use_pallas=False)
    return jnp.stack([bkl, corr, hist])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_diversification(mu: jax.Array, target: jax.Array,
                          n_batch_cfg: int, bins: int = 50,
                          vmin: float = -10.0, vmax: float = 10.0,
                          sigma: float = 0.2) -> jax.Array:
    """(B, D) mu + (bins,) target -> [batch_kl, corr, hist] (raw)."""
    return _fwd(mu, target, n_batch_cfg, bins, vmin, vmax, sigma)


def _fwd(mu, target, n_batch_cfg, bins, vmin, vmax, sigma):
    kern = functools.partial(_fused_kernel, n_batch_cfg=n_batch_cfg,
                             bins=bins, vmin=vmin, vmax=vmax, sigma=sigma)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=_interpret(),
    )(mu.astype(jnp.float32), target.astype(jnp.float32).reshape(1, -1))
    return out[0]


def _fwd_rule(mu, target, n_batch_cfg, bins, vmin, vmax, sigma):
    return _fwd(mu, target, n_batch_cfg, bins, vmin, vmax, sigma), (mu, target)


def _bwd_rule(n_batch_cfg, bins, vmin, vmax, sigma, residuals, g):
    mu, target = residuals
    _, vjp = jax.vjp(
        lambda m: _reference_jnp(m, target, n_batch_cfg, bins, vmin, vmax,
                                 sigma), mu.astype(jnp.float32))
    (dmu,) = vjp(g.astype(jnp.float32))
    return dmu, None


fused_diversification.defvjp(_fwd_rule, _bwd_rule)
