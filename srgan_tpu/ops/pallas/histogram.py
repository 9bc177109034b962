"""Fused Pallas TPU kernel for the Gaussian soft histogram.

The histogram-imitation loss (reference util.py:521-553) needs, for every
style dimension d, the KDE histogram

    H[d, b] = sum_i exp(-0.5 ((mu[i, d] - c_b) / sigma)^2) * delta / (sigma sqrt(2 pi))

i.e. a (batch x bins) outer-difference -> exp -> reduce, per dimension.  The
reference loops over dimensions in Python with a fresh (bins, batch) temp each
time; here all dimensions are computed in a single VMEM-resident kernel
(one HBM read of mu, one HBM write of the (dims, bins) result), with a fused
custom-VJP backward kernel.

Shapes are tiny (mu is (B, 8), 50 bins), so this is bandwidth/fusion hygiene
rather than a FLOP win — it keeps the diversification-loss stack off the HBM
round-trip path.  A jnp reference implementation lives in
``srgan_tpu.ops.losses.gaussian_histogram`` and is used for CPU tests.
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


def _fwd_kernel(mu_ref, out_ref, *, bins, vmin, vmax, sigma):
    delta = (vmax - vmin) / bins
    norm = delta / (sigma * math.sqrt(2.0 * math.pi))
    # Mosaic requires integer iota; cast after (tpu.iota is int-only)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1).astype(jnp.float32)
    centers = vmin + delta * (b_idx + 0.5)                      # (1, bins)
    n_dims = mu_ref.shape[1]
    for d in range(n_dims):                                     # static, tiny
        col = mu_ref[:, d].reshape(-1, 1)                       # (B, 1)
        diff = (col - centers) / sigma                          # (B, bins)
        w = jnp.exp(-0.5 * diff * diff) * norm
        out_ref[d, :] = jnp.sum(w, axis=0)


def _bwd_kernel(mu_ref, g_ref, dmu_ref, *, bins, vmin, vmax, sigma):
    delta = (vmax - vmin) / bins
    norm = delta / (sigma * math.sqrt(2.0 * math.pi))
    # Mosaic requires integer iota; cast after (tpu.iota is int-only)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1).astype(jnp.float32)
    centers = vmin + delta * (b_idx + 0.5)
    n_dims = mu_ref.shape[1]
    for d in range(n_dims):
        col = mu_ref[:, d].reshape(-1, 1)
        z = (col - centers) / sigma                             # (B, bins)
        w = jnp.exp(-0.5 * z * z) * norm
        dw = -w * z / sigma                                     # dH[b]/dmu[i]
        g_row = g_ref[d, :].reshape(1, -1)                      # (1, bins)
        dmu_ref[:, d] = jnp.sum(dw * g_row, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def soft_histogram_cols(mu: jax.Array, bins: int = 50, vmin: float = -10.0,
                        vmax: float = 10.0, sigma: float = 0.2) -> jax.Array:
    """Per-column Gaussian soft histograms: (B, D) -> (D, bins), float32."""
    return _fwd(mu, bins, vmin, vmax, sigma)


def _fwd(mu, bins, vmin, vmax, sigma):
    mu = mu.astype(jnp.float32)
    kern = functools.partial(_fwd_kernel, bins=bins, vmin=vmin, vmax=vmax,
                             sigma=sigma)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((mu.shape[1], bins), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(mu)


def _fwd_rule(mu, bins, vmin, vmax, sigma):
    return _fwd(mu, bins, vmin, vmax, sigma), mu


def _bwd_rule(bins, vmin, vmax, sigma, mu, g):
    mu = mu.astype(jnp.float32)
    kern = functools.partial(_bwd_kernel, bins=bins, vmin=vmin, vmax=vmax,
                             sigma=sigma)
    dmu = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(mu.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(mu, g.astype(jnp.float32))
    return (dmu,)


soft_histogram_cols.defvjp(_fwd_rule, _bwd_rule)
