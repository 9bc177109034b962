"""Explicit-collective (shard_map) forms of the batch-global losses.

Under plain ``jax.jit`` + NamedSharding the jnp reductions in
``srgan_tpu.ops.losses`` are already global — GSPMD partitions the batch axis
and inserts the cross-chip collectives.  These shard_map versions exist for
(a) users composing with shard_map-based steps, and (b) tests pinning down the
exact collective semantics (psum of moments / histogram counts over ICI).

Reference semantics being reproduced globally: batch-KL
(util_notebook.py:314-320), corrcoef over the global batch (util.py:470-517),
soft-histogram counts over the global batch (util.py:521-553).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def global_batch_kl(mu_local: jax.Array, n_batch_cfg: int, axis: str) -> jax.Array:
    """Batch-KL with moments psum'd over the mesh axis.

    Exactly matches ``batch_kl_loss`` on the concatenated global batch,
    including the reference's double bias-correction: unbiased variance over
    the global batch, then * n_cfg/(n_cfg-1).
    """
    n = jax.lax.psum(mu_local.shape[0], axis)
    s1 = jax.lax.psum(jnp.sum(mu_local, 0), axis)
    s2 = jax.lax.psum(jnp.sum(mu_local**2, 0), axis)
    mean = s1 / n
    var_biased = s2 / n - mean**2
    var = var_biased * n / (n - 1) * n_batch_cfg / (n_batch_cfg - 1)
    return -0.5 * jnp.sum(1.0 + jnp.log(var) - mean**2 - var)


def global_corrcoef_loss(mu_local: jax.Array, axis: str) -> jax.Array:
    """corrcoef_loss(mu_global.T) via psum'd first/second moments."""
    d = mu_local.shape[1]
    n = jax.lax.psum(mu_local.shape[0], axis)
    s1 = jax.lax.psum(jnp.sum(mu_local, 0), axis)            # (d,)
    s2 = jax.lax.psum(mu_local.T @ mu_local, axis)           # (d, d)
    mean = s1 / n
    cov = (s2 - n * jnp.outer(mean, mean)) / (n - 1)
    std = jnp.sqrt(jnp.diag(cov))
    corr = jnp.clip(cov / std[None, :] / std[:, None], -1.0, 1.0)
    return jnp.sum(jnp.abs(corr - jnp.eye(d))) / (d * (d - 1))


def global_histogram_imitation(mu_local: jax.Array, target: jax.Array,
                               axis: str, bins: int = 50, vmin: float = -10.0,
                               vmax: float = 10.0, sigma: float = 0.2
                               ) -> jax.Array:
    """Histogram-imitation loss with per-bin KDE counts psum'd over chips."""
    delta = (vmax - vmin) / bins
    centers = vmin + delta * (jnp.arange(bins, dtype=jnp.float32) + 0.5)
    # (dims, bins, local_batch) KDE weights, reduced locally then psum'd
    diff = mu_local.T[:, None, :] - centers[None, :, None]
    w = jnp.exp(-0.5 * (diff / sigma) ** 2) / (sigma * math.sqrt(2 * math.pi)) * delta
    hist_local = jnp.sum(w, axis=2)                          # (dims, bins)
    hist = jax.lax.psum(hist_local, axis)
    p = hist / jnp.sum(hist, axis=1, keepdims=True) + 1e-8
    return jnp.sum(target[None, :] * (jnp.log(target)[None, :] - jnp.log(p)))
