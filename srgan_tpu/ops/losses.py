"""Loss primitives — pure jnp functions, trivially jit/vmap/grad-able.

Behavioral spec from the reference:
  - LSGAN adversarial loss            util.py:457-462
  - domain-classification loss        util.py:464-468
  - corrcoef + correlation loss       util.py:470-517
  - Gaussian soft histogram           util.py:521-537
  - histogram-imitation loss          util.py:539-553
  - conventional VAE KL               util_notebook.py:300-304
  - batch KL                          util_notebook.py:314-320

All batch reductions are written as plain jnp reductions: under ``jax.jit``
with a batch-sharded input over a device mesh, GSPMD turns them into global
(cross-chip) reductions automatically, which is exactly the semantics the
single-process reference had for its batch of 128.  An explicit shard_map
variant lives in ``srgan_tpu.parallel.collectives``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


Array = jax.Array


def l1_loss(a: Array, b: Array) -> Array:
    """``torch.mean(torch.abs(a - b))`` — cycle / identity / regression losses
    (util_notebook.py:295, :309, :348)."""
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def lsgan_loss(outputs: Sequence[Array], target: float) -> Array:
    """LSGAN MSE against a constant 0/1 target, averaged over scales.

    Mirrors ``get_loss_D(outputs, target, nn.MSELoss())`` (util.py:457-462):
    per-scale mean over all patch elements, then mean over the scale list.
    """
    loss = 0.0
    for out in outputs:
        out = out.astype(jnp.float32)
        loss = loss + jnp.mean((out - target) ** 2)
    return loss / len(outputs)


def masked_lsgan_loss(outputs: Sequence[Array], target: float, mask: Array) -> Array:
    """LSGAN loss restricted to samples where ``mask`` is 1.

    Replicates the reference's per-domain path, which slices the batch by
    domain before the criterion (util_notebook.py:230-245): the MSE mean runs
    over the masked subset's elements only; an empty subset contributes 0.
    ``mask`` has shape (B,).
    """
    loss = 0.0
    for out in outputs:
        out = out.astype(jnp.float32)
        m = mask.reshape((-1,) + (1,) * (out.ndim - 1)).astype(jnp.float32)
        per_elem = (out - target) ** 2 * m
        # elements per masked sample x number of masked samples
        count = jnp.sum(m) * (out.size // out.shape[0])
        loss = loss + jnp.sum(per_elem) / jnp.maximum(count, 1.0)
    return loss / len(outputs)


def domain_classification_loss(outputs_class: Sequence[Array], onehot: Array) -> Array:
    """Softmaxed class maps vs one-hot label, MSE, averaged over scales.

    Mirrors ``get_domainloss_D`` (util.py:464-468) with the notebooks'
    ``criterion_class = nn.MSELoss()`` (nb02 cell 13) — note MSE on softmax
    outputs, not cross-entropy (quirk ledger #9).
    """
    loss = 0.0
    for out in outputs_class:
        loss = loss + jnp.mean((out.astype(jnp.float32) - onehot) ** 2)
    return loss / len(outputs_class)


def kl_loss(mu: Array, logvar: Array) -> Array:
    """Conventional VAE KL: ``-0.5 * sum(1 + logvar - mu^2 - exp(logvar))``.

    Summed over batch AND latent dims, exactly like the reference's
    ``torch.sum`` (util_notebook.py:302).  (The reference's in-place
    ``logvar.exp_()`` — quirk ledger #4 — has no effect on this value.)
    """
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar))


def batch_kl_loss(mu: Array, n_batch: int) -> Array:
    """Batch-distribution KL (the "proposed" loss, util_notebook.py:314-320).

    The reference computes ``torch.var(mu, 0)`` (unbiased, /(n-1)) and then
    multiplies by ``n_batch/(n_batch-1)`` again, where ``n_batch`` is the
    *configured* batch size — a double bias-correction quirk we replicate
    bit-for-bit.  ``n_batch`` is static.
    """
    mu = mu.astype(jnp.float32)
    var = jnp.var(mu, axis=0, ddof=1) * n_batch / (n_batch - 1)
    mean = jnp.mean(mu, axis=0)
    return -0.5 * jnp.sum(1.0 + jnp.log(var) - mean**2 - var)


def corrcoef(x: Array) -> Array:
    """Differentiable ``np.corrcoef`` mimic over rows (util.py:470-511).

    x: (dims, n) -> (dims, dims) correlation matrix, clamped to [-1, 1].
    """
    x = x.astype(jnp.float32)
    mean_x = jnp.mean(x, axis=1, keepdims=True)
    xm = x - mean_x
    c = xm @ xm.T / (x.shape[1] - 1)
    d = jnp.diag(c)
    stddev = jnp.sqrt(d)
    c = c / stddev[None, :]
    c = c / stddev[:, None]
    return jnp.clip(c, -1.0, 1.0)


def corrcoef_loss(m: Array) -> Array:
    """``sum(|corrcoef(m) - I|) / (n(n-1))`` (util.py:513-517).

    The trainers call this on ``mu.T`` — (style_dims, batch) — so it
    decorrelates the style dimensions across the batch.
    """
    n = m.shape[0]
    coco = corrcoef(m)
    return jnp.sum(jnp.abs(coco - jnp.eye(n))) / (n * (n - 1))


# ---------------------------------------------------------------------------
# Soft (Gaussian-KDE) histogram + imitation loss
# ---------------------------------------------------------------------------

def _hist_centers(bins: int, vmin: float, vmax: float) -> jnp.ndarray:
    delta = (vmax - vmin) / bins
    return vmin + delta * (jnp.arange(bins, dtype=jnp.float32) + 0.5)


def gaussian_histogram(x: Array, bins: int = 50, vmin: float = -10.0,
                       vmax: float = 10.0, sigma: float = 0.2) -> Array:
    """Differentiable histogram via Gaussian KDE at bin centers.

    Mirrors ``GaussianHistogram.forward`` (util.py:532-537):
    ``sum_j exp(-0.5 ((x_j - c_b)/sigma)^2) / (sigma sqrt(2 pi)) * delta``.
    x: (n,) -> (bins,).
    """
    x = x.astype(jnp.float32)
    delta = (vmax - vmin) / bins
    centers = _hist_centers(bins, vmin, vmax)
    diff = x[None, :] - centers[:, None]               # (bins, n)
    w = jnp.exp(-0.5 * (diff / sigma) ** 2) / (sigma * math.sqrt(2 * math.pi)) * delta
    return jnp.sum(w, axis=1)


def histogram_target(key: jax.Array, bins: int = 50, vmin: float = -10.0,
                     vmax: float = 10.0, sigma: float = 0.2,
                     target_num: int = 100_000) -> Array:
    """Normalized soft histogram of N(0,1) samples — the imitation target.

    The reference draws 100k ``torch.randn`` samples at trainer construction
    (util.py:539-545); we draw from a JAX PRNG (statistically identical).
    Returns (bins,) summing to ~1 (+ the reference's 1e-8 epsilon shift).
    """
    samples = jax.random.normal(key, (target_num,), dtype=jnp.float32)
    h = gaussian_histogram(samples, bins, vmin, vmax, sigma)
    return h / jnp.sum(h) + 1e-8


def histogram_imitation_loss(mu: Array, target: Array, bins: int = 50,
                             vmin: float = -10.0, vmax: float = 10.0,
                             sigma: float = 0.2,
                             use_pallas: bool | None = None) -> Array:
    """Sum over style dims of ``KL(target || softhist(mu[:, i]))``.

    Mirrors ``histogram_imitation.loss`` (util.py:547-553):
    ``F.kl_div(input.log(), target, reduction="sum")``
    = ``sum(target * (log target - log input))``.

    mu: (batch, dims);  target: (bins,).

    When ``use_pallas`` is true (default: auto on TPU), the per-dim soft
    histograms are computed by a fused Pallas kernel
    (srgan_tpu.ops.pallas.histogram).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from srgan_tpu.ops.pallas.histogram import soft_histogram_cols
        hists = soft_histogram_cols(mu, bins, vmin, vmax, sigma)  # (dims, bins)
    else:
        hists = jax.vmap(
            lambda col: gaussian_histogram(col, bins, vmin, vmax, sigma),
            in_axes=1)(mu)                                         # (dims, bins)
    target = target.astype(jnp.float32)
    p = hists / jnp.sum(hists, axis=1, keepdims=True) + 1e-8       # (dims, bins)
    kl_per_dim = jnp.sum(target[None, :] * (jnp.log(target)[None, :] - jnp.log(p)),
                         axis=1)
    return jnp.sum(kl_per_dim)


def diversification_loss(mu: Array, logvar: Array, *, weights, n_batch: int,
                         hist_target: Array | None,
                         use_pallas: bool | None = None):
    """The gated encoder-restriction loss stack.

    Replicates the reference's gating structure exactly, including the quirk
    that ``corr_enc`` and ``hist`` are nested inside ``batch_KL > 0``
    (util_notebook.py:300-332 / :630-662, quirk ledger #2).  Gates are static
    Python conditions on the (static) weight dataclass, so no retracing traps.

    Returns (errE, metrics_dict).
    """
    if use_pallas is None:
        # Whole-step A/B on v5e (round 3, docs/PERF.md): fused Pallas
        # 344.19 img/s vs XLA 344.23 — an exact tie (the (B,8) op is
        # negligible either way).  Tie -> simpler default: the XLA path,
        # which is also the reference-semantics implementation.  The fused
        # kernel stays available via SRGAN_TPU_FUSED_DIV=1.
        import os
        use_pallas = (os.environ.get("SRGAN_TPU_FUSED_DIV") == "1"
                      and jax.default_backend() == "tpu")
    errE = jnp.float32(0.0)
    metrics = {}
    if weights.KL > 0:
        v = kl_loss(mu, logvar)
        errE = errE + v * weights.KL
        metrics["loss_KL"] = v
    if (use_pallas and weights.batch_KL > 0 and weights.corr_enc > 0
            and weights.hist > 0):
        # the full proposed stack: one fused Pallas pass over mu
        from srgan_tpu.ops.pallas.diversification import fused_diversification
        bkl, corr, hist = fused_diversification(mu, hist_target, n_batch)
        errE = errE + (bkl * weights.batch_KL + corr * weights.corr_enc
                       + hist * weights.hist)
        metrics.update(loss_batch_KL=bkl, loss_corr=corr, loss_hist=hist)
        return errE, metrics
    if weights.batch_KL > 0:
        v = batch_kl_loss(mu, n_batch)
        errE = errE + v * weights.batch_KL
        metrics["loss_batch_KL"] = v
        if weights.corr_enc > 0:
            v = corrcoef_loss(mu.T.astype(jnp.float32))
            errE = errE + v * weights.corr_enc
            metrics["loss_corr"] = v
        if weights.hist > 0:
            v = histogram_imitation_loss(mu, hist_target, use_pallas=use_pallas)
            errE = errE + v * weights.hist
            metrics["loss_hist"] = v
    return errE, metrics
