"""Precision / Recall / Density / Coverage — pure-JAX, MXU-batched.

Reimplements the algorithm of the ``prdc==0.2`` pip package (Naeem et al.
2020, "Reliable Fidelity and Diversity Metrics for Generative Models") that
the reference calls in ``GAN_evaluation.get_prdc`` (evaluation.py:98-110):

  radii_X = kth-NN distance within X, where the kth value is taken over the
            full self-distance row (self-distance 0 included, so k+1 smallest)
  precision = mean over fakes of  any_r [ d(r, f) < radii_real[r] ]
  recall    = mean over reals of  any_f [ d(r, f) < radii_fake[f] ]
  density   = (1/k) mean over fakes of  sum_r [ d(r, f) < radii_real[r] ]
  coverage  = mean over reals of  [ min_f d(r, f) < radii_real[r] ]

Pairwise distances are computed via the squared-norm + Gram-matrix identity —
one big matmul on the MXU instead of the reference's O(N^2 d) broadcast.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_dist_gram(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix via the Gram identity (fp32) — one MXU
    matmul, but catastrophic cancellation turns true zeros (duplicate
    points) into ~1e-3 distances."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=1)
    y2 = jnp.sum(y * y, axis=1)
    sq = x2[:, None] + y2[None, :] - 2.0 * (x @ y.T)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


_ROW_BLOCK = 16


def _pairwise_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Exact (diff-based) Euclidean distance matrix in fp32.

    sum((x - y)^2) has no cancellation — duplicate points yield EXACTLY 0,
    which the strict ``<`` comparisons of the prdc algorithm rely on when
    kth-NN radii collapse to 0.  Processed in row blocks to bound the
    (block, N, d) intermediate; FLOP count matches the Gram matmul (O(N^2 d))
    and eval-set sizes here are ~1e2-1e3, so this stays cheap.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    n = x.shape[0]
    pad = (-n) % _ROW_BLOCK
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    blocks = xp.reshape(-1, _ROW_BLOCK, x.shape[1])

    def block_dist(xb):
        diff = xb[:, None, :] - y[None, :, :]
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    d = jax.lax.map(block_dist, blocks).reshape(-1, y.shape[0])
    return d[:n]


def _kth_nn_radii(feats: jnp.ndarray, nearest_k: int) -> jnp.ndarray:
    """kth value (max of the k+1 smallest, self included) of each row of the
    self-distance matrix — exactly prdc's get_kth_value(d, k=nearest_k+1)."""
    d = _pairwise_dist(feats, feats)
    neg_smallest, _ = jax.lax.top_k(-d, nearest_k + 1)
    return -jnp.min(neg_smallest, axis=1)    # max of the (k+1) smallest


@functools.partial(jax.jit, static_argnames=("nearest_k",))
def _prdc_jit(real, fake, nearest_k):
    radii_real = _kth_nn_radii(real, nearest_k)
    radii_fake = _kth_nn_radii(fake, nearest_k)
    d_rf = _pairwise_dist(real, fake)

    hit = d_rf < radii_real[:, None]
    precision = jnp.mean(jnp.any(hit, axis=0).astype(jnp.float32))
    recall = jnp.mean(
        jnp.any(d_rf < radii_fake[None, :], axis=1).astype(jnp.float32))
    density = jnp.mean(jnp.sum(hit.astype(jnp.float32), axis=0)) / nearest_k
    coverage = jnp.mean(
        (jnp.min(d_rf, axis=1) < radii_real).astype(jnp.float32))
    return precision, recall, density, coverage


def compute_prdc(real_features, fake_features,
                 nearest_k: int = 5) -> Dict[str, float]:
    """Drop-in equivalent of ``prdc.compute_prdc``."""
    p, r, d, c = _prdc_jit(jnp.asarray(real_features),
                           jnp.asarray(fake_features), nearest_k)
    return {"precision": float(p), "recall": float(r),
            "density": float(d), "coverage": float(c)}


def compute_prdc_numpy(real_features, fake_features,
                       nearest_k: int = 5) -> Dict[str, float]:
    """Reference-algorithm numpy oracle (used by tests)."""
    real = np.asarray(real_features, np.float64)
    fake = np.asarray(fake_features, np.float64)

    def dist(a, b):
        return np.sqrt(np.maximum(
            (a * a).sum(1)[:, None] + (b * b).sum(1)[None] - 2 * a @ b.T, 0))

    def radii(x):
        d = dist(x, x)
        part = np.partition(d, nearest_k, axis=1)[:, :nearest_k + 1]
        return part.max(axis=1)

    rr, rf = radii(real), radii(fake)
    d_rf = dist(real, fake)
    return {
        "precision": float((d_rf < rr[:, None]).any(axis=0).mean()),
        "recall": float((d_rf < rf[None, :]).any(axis=1).mean()),
        "density": float((d_rf < rr[:, None]).sum(axis=0).mean() / nearest_k),
        "coverage": float((d_rf.min(axis=1) < rr).mean()),
    }
