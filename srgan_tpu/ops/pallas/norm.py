"""Fused instance-norm kernels (Pallas/TPU) with custom VJP.

The generator applies conditional instance norm after every conv
(reference model.py:12-73); under XLA each norm costs a convert+reduce pass
for the mean, another full read for the variance, and an apply pass —
~4 full HBM sweeps of the activation per norm, measured at ~50 ms/step of
the full-size train step (docs/PERF.md round-2 trace).  This kernel does
stats + normalize + conditional bias + affine + optional ReLU in ONE
VMEM-resident pass per sample: one read, one write.

Layout: x viewed as (B, H*W, C); grid over B; block (1, H*W, C) sits in
VMEM (the largest generator tensor is 128*128*64*2B = 2 MB per sample,
well under the ~16 MB budget).  Stats in fp32.

Backward uses the standard instance/layer-norm gradient, evaluated with
plain jnp (XLA) from saved (x, mean, rstd) residuals — the forward is where
the redundant HBM sweeps were.

Used by nn.layers.{instance_norm, CBINorm} on the TPU backend; the jnp path
remains the reference implementation and the CPU/test path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(x_ref, t_ref, g_ref, b_ref, o_ref, mu_ref, r_ref, *,
                eps: float, relu: bool, n: int):
    """Stats via chunked one-pass sum/sumsq accumulation so only a small
    f32 chunk is ever live (the bf16 sample block itself stays resident);
    keeps VMEM pressure low enough for cross-sample pipelining."""
    i = pl.program_id(0)
    C = x_ref.shape[2]
    ch = min(n, 2048)
    nch = n // ch
    rem = n - nch * ch       # static tail when 2048 does not divide n

    def stat_body(c, acc):
        s, ss = acc
        xb = x_ref[0, pl.ds(c * ch, ch), :].astype(jnp.float32)
        return (s + jnp.sum(xb, axis=0, keepdims=True),
                ss + jnp.sum(xb * xb, axis=0, keepdims=True))

    s, ss = jax.lax.fori_loop(
        0, nch, stat_body,
        (jnp.zeros((1, C), jnp.float32), jnp.zeros((1, C), jnp.float32)))
    if rem:
        xb = x_ref[0, pl.ds(nch * ch, rem), :].astype(jnp.float32)
        s = s + jnp.sum(xb, axis=0, keepdims=True)
        ss = ss + jnp.sum(xb * xb, axis=0, keepdims=True)
    mu = s / n
    var = jnp.maximum(ss / n - mu * mu, 0.0)
    r = jax.lax.rsqrt(var + eps)
    shift = (t_ref[i][None, :] - mu * r) * g_ref[0][None, :] + b_ref[0][None, :]
    scale = r * g_ref[0][None, :]

    def apply_body(c, _):
        xb = x_ref[0, pl.ds(c * ch, ch), :].astype(jnp.float32)
        out = xb * scale + shift
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[0, pl.ds(c * ch, ch), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nch, apply_body, 0)
    if rem:
        xb = x_ref[0, pl.ds(nch * ch, rem), :].astype(jnp.float32)
        out = xb * scale + shift
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[0, pl.ds(nch * ch, rem), :] = out.astype(o_ref.dtype)
    mu_ref[i, :] = mu[0]
    r_ref[i, :] = r[0]


def _fused_fwd(x, t, g, b, eps: float, relu: bool):
    B, H, W, C = x.shape
    hw = H * W
    x2 = x.reshape(B, hw, C)
    kernel = functools.partial(_fwd_kernel, eps=eps, relu=relu, n=hw)
    # (B, C) and (1, C) tensors ride as whole-array blocks (Mosaic requires
    # block minor dims divisible by (8, 128) OR equal to the array's), with
    # the kernel indexing rows by program_id.
    out, mu, r = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, hw, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hw, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, hw, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((B, C), jnp.float32),
        ),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x2, t, g[None, :], b[None, :])
    return out.reshape(B, H, W, C), mu, r


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_cbinorm(x, t, g, b, eps: float = 1e-5, relu: bool = False):
    """out = relu? (IN(x) + t[b, c]) * g[c] + b[c].

    x: (B, H, W, C) activations; t: (B, C) conditional bias (already
    tanh'ed); g, b: (C,) affine.  Matches CBINorm's math (model.py:54-67)
    bit-for-bit up to fp reassociation.
    """
    out, _, _ = _fused_fwd(x, t, g, b, eps, relu)
    return out


def _cbinorm_fwd(x, t, g, b, eps, relu):
    out, mu, r = _fused_fwd(x, t, g, b, eps, relu)
    return out, (x, t, g, b, mu, r)


def _cbinorm_bwd(eps, relu, res, dy):
    x, t, g, b, mu, r = res
    B, H, W, C = x.shape
    dy = dy.astype(jnp.float32).reshape(B, -1, C)
    x32 = x.astype(jnp.float32).reshape(B, -1, C)
    xhat = (x32 - mu[:, None, :]) * r[:, None, :]
    if relu:
        out = (xhat + t[:, None, :]) * g[None, None, :] + b[None, None, :]
        dy = dy * (out > 0)
    db = jnp.sum(dy, axis=(0, 1))
    dg = jnp.sum(dy * (xhat + t[:, None, :]), axis=(0, 1))
    dt = jnp.sum(dy, axis=1) * g[None, :]
    dxhat = dy * g[None, None, :]
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = r[:, None, :] * (dxhat - m1 - xhat * m2)
    return (dx.reshape(x.shape).astype(x.dtype), dt.astype(t.dtype),
            dg.astype(g.dtype), db.astype(b.dtype))


fused_cbinorm.defvjp(_cbinorm_fwd, _cbinorm_bwd)


def fused_instance_norm(x, eps: float = 1e-5, relu: bool = False):
    """Plain instance norm (optionally + ReLU) via the same kernel with
    t = 0, g = 1, b = 0."""
    B, _, _, C = x.shape
    zero_t = jnp.zeros((B, C), jnp.float32)
    return fused_cbinorm(x, zero_t, jnp.ones((C,), jnp.float32),
                         jnp.zeros((C,), jnp.float32), eps, relu)
