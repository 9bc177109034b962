"""Layer primitives with PyTorch-compatible semantics, NHWC/TPU-native.

Everything here is designed for the XLA TPU backend: NHWC layouts (the MXU
conv layout), fp32 parameters with a configurable compute dtype (bfloat16 on
TPU), and normalization statistics always in fp32.

bfloat16 note: convs/dots run at the module ``dtype``; the MXU accumulates
bf16 operands in fp32 internally, and leaving the output dtype equal to the
operand dtype keeps fwd/bwd cotangent dtypes consistent under jax.grad.

Parity notes (checked by tests/test_layer_parity.py against torch CPU):
  - default init replicates torch's Conv2d/Linear reset_parameters
    (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)), same
    for bias).  The reference's ``weights_init`` is a case-sensitivity no-op
    (util.py:193-203, quirk ledger #1), so torch-default init IS the
    reference's effective init.
  - ConvTranspose2d matches torch's output-size formula (H-1)*s - 2p + k.
  - avg_pool2d supports count_include_pad=False (model.py:286 uses it).
  - CBINorm: instance norm (no affine) + tanh(Linear(cond)) channel bias,
    then per-channel affine — reference model.py:12-73.
  - CBBNorm: batch norm + spatial-average bias swap — reference model.py:75-171.
"""

from __future__ import annotations

import math
from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array
Dtype = Any


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


# ---------------------------------------------------------------------------
# Initializers (torch-default replication)
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for HWIO conv kernels.

    torch Conv2d uses kaiming_uniform_(a=sqrt(5)) whose bound reduces to
    1/sqrt(fan_in) with fan_in = in_ch * kh * kw.
    """
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for (in, out) dense kernels."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Functional ops
# ---------------------------------------------------------------------------

def _use_fused_norm(x: Array) -> bool:
    """Fused Pallas instance-norm gate (opt-in via SRGAN_TPU_FUSED_NORM=1).

    Measured on v5e at the full bench config the fused kernel LOSES to XLA
    (233 vs 299 img/s): XLA already multi-emits the mean reduction from the
    producing conv's epilogue and fuses the apply, so the pallas_call's
    fusion barrier costs more than the saved passes (docs/PERF.md).  Kept
    available for other geometries.
    """
    import os
    if os.environ.get("SRGAN_TPU_FUSED_NORM") != "1":
        return False
    if jax.default_backend() != "tpu" or x.ndim != 4:
        return False
    hw = x.shape[1] * x.shape[2]
    slab = hw * x.shape[-1] * x.dtype.itemsize
    return hw % 16 == 0 and x.shape[-1] % 8 == 0 and slab <= 8 * 1024 * 1024


def instance_norm(x: Array, eps: float = 1e-5, relu: bool = False) -> Array:
    """Per-(sample, channel) normalization over H, W.  No affine, no running
    stats — matches ``nn.InstanceNorm2d(affine=False)`` / ``F.instance_norm``
    as used by the reference (model.py:58-60, :178).  Stats in fp32.

    ``relu=True`` fuses the caller's following ReLU.  On TPU this runs as a
    single-pass Pallas kernel (ops/pallas/norm.py); the jnp path below is
    the reference semantics and the CPU/test path.
    """
    if _use_fused_norm(x):
        from srgan_tpu.ops.pallas.norm import fused_instance_norm
        return fused_instance_norm(x, eps, relu)
    x32 = x.astype(jnp.float32)
    # one-pass moments: E[x] and E[x^2] are both plain reductions of the
    # producing conv's output, so XLA multi-emits them from the conv's
    # epilogue fusion — the two-pass jnp.var form forces a full re-read of
    # the activation for the (x - mean)^2 pass (~30% of round-1 step time
    # was these convert+reduce sweeps, docs/PERF.md)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(x32 * x32, axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def avg_pool2d(x: Array, window: int, stride: int, padding: int = 0,
               count_include_pad: bool = True) -> Array:
    """NHWC average pool matching ``nn.AvgPool2d`` semantics.

    count_include_pad=False divides each window's sum by the number of
    non-padding elements (model.py:286, :324 use AvgPool2d(3, 2, 1, count_
    include_pad=False)).
    """
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    # NOTE: the init value must be a Python scalar 0 for JAX to lower this to
    # the differentiable reduce_window_sum primitive.
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    if count_include_pad or padding == 0:
        return summed / (window * window)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pads)
    return summed / counts


def adaptive_avg_pool(x: Array) -> Array:
    """``nn.AdaptiveAvgPool2d(1)`` + flatten: (B,H,W,C) -> (B,C), fp32 mean."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


def leaky_relu(x: Array, negative_slope: float = 0.01) -> Array:
    return jax.nn.leaky_relu(x, negative_slope)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class Conv2d(nn.Module):
    """NHWC conv with torch-default init and torch padding semantics.

    padding_mode "zeros" or "reflect" (encoder BasicBlocks use reflect,
    model.py:358).  Kernel stored HWIO in fp32; computed in ``dtype``.

    TPU note: stride-1 same-pad convs with very few output channels (the
    generator's final 7x7 -> 3 conv) waste 125/128 MXU lanes; they are
    rewritten exactly as an output space-to-depth conv (stride s, kernel
    (k+s-1)^2, features*s^2 channels = the s x s pixel block), ~1.5x faster
    measured on v5e and with a far cheaper autodiff backward (the grads flow
    through 48-channel convs instead of 3-channel ones).  The rewrite is a
    pure reassociation of the same multiply-adds — enabled on every backend
    so the torch-fidelity tests cover it.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    padding_mode: str = "zeros"
    dtype: Dtype = jnp.float32
    # output space-to-depth block for narrow-output convs; None disables
    s2d_out_block: int = 4

    def _s2d_out_applicable(self, x, kh, kw, sh, sw, ph, pw) -> bool:
        s = self.s2d_out_block
        return (s is not None and s > 1
                and self.padding_mode == "zeros"
                and sh == 1 and sw == 1 and kh == kw and kh % 2 == 1
                and ph == pw == kh // 2
                and self.features * s * s <= 192
                and x.ndim == 4
                and x.shape[1] % s == 0 and x.shape[2] % s == 0
                and x.shape[1] >= kh + s)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (kh, kw, in_ch, self.features), jnp.float32)
        if self._s2d_out_applicable(x, kh, kw, sh, sw, ph, pw):
            y = _conv_s2d_out(x.astype(self.dtype), kernel.astype(self.dtype),
                              kh, ph, self.features, self.s2d_out_block)
        else:
            if self.padding_mode == "reflect" and (ph or pw):
                x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                            mode="reflect")
                pad = ((0, 0), (0, 0))
            else:
                pad = ((ph, ph), (pw, pw))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(sh, sw), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", make_torch_bias_init(kh * kw * in_ch),
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


def _conv_s2d_out(x: Array, kernel: Array, k: int, p: int, cout: int,
                  s: int) -> Array:
    """Stride-1 same-pad conv computed as an s-strided conv emitting the
    s x s output-pixel block as cout*s*s channels (see Conv2d docstring).

    out[s*i + py] needs input rows (s*i + py - p) .. (s*i + py - p + k - 1):
    a stride-s conv with per-side pad (p, p + s - 1), kernel rows py..py+k-1
    of a (k+s-1)-tall buffer holding the original kernel at offset py.
    """
    ks = k + s - 1
    in_ch = x.shape[-1]
    kb = jnp.zeros((ks, ks, in_ch, cout * s * s), kernel.dtype)
    for py in range(s):
        for px in range(s):
            kb = kb.at[py:py + k, px:px + k, :,
                       (py * s + px) * cout:(py * s + px + 1) * cout
                       ].add(kernel)
    y = jax.lax.conv_general_dilated(
        x, kb, window_strides=(s, s),
        padding=((p, p + s - 1), (p, p + s - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, hs, ws, _ = y.shape
    y = y.reshape(b, hs, ws, s, s, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hs * s, ws * s, cout)


class ConvTranspose2d(nn.Module):
    """Transposed conv matching ``nn.ConvTranspose2d(k, s, p)``:
    out = (in - 1) * s - 2p + k.

    Implemented as an input-dilated forward conv (lhs_dilation=s, per-side pad
    k-1-p, spatially-flipped kernel) — the form XLA maps onto the MXU.
    Kernel param stored HWIO as (kh, kw, in, out); the .pth importer flips
    from torch's (in, out, kh, kw).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        # torch convtranspose init: fan_in from the weight's shape
        # (in, out, kh, kw) -> fan computed on dim-1 x k = out*kh*kw?  torch
        # _ConvTransposeNd uses kaiming_uniform on the same weight tensor; its
        # fan_in is weight.size(1) * kh * kw = out_ch * kh * kw.
        fan_in = self.features * kh * kw

        def kinit(key, shape, dtype=jnp.float32):
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        # The kernel is STORED spatially pre-flipped (round 3): torch's
        # transposed conv correlates with the 180deg-rotated kernel, and
        # flipping at apply time cost a per-step HLO reverse on both the
        # forward and every backward pass (docs/PERF.md round-2 trace,
        # part of the 35 ms elementwise tail).  The .pth importer/exporter
        # (_convT_w/_inv_convT_w) do the flip once at conversion; the init
        # distribution is symmetric so kinit is unchanged.
        kernel = self.param("kernel", kinit, (kh, kw, in_ch, self.features),
                            jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", make_torch_bias_init(fan_in),
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


class Dense(nn.Module):
    """Linear layer with torch-default init; kernel (in, out) fp32."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (in_f, self.features), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", make_torch_bias_init(in_f),
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


class CBINorm(nn.Module):
    """Conditional instance norm — the style-injection op (model.py:12-73).

    out = (IN(x) + tanh(Linear(cond))) * scale + bias     (affine=True)
    out =  IN(x) + tanh(Linear(cond))                     (affine=False)

    cond is the concatenated [one-hot class || style latent] vector.  torch
    _BatchNorm(affine=True) init: weight=1, bias=0 (torch >= 1.2, which the
    reference's torch 1.4 uses).
    """

    features: int
    affine: bool = True
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cond: Array, relu: bool = False) -> Array:
        cb = Dense(self.features, dtype=self.dtype, name="con_bias")(cond)
        t = jnp.tanh(cb.astype(jnp.float32))
        if self.affine:
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        else:
            scale = jnp.ones((self.features,), jnp.float32)
            bias = jnp.zeros((self.features,), jnp.float32)
        if _use_fused_norm(x):
            from srgan_tpu.ops.pallas.norm import fused_cbinorm
            return fused_cbinorm(x.astype(self.dtype), t, scale, bias,
                                 self.eps, relu)
        out = instance_norm(x, self.eps).astype(jnp.float32) \
            + t[:, None, None, :]
        out = out * scale + bias
        if relu:
            out = jnp.maximum(out, 0.0)
        return out.astype(self.dtype)


class CBBNorm(nn.Module):
    """Conditional batch norm variant (model.py:75-171): batch-norm the input,
    subtract its per-(sample, channel) spatial average, add the conditional
    bias.  Selectable via norm_type="batch" but unused by the shipped configs.

    Running stats live in the "batch_stats" collection; pass
    ``use_running_average=True`` for eval.  torch init: weight ~ U(0,1)
    (model.py:115), bias = 0.
    """

    features: int
    affine: bool = True
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cond: Array,
                 use_running_average: bool = False) -> Array:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.var(x32, axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        bias_sor = jnp.mean(out, axis=(1, 2), keepdims=True)
        cb = Dense(self.features, dtype=self.dtype, name="con_bias")(cond)
        bias_tar = jnp.tanh(cb.astype(jnp.float32))[:, None, None, :]
        out = out - bias_sor + bias_tar
        if self.affine:
            scale = self.param("scale",
                               lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d),
                               (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out * scale + bias
        return out.astype(self.dtype)


def get_norm_kind(norm_type: str) -> str:
    """Validate the norm selector (reference get_norm_layer, model.py:173-182)."""
    if norm_type not in ("instance", "batch"):
        raise NotImplementedError(
            f"normalization layer [{norm_type}] is not found")
    return norm_type
