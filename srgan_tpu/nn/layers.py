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

def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """Per-(sample, channel) normalization over H, W.  No affine, no running
    stats — matches ``nn.InstanceNorm2d(affine=False)`` / ``F.instance_norm``
    as used by the reference (model.py:58-60, :178).  Stats in fp32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
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
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    padding_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (kh, kw, in_ch, self.features), jnp.float32)
        if self.padding_mode == "reflect" and (ph or pw):
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
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

        kernel = self.param("kernel", kinit, (kh, kw, in_ch, self.features),
                            jnp.float32)
        flipped = jnp.flip(kernel, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), flipped.astype(self.dtype),
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
    def __call__(self, x: Array, cond: Array) -> Array:
        h = instance_norm(x, self.eps)
        cb = Dense(self.features, dtype=self.dtype, name="con_bias")(cond)
        tar_bias = jnp.tanh(cb.astype(jnp.float32))[:, None, None, :]
        out = h.astype(jnp.float32) + tar_bias
        if self.affine:
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out * scale + bias
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
