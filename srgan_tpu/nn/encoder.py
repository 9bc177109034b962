"""Style encoders — conditional VAE encoder, SRGAN encoder, classifier twin.

Capability mirror of reference model.py:352-508:
  - BasicBlock              (:352-376) conditional pre-activation residual block
  - EncoderOriginal         (:378-411) SingleGAN VAE-style encoder (takes class)
  - BasicBlockClassification(:413-437) unconditional block
  - Encoder                 (:439-482) SRGAN encoder: unconditional trunk,
                             fcmean/fcvar/fcclass heads
  - EncoderClassifier       (:484-508) trunk + softmax class head only; its
                             params transfer into Encoder for nb05 pretraining

Reparametrization draws eps from the "reparam" PRNG stream:
``model.apply(vars, x, rngs={"reparam": key})``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from srgan_tpu.nn.layers import (
    CBBNorm,
    CBINorm,
    Conv2d,
    Dense,
    adaptive_avg_pool,
    avg_pool2d,
    instance_norm,
)


class BasicBlock(nn.Module):
    """Conditional pre-activation residual block with AvgPool2 downsampling."""

    nch_in: int
    nch_out: int
    norm_type: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, d, train: bool = True):
        def cnorm(name, h):
            if self.norm_type == "batch":
                return CBBNorm(self.nch_in, dtype=self.dtype, name=name)(
                    h, d, use_running_average=not train)
            return CBINorm(self.nch_in, dtype=self.dtype, name=name)(h, d)

        h = cnorm("cnorm1", x)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv2d(self.nch_in, 3, 1, 1, use_bias=False,
                   padding_mode="reflect", dtype=self.dtype, name="conv1")(h)
        h = cnorm("cnorm2", h)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv2d(self.nch_out, 3, 1, 1, use_bias=False,
                   padding_mode="reflect", dtype=self.dtype, name="cmp_conv")(h)
        h = avg_pool2d(h, 2, 2)
        sc = avg_pool2d(x, 2, 2)
        sc = Conv2d(self.nch_out, 1, 1, 0, use_bias=True, dtype=self.dtype,
                    name="shortcut_conv")(sc)
        return h + sc


class BasicBlockClassification(nn.Module):
    """Unconditional variant: plain instance (or batch) norm, no class
    input.  Batch mode mirrors the reference's ``norm_layer = BatchNorm2d``
    selection (model.py:173-182 + :414)."""

    nch_in: int
    nch_out: int
    norm_type: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def norm(name, h):
            if self.norm_type == "batch":
                return nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype, name=name)(h)
            return instance_norm(h)

        h = norm("norm1", x)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv2d(self.nch_in, 3, 1, 1, use_bias=False,
                   padding_mode="reflect", dtype=self.dtype, name="conv1")(h)
        h = norm("norm2", h)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv2d(self.nch_out, 3, 1, 1, use_bias=False,
                   padding_mode="reflect", dtype=self.dtype, name="cmp_conv")(h)
        h = avg_pool2d(h, 2, 2)
        sc = avg_pool2d(x, 2, 2)
        sc = Conv2d(self.nch_out, 1, 1, 0, use_bias=True, dtype=self.dtype,
                    name="shortcut_conv")(sc)
        return h + sc


def _reparametrize(module: nn.Module, mu, logvar, sample: bool):
    """eps * exp(logvar / 2) + mu (model.py:398-402)."""
    if not sample:
        return mu
    eps = jax.random.normal(module.make_rng("reparam"), mu.shape, jnp.float32)
    return eps * jnp.exp(0.5 * logvar.astype(jnp.float32)) + mu


class EncoderOriginal(nn.Module):
    """SingleGAN conditional VAE encoder: (image, class one-hot) ->
    (c_code, mu, logvar)."""

    nch_in: int = 3
    nch_out: int = 8
    nch: int = 64
    num_cls: int = 4
    norm_type: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, sample: bool = True, train: bool = True):
        h = Conv2d(self.nch, 7, 2, 1, use_bias=True, dtype=self.dtype,
                   name="first_layer")(x)
        in_nch = self.nch
        for i in range(self.num_cls):
            out_nch = in_nch * 2
            h = BasicBlock(in_nch, out_nch, norm_type=self.norm_type,
                           dtype=self.dtype, name=f"layers_{i}")(h, c, train)
            in_nch = out_nch
        h = jax.nn.leaky_relu(h, 0.2)
        feat = adaptive_avg_pool(h).astype(jnp.float32)
        mu = Dense(self.nch_out, name="fcmean")(feat)
        logvar = Dense(self.nch_out, name="fcvar")(feat)
        c_code = _reparametrize(self, mu, logvar, sample)
        return c_code, mu, logvar


class Encoder(nn.Module):
    """SRGAN encoder: unconditional trunk, VAE + class heads.

    Returns (c_code, mu, logvar, class_output, None) — the trailing None
    mirrors the reference's removed-attention slot (model.py:482).
    """

    nch_in: int = 3
    nch_out: int = 8
    nch: int = 64
    num_cls: int = 4
    # fcclass width = number of domain classes (model.py:457 with
    # num_con=ref_label.shape[1]=4, nb03/05 cell 20)
    num_con: int = 4
    norm_type: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, sample: bool = True, train: bool = True):
        h = Conv2d(self.nch, 7, 2, 1, use_bias=True, dtype=self.dtype,
                   name="first_layer")(x)
        in_nch = self.nch
        for i in range(self.num_cls):
            out_nch = in_nch * 2
            h = BasicBlockClassification(in_nch, out_nch,
                                         norm_type=self.norm_type,
                                         dtype=self.dtype,
                                         name=f"layers_{i}")(h, train)
            in_nch = out_nch
        h = jax.nn.leaky_relu(h, 0.2)
        feat = adaptive_avg_pool(h).astype(jnp.float32)
        mu = Dense(self.nch_out, name="fcmean")(feat)
        logvar = Dense(self.nch_out, name="fcvar")(feat)
        class_output = Dense(self.num_con, name="fcclass")(feat)
        c_code = _reparametrize(self, mu, logvar, sample)
        return c_code, mu, logvar, class_output, None


class EncoderClassifier(nn.Module):
    """Pretraining twin: trunk + fcclass + softmax (model.py:484-508).

    Parameter names match ``Encoder`` so its trained params transfer
    directly (the strict=False load in the reference, util.py:236-266).
    """

    nch_in: int = 3
    nch_out: int = 8
    nch: int = 64
    num_cls: int = 4
    num_con: int = 4
    norm_type: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv2d(self.nch, 7, 2, 1, use_bias=True, dtype=self.dtype,
                   name="first_layer")(x)
        in_nch = self.nch
        for i in range(self.num_cls):
            out_nch = in_nch * 2
            h = BasicBlockClassification(in_nch, out_nch,
                                         norm_type=self.norm_type,
                                         dtype=self.dtype,
                                         name=f"layers_{i}")(h, train)
            in_nch = out_nch
        h = jax.nn.leaky_relu(h, 0.2)
        feat = adaptive_avg_pool(h).astype(jnp.float32)
        logits = Dense(self.num_con, name="fcclass")(feat)
        return jax.nn.softmax(logits, axis=-1)
