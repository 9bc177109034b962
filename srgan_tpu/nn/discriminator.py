"""PatchGAN discriminators — per-domain and solo (StarGAN-style) families.

Capability mirror of reference model.py:255-346:
  - SingleDiscriminatorOriginal        (:255-279) per-domain, single scale
  - SingleDiscriminatorOriginalMulti   (:281-292) two scales (full + avg-pooled)
  - SingleDiscriminatorSolo            (:294-316) trunk only (features exposed)
  - SingleDiscriminatorSoloMulti       (:318-346) two-scale trunk + per-scale
    real/fake head and domain-classification head (softmax over classes)

The per-domain family is used stacked (one per domain) — see
``srgan_tpu.training.singlegan`` which vmaps over a stacked param pytree
instead of keeping a Python list of modules.

LeakyReLU slope is torch's default 0.01 (``nn.LeakyReLU()``, model.py:263).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from srgan_tpu.nn.layers import Conv2d, avg_pool2d


class SingleDiscriminatorOriginal(nn.Module):
    nch_in: int = 3
    nch: int = 64
    reduce: int = 2
    num_cls: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = 2 * self.reduce
        p = self.reduce // 2
        h = Conv2d(self.nch, 4, 2, 1, use_bias=False, dtype=self.dtype,
                   name="conv_0")(x)
        h = jax.nn.leaky_relu(h, 0.01)
        dim_in = self.nch
        for i in range(1, self.num_cls):
            dim_out = min(dim_in * 2, self.nch * 8)
            h = Conv2d(dim_out, k, self.reduce, p, use_bias=False,
                       dtype=self.dtype, name=f"conv_{i}")(h)
            h = jax.nn.leaky_relu(h, 0.01)
            dim_in = dim_out
        return Conv2d(1, 4, 1, 1, use_bias=True, dtype=self.dtype,
                      name="conv_out")(h)


class SingleDiscriminatorOriginalMulti(nn.Module):
    """Full-res + half-res (AvgPool2d(3, 2, 1, count_include_pad=False))
    pair; returns [out1, out2]."""

    nch_in: int = 3
    nch: int = 64
    reduce: int = 2
    num_cls: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out1 = SingleDiscriminatorOriginal(
            self.nch_in, self.nch, self.reduce, self.num_cls,
            dtype=self.dtype, name="discriminator1")(x)
        down = avg_pool2d(x, 3, 2, 1, count_include_pad=False)
        out2 = SingleDiscriminatorOriginal(
            self.nch_in, self.nch // 2, self.reduce, self.num_cls,
            dtype=self.dtype, name="discriminator2")(down)
        return [out1, out2]


class SingleDiscriminatorSolo(nn.Module):
    """The solo trunk: same convs, no final 1-channel head."""

    nch_in: int = 3
    nch: int = 64
    reduce: int = 2
    num_cls: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = 2 * self.reduce
        p = self.reduce // 2
        h = Conv2d(self.nch, 4, 2, 1, use_bias=False, dtype=self.dtype,
                   name="conv_0")(x)
        h = jax.nn.leaky_relu(h, 0.01)
        dim_in = self.nch
        for i in range(1, self.num_cls):
            dim_out = min(dim_in * 2, self.nch * 8)
            h = Conv2d(dim_out, k, self.reduce, p, use_bias=False,
                       dtype=self.dtype, name=f"conv_{i}")(h)
            h = jax.nn.leaky_relu(h, 0.01)
            dim_in = dim_out
        return h


class SingleDiscriminatorSoloMulti(nn.Module):
    """StarGAN-style single D for all domains (model.py:318-346).

    Returns ([adv1, adv2], [cls1, cls2]) where adv* are patch maps and cls*
    are (B, n_class) softmax class predictions.  The classification convs use
    kernel 8 / 4 sized to the trunk's output maps for 128px inputs (model.py:
    330-331); pass ``cls_kernels`` for other input sizes.
    """

    nch_in: int = 3
    nch: int = 64
    reduce: int = 2
    num_cls: int = 4
    n_class: int = 4
    cls_kernels: tuple = (8, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h1 = SingleDiscriminatorSolo(
            self.nch_in, self.nch, self.reduce, self.num_cls,
            dtype=self.dtype, name="discriminator1")(x)
        down = avg_pool2d(x, 3, 2, 1, count_include_pad=False)
        h2 = SingleDiscriminatorSolo(
            self.nch_in, self.nch // 2, self.reduce, self.num_cls,
            dtype=self.dtype, name="discriminator2")(down)

        adv1 = Conv2d(1, 4, 1, 1, use_bias=True, dtype=self.dtype,
                      name="last_layer1")(h1)
        adv2 = Conv2d(1, 4, 1, 1, use_bias=True, dtype=self.dtype,
                      name="last_layer2")(h2)
        c1 = Conv2d(self.n_class, self.cls_kernels[0], 1, 0, use_bias=True,
                    dtype=self.dtype, name="classification_layer1")(h1)
        c2 = Conv2d(self.n_class, self.cls_kernels[1], 1, 0, use_bias=True,
                    dtype=self.dtype, name="classification_layer2")(h2)
        # nn.Softmax() on a (B, C, 1, 1) tensor softmaxes over the class dim
        cls1 = jax.nn.softmax(c1.astype(jnp.float32), axis=-1).reshape(
            -1, self.n_class)
        cls2 = jax.nn.softmax(c2.astype(jnp.float32), axis=-1).reshape(
            -1, self.n_class)
        return [adv1, adv2], [cls1, cls2]
