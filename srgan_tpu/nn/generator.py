"""SingleGAN encoder–decoder generator with conditional-IN style injection.

Capability mirror of the reference ``SingleGenerator`` (model.py:203-249):
7x7 stem + ``num_cls`` stride-``reduce`` downsampling convs (each followed by
conditional norm + ReLU) -> ``res_num`` residual blocks -> mirrored transposed
convs with *unconditional* norm -> 7x7 conv -> tanh.  The conditioning vector
``c`` = [one-hot class || style latent] enters every down conv and res block.

Shipped config (nb01 cell 13): nch=64, reduce=2, num_cls=2, res_num=6,
num_con=12 -> channels 64 -> 128 -> 256 at 32x32 for 128px inputs.

TPU-native: NHWC, fp32 params / configurable compute dtype, purely functional.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from srgan_tpu.nn.layers import (
    CBBNorm,
    CBINorm,
    Conv2d,
    ConvTranspose2d,
    get_norm_kind,
    instance_norm,
)


class SingleResidualBlock(nn.Module):
    """2x(3x3 conv -> conditional norm) with ReLU and residual add
    (model.py:188-201)."""

    nch: int
    norm_type: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, train: bool = True):
        def cnorm(name, h, relu=False):
            if self.norm_type == "batch":
                out = CBBNorm(self.nch, dtype=self.dtype, name=name)(
                    h, c, use_running_average=not train)
                return nn.relu(out) if relu else out
            # relu fused into the Pallas norm kernel on TPU
            return CBINorm(self.nch, dtype=self.dtype, name=name)(h, c,
                                                                  relu=relu)

        res = x
        h = Conv2d(self.nch, 3, 1, 1, use_bias=False, dtype=self.dtype,
                   name="c1")(x)
        h = cnorm("cn1", h, relu=True)
        h = Conv2d(self.nch, 3, 1, 1, use_bias=False, dtype=self.dtype,
                   name="c2")(h)
        h = cnorm("cn2", h)
        return h + res


class SingleGenerator(nn.Module):
    nch_in: int = 3
    nch: int = 64
    reduce: int = 2
    num_cls: int = 2
    res_num: int = 6
    norm_type: str = "instance"
    num_con: int = 12
    nch_out: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, train: bool = True):
        """x: (B, H, W, nch_in) in [-1, 1];  c: (B, num_con).  Returns tanh
        output (B, H, W, nch_out) in fp32."""
        get_norm_kind(self.norm_type)
        nch_out = self.nch_out if self.nch_out is not None else self.nch_in
        k = 2 * self.reduce
        p = self.reduce // 2

        def cnorm(feats, name, h, relu=False):
            if self.norm_type == "batch":
                out = CBBNorm(feats, dtype=self.dtype, name=name)(
                    h, c, use_running_average=not train)
                return nn.relu(out) if relu else out
            return CBINorm(feats, dtype=self.dtype, name=name)(h, c,
                                                               relu=relu)

        def unorm(feats, name, h, relu=False):
            if self.norm_type == "batch":
                out = nn.BatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5,
                                   dtype=self.dtype, name=name)(h)
                return nn.relu(out) if relu else out
            return instance_norm(h, relu=relu)

        # --- down path (model.py:212-218, forward :237-240)
        h = Conv2d(self.nch, 7, 1, 3, use_bias=False, dtype=self.dtype,
                   name="down_conv_0")(x)
        h = cnorm(self.nch, "down_cnorm_0", h, relu=True)
        for i in range(self.num_cls):
            feats = self.nch * 2 ** (i + 1)
            h = Conv2d(feats, k, self.reduce, p, use_bias=False,
                       dtype=self.dtype, name=f"down_conv_{i + 1}")(h)
            h = cnorm(feats, f"down_cnorm_{i + 1}", h, relu=True)

        # --- residual trunk (model.py:221-224)
        for i in range(self.res_num):
            h = SingleResidualBlock(self.nch * 2 ** self.num_cls,
                                    self.norm_type, dtype=self.dtype,
                                    name=f"res_{i}")(h, c, train)

        # --- up path with unconditional norm (model.py:227-234, :243-246)
        for j, i in enumerate(range(self.num_cls, 0, -1)):
            feats = self.nch * 2 ** (i - 1)
            h = ConvTranspose2d(feats, k, self.reduce, p, use_bias=False,
                                dtype=self.dtype, name=f"up_conv_{j}")(h)
            h = unorm(feats, f"up_norm_{j}", h, relu=True)
        h = Conv2d(nch_out, 7, 1, 3, use_bias=False, dtype=self.dtype,
                   name="up_conv_out")(h)
        return jnp.tanh(h.astype(jnp.float32))
