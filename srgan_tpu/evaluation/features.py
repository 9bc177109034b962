"""VGG19-BN feature extractor for PRDC evaluation (+ fine-tunable).

Capability mirror of reference ``vgg_model`` (evaluation.py:13-36): the
feature path is features -> avgpool(7x7) -> classifier[:6] (ends after the
second 4096-unit Linear+ReLU+Dropout; eval mode, so dropout is identity) —
a 4096-d embedding.  The score path runs the full classifier.

Three extractor variants (evaluation.py:38-63):
  - "vgg-initialization": torchvision-default random init (the reference's
    ``weights_init`` is a no-op, quirk ledger #1): kaiming_normal(fan_out)
    convs, BN gamma=1/beta=0, Linear ~ N(0, 0.01)
  - "vgg-ImageNet": pretrained — load via the .pth importer
    (srgan_tpu.utils.checkpoint.import_torch_vgg); no network egress here,
    so weights must be supplied as a file
  - "vgg-CelebA": 4-way-head fine-tune — see training/vgg_finetune.py (the
    missing notebook B's job) + the same importer for shipped checkpoints
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# torchvision vgg19 config "E"; M = 2x2 max pool
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    # shape HWIO; fan_out = kh * kw * out
    fan_out = shape[0] * shape[1] * shape[3]
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


def _linear_001(key, shape, dtype=jnp.float32):
    return 0.01 * jax.random.normal(key, shape, dtype)


class VGG19BN(nn.Module):
    """NHWC VGG19 with batch norm; eval-mode only (running stats)."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, output: str = "feature", train: bool = False):
        conv_i = 0
        for v in VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(v, (3, 3), padding=1, use_bias=True,
                        kernel_init=_kaiming_normal_fan_out,
                        bias_init=nn.initializers.zeros,
                        dtype=self.dtype, name=f"conv_{conv_i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, dtype=self.dtype,
                             name=f"bn_{conv_i}")(x)
            x = nn.relu(x)
            conv_i += 1
        # AdaptiveAvgPool2d(7): 224px input -> 7x7 already; average pools
        # windows of size H//7
        h = x.shape[1]
        if h != 7:
            win = h // 7
            x = nn.avg_pool(x, (win, win), strides=(win, win))
        # torch flatten order is CHW; transpose so imported fc weights match
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.Dense(4096, kernel_init=_linear_001,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(4096, kernel_init=_linear_001,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.relu(x)
        feature = x          # classifier[:6] output (dropout = identity)
        if output == "feature":
            return feature
        logits = nn.Dense(self.num_classes, kernel_init=_linear_001,
                          bias_init=nn.initializers.zeros, dtype=self.dtype,
                          name="fc2")(feature)
        return logits


def vgg_feature_extractor(variables, dtype=jnp.float32, num_classes=1000):
    """Returns a jitted (images_nhwc_normalized) -> (B, 4096) function.

    Weights are passed as jit arguments, NOT closure-captured: captured
    params become embedded HLO constants (a ~0.5 GB program upload that the
    remote-compile path rejects).
    """
    model = VGG19BN(num_classes=num_classes, dtype=dtype)
    jit_apply = jax.jit(
        lambda v, x: model.apply(v, x, output="feature"))

    def extract(x):
        return jit_apply(variables, x)

    return extract


def init_vgg(rng, num_classes: int = 1000, image_size: int = 224,
             dtype=jnp.float32):
    model = VGG19BN(num_classes=num_classes, dtype=dtype)
    variables = jax.jit(model.init, static_argnames=("output",))(
        rng, jnp.zeros((1, image_size, image_size, 3)), output="score")
    return model, variables


def preprocess_for_vgg(images_pm1_nhwc: np.ndarray) -> np.ndarray:
    """The reference's eval preprocessing (evaluation.py:65-83):
    per-image min-max -> uint8 -> PIL resize to 128 then 224 (bilinear) ->
    [0,1] -> ImageNet normalize.  Host-side (PIL parity matters for PRDC)."""
    from PIL import Image

    from srgan_tpu.ops.image import to_uint8_images

    u8 = to_uint8_images(images_pm1_nhwc)
    out = []
    for img in u8:
        pil = Image.fromarray(img)
        pil = pil.resize((128, 128), Image.BILINEAR)
        pil = pil.resize((224, 224), Image.BILINEAR)
        arr = np.asarray(pil, np.float32) / 255.0
        out.append((arr - IMAGENET_MEAN) / IMAGENET_STD)
    return np.stack(out)
