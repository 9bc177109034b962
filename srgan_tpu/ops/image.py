"""Image/value conversion utilities.

Equivalents of the reference's ``min_max`` / ``MinMax`` / ``image_from_output``
(util.py:108-191).  The *per-image min-max to [-1, 1]* normalization — not a
fixed mean/std — is load-bearing for PRDC parity (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def min_max(x, axis=None, mean0: bool = False, get_param: bool = False):
    """Min-max normalize to [0, 1] (optionally [-1, 1]) — util.py:108-116.

    Works on numpy arrays and jax arrays alike (uses the input's namespace).
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    mn = x.min(axis=axis, keepdims=True)
    mx = x.max(axis=axis, keepdims=True)
    result = (x - mn) / (mx - mn + 1e-8)
    if mean0:
        result = result * 2 - 1
    if get_param:
        return result, mn, mx
    return result


def minmax_transform(img: np.ndarray, mean0: bool = True) -> np.ndarray:
    """The ``MinMax`` dataset transform (util.py:148-155): whole-image min-max
    over all channels/pixels jointly, to [-1, 1]."""
    return np.asarray(min_max(np.asarray(img, np.float32), mean0=mean0), np.float32)


def to_uint8_images(batch_nhwc) -> np.ndarray:
    """Convert a batch of model outputs to displayable uint8 HWC images.

    Mirrors ``image_from_output`` (util.py:157-191): each image is min-maxed
    *again* to [0,1], scaled by 256, clipped at 255.  Grayscale inputs are
    tiled to 3 channels.  Input: (B, H, W, C) float; output (B, H, W, 3) uint8.
    """
    arr = np.asarray(batch_nhwc, np.float32)
    if arr.ndim == 3:
        arr = arr[None]
    out = []
    for a in arr:
        if a.shape[-1] != 3:
            a = np.tile(a, (1, 1, 3 // a.shape[-1]))
        a = np.asarray(min_max(a)) * 2**8
        a = np.clip(a, 0, 255).astype(np.uint8)
        out.append(a)
    return np.stack(out)


def to_pil(img_chw_or_hwc):
    """Single tensor -> PIL image (the ``ToPIL`` transform, util.py:118-146).

    Accepts HWC or CHW float arrays; min-maxes for display like
    ``image_from_output``.
    """
    from PIL import Image

    arr = np.asarray(img_chw_or_hwc)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.transpose(arr, (1, 2, 0))
    return Image.fromarray(to_uint8_images(arr[None])[0])
