"""Synthetic CelebA-like fixture: images + attribute file.

Stands in for the real CelebA download (which the reference gets via Google
Drive, notebook A cell 2) in tests, smoke runs, and benchmarks.  Generates
178x218 PNGs whose pixel statistics depend on the class attrs so that
classifiers have signal, plus a ``list_attr_celeba.txt`` with the 40-attr
header CelebA uses.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from PIL import Image

CELEBA_ATTRS = [
    "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive", "Bags_Under_Eyes",
    "Bald", "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
    "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
    "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
    "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes", "No_Beard",
    "Oval_Face", "Pale_Skin", "Pointy_Nose", "Receding_Hairline",
    "Rosy_Cheeks", "Sideburns", "Smiling", "Straight_Hair", "Wavy_Hair",
    "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick",
    "Wearing_Necklace", "Wearing_Necktie", "Young",
]
# 1-based column indices (col 0 = filename): Male=21, Smiling=32, No_Beard=25
MALE_COL, SMILING_COL, NO_BEARD_COL = 21, 32, 25


def make_synthetic_celeba(out_dir: str, n_per_class: int = 10,
                          size: Tuple[int, int] = (178, 218),
                          seed: int = 0,
                          noise_sigma: float = 40.0,
                          smiling_boost: float = 0.0) -> Tuple[str, str]:
    """Returns (image_root, attr_file_path).  Classes cycle through
    (male, smiling) in the reference's class order [( 1,1),(1,-1),(-1,1),
    (-1,-1)].  ``noise_sigma`` sets the per-pixel noise around the
    class-signature mean color (lower = stronger class signal).
    ``smiling_boost`` > 0 strengthens the Smiling axis: +boost on the G
    shift and a -boost/2 B shift, making it a 2-channel signature like the
    Male axis (round-3 evidence knob; 0 = the original fixture)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out_dir, "img")
    os.makedirs(img_dir, exist_ok=True)
    class_sigs = [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    rows = []
    idx = 0
    for cls, (male, smiling) in enumerate(class_sigs):
        for _ in range(n_per_class):
            idx += 1
            name = f"{idx:06d}.jpg"
            # class-dependent mean color + noise => learnable signal
            base = np.array(
                [60 + 60 * (male > 0),
                 80 + (60 + smiling_boost) * (smiling > 0),
                 120 - (smiling_boost / 2) * (smiling > 0)], np.float32)
            arr = np.clip(base + rng.normal(0, noise_sigma, (size[1], size[0], 3)),
                          0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(img_dir, name.replace(".jpg", ".png")))
            attrs = {a: -1 for a in CELEBA_ATTRS}
            attrs["Male"] = male
            attrs["Smiling"] = smiling
            attrs["No_Beard"] = 1      # required by the "existed" filter
            attrs["Young"] = int(rng.choice([-1, 1]))
            rows.append((name, [attrs[a] for a in CELEBA_ATTRS]))

    attr_path = os.path.join(out_dir, "list_attr_celeba.txt")
    with open(attr_path, "w") as f:
        f.write(f"{len(rows)}\n")
        f.write(" ".join(CELEBA_ATTRS) + "\n")
        for name, vals in rows:
            f.write(name + " " + " ".join(f"{v:d}" for v in vals) + "\n")
    return img_dir, attr_path
