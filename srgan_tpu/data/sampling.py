"""Label helpers: class enumeration, one-hot encoding, target sampling.

Capability mirror of reference utilities:
  - get_class_label   dataset.py:11-18
  - class_encode      util.py:205-234
  - get_target        util.py:268-319
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence

import numpy as np


def get_class_label(n_class_type: int):
    """Enumerate +-1 combinations for the chosen class attrs, sorted
    descending — class order [(1,1),(1,-1),(-1,1),(-1,-1)] for two attrs
    (= [male-smiling, male-not, female-smiling, female-not])."""
    combos = set()
    for com in itertools.combinations_with_replacement([-1, 1], n_class_type):
        for per in itertools.permutations(com):
            combos.add(per)
    out = sorted(combos, reverse=True)
    return out


def class_encode(labels, ref_class: np.ndarray) -> np.ndarray:
    """Row-lookup into the reference label matrix (one-hot by default):
    (B,) int -> (B, dim) float32."""
    labels = np.asarray(labels)
    return np.asarray(ref_class, np.float32)[labels].reshape(
        -1, np.asarray(ref_class).shape[1])


def get_target(labels, classes: Sequence[int], whole: bool = False,
               shuffle: bool = True,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Possible target labels per sample.

    whole=False: all classes except the source, per-row shuffled — training
    uses column 0 as the sampled target (nb01 cell 22).
    whole=True: all classes.
    """
    labels = np.asarray(labels)
    n = len(classes)
    if whole:
        target = np.tile(np.arange(n), (labels.shape[0], 1))
    else:
        keep = ~np.eye(n, dtype=bool)[labels]
        target = np.tile(np.arange(n), (labels.shape[0], 1))[keep].reshape(
            -1, n - 1)
    if shuffle:
        rng = rng or np.random.default_rng()
        # per-row independent shuffles (matches the reference's row loop)
        perm = np.argsort(rng.random(target.shape), axis=1)
        target = np.take_along_axis(target, perm, axis=1)
    return target


def get_random_dataset(dataset, num: int, random: bool = True,
                       random_seed: int = 0) -> np.ndarray:
    """Stack ``num`` transformed images from a dataset (util.py:321-334;
    including its quirk of reading items 0..num-1 rather than the sampled
    indices is NOT replicated — we read the sampled indices)."""
    rng = np.random.default_rng(None if random else random_seed)
    index = rng.choice(np.arange(len(dataset)), num, replace=False)
    return np.stack([dataset[int(i)][0] for i in index])
