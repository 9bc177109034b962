"""PRDC evaluation harness — ``GAN_evaluation`` + ``evaluation_init`` mirror.

Reference: evaluation.py:38-123 and notebook 06.  The harness selects a
feature extractor by name, preprocesses image batches through the exact
reference pipeline (min-max -> PIL 128 -> 224 -> ImageNet normalize), embeds
them in batches of 32, and computes PRDC with nearest_k=5.  Results
accumulate into the reference's nested dict layout
``[fe][source][target][metric] -> list`` so notebook-06-style comparison
tables fall out directly (``comparison_table``).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from srgan_tpu.evaluation.features import (
    init_vgg,
    preprocess_for_vgg,
    vgg_feature_extractor,
)
from srgan_tpu.evaluation.prdc import compute_prdc

METRICS = ("precision", "recall", "density", "coverage")


def evaluation_init(fe_list: Sequence[str], classes: Sequence[int],
                    metrics: Sequence[str] = METRICS) -> Dict:
    """Nested result dict (evaluation.py:112-123)."""
    out = {}
    for fe in fe_list:
        out[fe] = {}
        for s in classes:
            out[fe][s] = {}
            for t in classes:
                out[fe][s][t] = {m: [] for m in metrics}
    return out


class GANEvaluation:
    """Feature-extractor-parameterized PRDC evaluator.

    feature_extractor: "vgg-initialization" (random torchvision-default
    init), "vgg-ImageNet" (supply ``variables`` imported from a torch .pth),
    or "vgg-CelebA" (supply fine-tuned ``variables``; 4-way head).
    """

    def __init__(self, feature_extractor: str = "vgg-initialization",
                 classes: Sequence[int] = (0, 1, 2, 3),
                 variables=None, seed: int = 0):
        self.fe = feature_extractor
        num_classes = len(classes) if "CelebA" in feature_extractor else 1000
        if variables is None:
            if "initialization" not in feature_extractor:
                raise ValueError(
                    f"{feature_extractor} needs imported weights (pass "
                    "variables=, see utils.checkpoint.import_torch_vgg); "
                    "only vgg-initialization can self-initialize offline")
            _, variables = init_vgg(jax.random.PRNGKey(seed),
                                    num_classes=num_classes)
        self._extract = vgg_feature_extractor(variables,
                                              num_classes=num_classes)

    def preprocess(self, images_pm1_nhwc) -> np.ndarray:
        return preprocess_for_vgg(np.asarray(images_pm1_nhwc))

    def get_feature(self, images: np.ndarray, batch: int = 32) -> np.ndarray:
        feats = []
        for start in range(0, len(images), batch):
            x = jnp.asarray(images[start:start + batch])
            feats.append(np.asarray(self._extract(x)))
        return np.concatenate(feats, axis=0)

    def get_prdc(self, true_images, pred_images, nearest_k: int = 5,
                 preprocess: bool = True, batch: int = 32) -> Dict[str, float]:
        if preprocess:
            true_images = self.preprocess(true_images)
            pred_images = self.preprocess(pred_images)
        f1 = self.get_feature(true_images, batch)
        f2 = self.get_feature(pred_images, batch)
        if f1.shape[1] == 0:
            return {m: None for m in METRICS}
        return compute_prdc(f1, f2, nearest_k=nearest_k)


def comparison_table(gan_eval: Dict, fe: str, metric: str,
                     classes: Sequence[int] = (0, 1, 2, 3)) -> np.ndarray:
    """(source x target) mean-metric matrix — the notebook-06 cell-10 table."""
    return np.array([[np.mean(gan_eval[fe][s][t][metric])
                      for t in classes] for s in classes])
