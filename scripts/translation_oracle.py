#!/usr/bin/env python
"""Distribution-level translation metric on the synthetic fixture.

The synthetic CelebA stand-in encodes each of the 4 (Male x Smiling)
classes as a mean-color signature (data/synthetic.py).  An oracle
classifier — nearest class-signature channel mean, fit on REAL images —
then scores translated fakes by whether they land in the *target* class.
This is the committed round-2/3 training-evidence metric
(docs/TRAINING_EVIDENCE.md): fixture-appropriate where PRDC is not
(random-VGG features measure noise texture on this fixture).

Writes a summary JSON in the docs/evidence/summary_e*.json format:
per-(source->target) oracle accuracy for the trained checkpoint vs a
fresh-init model of the same config.
"""

import argparse
import json
import os
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from srgan_tpu.configs import PRESETS, load_config_for_ckpt
from srgan_tpu.data import FaceDataset
from srgan_tpu.training import GANTrainer
from srgan_tpu.utils.checkpoint import restore_checkpoint


def class_means(images_by_class):
    return {c: np.asarray(imgs).mean(axis=(0, 1, 2))
            for c, imgs in images_by_class.items()}


def oracle_classify(images, sigs):
    """Nearest class-signature channel mean (L2)."""
    means = np.asarray(images).mean(axis=(1, 2))            # (N, 3)
    keys = sorted(sigs)
    d = np.stack([np.linalg.norm(means - sigs[c][None], axis=1)
                  for c in keys], axis=1)
    return np.array(keys)[np.argmin(d, axis=1)]


def pair_accuracies(trainer, state, by_class, sigs, rng, n_latents=1):
    pairs = {}
    total, hits = 0, 0
    for s in sorted(by_class):
        src = by_class[s]
        for t in sorted(by_class):
            if t == s:
                continue
            rng, sub = jax.random.split(rng)
            fake, _ = trainer.transform(state, src,
                                        np.full(len(src), t), rng=sub)
            pred = oracle_classify(np.asarray(fake), sigs)
            acc = float((pred == t).mean())
            pairs[f"{s}->{t}"] = round(acc, 3)
            total += len(src)
            hits += int((pred == t).sum())
    return pairs, hits / total


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS))
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--ckpt-step", type=int)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--attr-file", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--test-num", type=int, default=16)
    args = ap.parse_args()

    cfg = load_config_for_ckpt(args.ckpt, args.preset)
    test_ds = FaceDataset(args.data_root, attr_file=args.attr_file,
                          data_type="test", train_num=cfg.train.train_num,
                          val_num=0, test_num=args.test_num,
                          image_size=cfg.model.image_size)
    classes = tuple(range(cfg.model.n_classes))
    by_class = {c: np.stack([test_ds[i][0] for i in range(len(test_ds))
                             if test_ds.labels[i] == c]) for c in classes}
    sigs = class_means(by_class)

    # oracle sanity: it must be perfect on real images
    real_hits = real_total = 0
    for c in classes:
        pred = oracle_classify(by_class[c], sigs)
        real_hits += int((pred == c).sum())
        real_total += len(pred)

    trainer = GANTrainer(cfg)
    init_state = trainer.init_state(
        jax.random.PRNGKey(0), freeze_pretrained=cfg.pretrained_encoder)
    target = jax.device_get(init_state)
    state = restore_checkpoint(args.ckpt, target, step=args.ckpt_step)

    rng = jax.random.PRNGKey(0)
    init_pairs, init_acc = pair_accuracies(trainer, init_state, by_class,
                                           sigs, rng)
    trained_pairs, trained_acc = pair_accuracies(trainer, state, by_class,
                                                 sigs, rng)

    def perfect(pairs):
        return sum(v == 1.0 for v in pairs.values())

    summary = {
        "real_acc": real_hits / real_total,
        "init": {"acc": init_acc, "perfect_pairs": perfect(init_pairs),
                 "pairs": init_pairs},
        "trained": {"acc": trained_acc,
                    "perfect_pairs": perfect(trained_pairs),
                    "pairs": trained_pairs},
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".",
                exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
