#!/usr/bin/env python
"""Pretrain the encoder-classifier (reference notebook 04).

Trains Encoder_classifier on the 4-way facial-attribute task (CE, Adam 1e-4,
ExponentialLR 0.99, val every 3 epochs, best-accuracy retention), saving the
best params for the SRGAN pretrained-encoder stage (nb05).
"""

import argparse
import dataclasses
import os
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from srgan_tpu.configs import ClassifierConfig
from srgan_tpu.data import DataLoader, FaceDataset, make_synthetic_celeba
from srgan_tpu.training.classifier import ClassifierTrainer
from srgan_tpu.utils.checkpoint import save_checkpoint
from srgan_tpu.utils.metrics import MetricLogger


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--data-root")
    ap.add_argument("--attr-file")
    ap.add_argument("--label-root")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--synthetic-per-class", type=int, default=24)
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--batch-size", type=int)
    ap.add_argument("--train-num", type=int)
    ap.add_argument("--val-num", type=int)
    ap.add_argument("--test-num", type=int)
    # model-geometry overrides — must match the encoder geometry of the
    # SRGAN run that will consume this checkpoint (nb05 cell 22 transfer)
    ap.add_argument("--e-nch", type=int)
    ap.add_argument("--e-num-cls", type=int)
    ap.add_argument("--image-size", type=int)
    ap.add_argument("--seed", type=int)
    args = ap.parse_args()

    cfg = ClassifierConfig()
    model_over = {k: v for k, v in dict(
        e_nch=args.e_nch, e_num_cls=args.e_num_cls,
        image_size=args.image_size).items() if v is not None}
    if model_over:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_over))
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    if args.synthetic and args.test_num is None:
        args.test_num = 4   # the preset's test_num=100 would swallow a
                            # small synthetic dataset
    over = {k: v for k, v in dict(epochs=args.epochs,
                                  batch_size=args.batch_size,
                                  train_num=args.train_num,
                                  val_num=args.val_num,
                                  test_num=args.test_num).items()
            if v is not None}
    if over:
        cfg = dataclasses.replace(cfg, **over)

    data_root, attr_file = args.data_root, args.attr_file
    if args.synthetic or not data_root:
        data_root, attr_file = make_synthetic_celeba(
            "/tmp/srgan_tpu_synthetic_clf",
            n_per_class=args.synthetic_per_class)

    common = dict(attr_file=attr_file, label_root=args.label_root,
                  train_num=cfg.train_num, val_num=cfg.val_num,
                  test_num=cfg.test_num, image_size=cfg.model.image_size)
    train_ds = FaceDataset(data_root, data_type="train", **common)
    val_ds = FaceDataset(data_root, data_type="val", **common)
    if len(train_ds) < cfg.batch_size:
        raise SystemExit(
            f"train split has {len(train_ds)} images < batch "
            f"{cfg.batch_size}; check train/val/test_num vs dataset size")

    trainer = ClassifierTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    os.makedirs(args.out, exist_ok=True)
    logger = MetricLogger(os.path.join(args.out, "metrics.jsonl"), echo=True)

    def train_iter():
        dl = DataLoader(train_ds, batch_size=cfg.batch_size, drop_last=True,
                        sample_targets=False, seed=cfg.seed)
        for b in dl:
            yield b["image"], b["source_label"]

    def val_iter():
        dl = DataLoader(val_ds, batch_size=cfg.batch_size, shuffle=False,
                        drop_last=False, sample_targets=False)
        for b in dl:
            yield b["image"], b["source_label"]

    state, best_params, best_acc = trainer.fit(
        state, train_iter, val_iter if len(val_ds) else None,
        log_fn=logger.log)
    best = (best_params if best_params is not None
            else jax.device_get(state.params))
    save_checkpoint(os.path.join(args.out, "classifier_best"), best)
    print(f"best val accuracy: {best_acc:.4f} -> {args.out}/classifier_best")

    # nb04 cells 28-33: test-set accuracy + confusion matrix on the BEST
    # params — the evidence the reference uses to pick/trust the encoder
    test_ds = FaceDataset(data_root, data_type="test", **common)
    if len(test_ds):
        import json

        import numpy as np

        from srgan_tpu.data.dataset import LABEL_DESCRIPTION
        from srgan_tpu.utils.viz import plot_confusion_matrix

        best_state = state.replace(params=jax.device_put(best))
        tl = DataLoader(test_ds, batch_size=cfg.batch_size, shuffle=False,
                        drop_last=False, sample_targets=False)
        labels, preds, test_acc = trainer.evaluate(
            best_state, ((b["image"], b["source_label"]) for b in tl))
        n = cfg.model.n_classes
        cm = np.zeros((n, n), np.int64)
        np.add.at(cm, (labels, preds), 1)
        fig = plot_confusion_matrix(
            cm, [LABEL_DESCRIPTION[i] for i in range(n)],
            title="Encoder classifier (test)",
            save_path=os.path.join(args.out, "confusion_matrix.png"))
        import matplotlib.pyplot as plt
        plt.close(fig)
        with open(os.path.join(args.out, "test_metrics.json"), "w") as f:
            json.dump({"best_val_accuracy": best_acc,
                       "test_accuracy": test_acc,
                       "test_n": int(len(labels)),
                       "confusion_matrix": cm.tolist()}, f, indent=1)
        print(f"test accuracy: {test_acc:.4f} "
              f"(confusion matrix -> {args.out})")


if __name__ == "__main__":
    from srgan_tpu.utils.chiplock import hold_chip
    with hold_chip("pretrain_classifier"):   # bench.py contention guard
        main()
