#!/usr/bin/env python
"""Fine-tune VGG19-BN on the 4 CelebA classes (the missing notebook B).

Produces the "vgg-CelebA" feature extractor for PRDC.  lr 5e-5 matches the
shipped checkpoint's filename (facial_recognizer_vgg_lr5e-05_epoch126.pth).
Start from random init or --imagenet-pth (torchvision weights file).
"""

import argparse
import os
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from srgan_tpu.data import DataLoader, FaceDataset, make_synthetic_celeba
from srgan_tpu.training.vgg_finetune import VGGFinetuneTrainer
from srgan_tpu.utils.checkpoint import (
    import_torch_vgg,
    load_torch_state_dict,
    save_checkpoint,
)
from srgan_tpu.utils.metrics import MetricLogger


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--data-root")
    ap.add_argument("--attr-file")
    ap.add_argument("--label-root")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--imagenet-pth")
    ap.add_argument("--epochs", type=int, default=127)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--train-num", type=int, default=10000)
    ap.add_argument("--val-num", type=int, default=1000)
    ap.add_argument("--val-every", type=int, default=3)
    args = ap.parse_args()

    data_root, attr_file = args.data_root, args.attr_file
    if args.synthetic or not data_root:
        data_root, attr_file = make_synthetic_celeba(
            "/tmp/srgan_tpu_synthetic_vgg", n_per_class=24)
    common = dict(attr_file=attr_file, label_root=args.label_root,
                  train_num=args.train_num, val_num=args.val_num,
                  test_num=100)
    train_ds = FaceDataset(data_root, data_type="train", **common)
    val_ds = FaceDataset(data_root, data_type="val", **common)

    trainer = VGGFinetuneTrainer(n_classes=4, lr=args.lr)
    pretrained = None
    if args.imagenet_pth:
        from srgan_tpu.evaluation.features import init_vgg
        pretrained = import_torch_vgg(load_torch_state_dict(args.imagenet_pth))
        # replace the 1000-way head with a fresh 4-way one (evaluation.py:56)
        _, fresh = init_vgg(jax.random.PRNGKey(0), num_classes=4)
        pretrained["params"]["fc2"] = fresh["params"]["fc2"]
    state = trainer.init_state(jax.random.PRNGKey(0), pretrained)

    os.makedirs(args.out, exist_ok=True)
    logger = MetricLogger(os.path.join(args.out, "metrics.jsonl"), echo=True)
    best_acc, best_vars = -1.0, None
    for epoch in range(args.epochs):
        dl = DataLoader(train_ds, batch_size=args.batch_size, drop_last=True,
                        sample_targets=False, seed=epoch)
        for b in dl:
            state, m = trainer.step(state, b["image"], b["source_label"])
        if len(val_ds) and epoch % args.val_every == 0:
            vl = DataLoader(val_ds, batch_size=args.batch_size, shuffle=False,
                            drop_last=False, sample_targets=False)
            acc = trainer.evaluate(state, ((b["image"], b["source_label"])
                                           for b in vl))
            logger.log({"epoch": epoch, "val_accuracy": acc,
                        **{k: float(v) for k, v in m.items()}})
            if acc > best_acc:
                best_acc = acc
                best_vars = jax.device_get(trainer.variables(state))
    save_checkpoint(os.path.join(args.out, "vgg_celeba_best"),
                    best_vars if best_vars is not None
                    else jax.device_get(trainer.variables(state)))
    print(f"best val accuracy {best_acc:.4f} -> {args.out}/vgg_celeba_best")


if __name__ == "__main__":
    from srgan_tpu.utils.chiplock import hold_chip
    with hold_chip("finetune_vgg"):   # bench.py contention guard
        main()
