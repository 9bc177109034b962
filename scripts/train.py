#!/usr/bin/env python
"""Train any of the five experiment arms (reference notebooks 01/02/03/05).

Examples:
  # full SRGAN on real CelebA
  python scripts/train.py --preset 05_srgan_full \
      --data-root /data/celeba/img --attr-file /data/celeba/list_attr_celeba.txt \
      --classifier-ckpt runs/clf/classifier_best --out runs/srgan

  # smoke run on synthetic data, 2 epochs, tiny batch
  python scripts/train.py --preset 03_srgan_nopretraining --synthetic \
      --batch-size 16 --epochs 2 --unrolled-k 1 --out /tmp/srgan_smoke

  # data-parallel over every local device
  python scripts/train.py --preset 03_srgan_nopretraining --mesh --out runs/dp
"""

import argparse
import dataclasses
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.configs import PRESETS
from srgan_tpu.parallel import make_mesh
from srgan_tpu.training.loop import train_gan


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", required=True, choices=sorted(PRESETS))
    ap.add_argument("--out", required=True)
    ap.add_argument("--data-root")
    ap.add_argument("--attr-file")
    ap.add_argument("--label-root")
    ap.add_argument("--synthetic", action="store_true",
                    help="use a generated synthetic CelebA stand-in")
    ap.add_argument("--synthetic-per-class", type=int, default=16)
    ap.add_argument("--classifier-ckpt",
                    help=".pth or orbax dir of the nb04 classifier")
    ap.add_argument("--mesh", action="store_true",
                    help="data-parallel over all local devices")
    ap.add_argument("--grad-sync", choices=("auto", "manual"),
                    default="auto",
                    help="mesh collective mode: GSPMD-derived (auto) or "
                         "shard_map with one pmean per grad tree (manual; "
                         "2.8x less all-reduce volume, docs/PERF.md)")
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--batch-size", type=int)
    ap.add_argument("--unrolled-k", type=int)
    ap.add_argument("--train-num", type=int)
    ap.add_argument("--test-num", type=int)
    ap.add_argument("--compute-dtype", choices=["float32", "bfloat16"])
    ap.add_argument("--seed", type=int,
                    help="training seed (init + shuffling + latents)")
    ap.add_argument("--lr-gamma", type=float,
                    help="ExponentialLR per-epoch decay (default: preset's "
                    "0.95, the reference's value).  At fixture scale "
                    "(200 imgs/class vs the reference's 10,000) each epoch "
                    "is ~12x fewer steps, so 0.95 freezes training by "
                    "~e120; raise toward 0.99 for long small-data runs")
    # model-geometry overrides (persisted in the run's config.json so
    # downstream CLIs rebuild the matching model automatically)
    ap.add_argument("--image-size", type=int)
    ap.add_argument("--g-nch", type=int)
    ap.add_argument("--d-nch", type=int)
    ap.add_argument("--e-nch", type=int)
    ap.add_argument("--g-res-num", type=int)
    ap.add_argument("--d-num-cls", type=int)
    ap.add_argument("--e-num-cls", type=int)
    ap.add_argument("--no-sample-grids", action="store_true")
    ap.add_argument("--grid-every-epochs", type=int, default=1,
                    help="render progress grids only every N epochs "
                    "(default 1 = the reference's ~3x/epoch cadence; "
                    "raise for long evidence runs)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in --out")
    ap.add_argument("--profile-dir", help="write a jax.profiler trace here")
    ap.add_argument("--debug-nans", action="store_true")
    args = ap.parse_args()

    cfg = PRESETS[args.preset]()
    if args.synthetic and args.test_num is None:
        # synthetic fixtures are small; the preset's test_num=100 would
        # swallow the whole dataset (new_train_num = N - val - test)
        args.test_num = 4
    train_over = {k: v for k, v in dict(
        batch_size=args.batch_size, unrolled_k=args.unrolled_k,
        train_num=args.train_num, compute_dtype=args.compute_dtype,
        test_num=args.test_num, seed=args.seed,
        lr_gamma=args.lr_gamma, epochs=args.epochs).items() if v is not None}
    if train_over:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **train_over))
    model_over = {k: v for k, v in dict(
        image_size=args.image_size, g_nch=args.g_nch, d_nch=args.d_nch,
        e_nch=args.e_nch, g_res_num=args.g_res_num,
        d_num_cls=args.d_num_cls, e_num_cls=args.e_num_cls).items()
        if v is not None}
    if model_over:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_over))
    if not (args.synthetic or args.data_root):
        ap.error("pass --data-root/--attr-file (or --label-root), "
                 "or --synthetic")

    mesh = make_mesh() if args.mesh else None
    train_gan(cfg, args.out, data_root=args.data_root,
              attr_file=args.attr_file, label_root=args.label_root,
              mesh=mesh, grad_sync=args.grad_sync, epochs=args.epochs,
              classifier_ckpt=args.classifier_ckpt,
              sample_grids=not args.no_sample_grids,
              grid_every_epochs=args.grid_every_epochs,
              synthetic_per_class=args.synthetic_per_class,
              resume=args.resume, profile_dir=args.profile_dir,
              debug_nans=args.debug_nans)
    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
