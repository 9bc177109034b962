#!/usr/bin/env python
"""Render training loss curves from a run's metrics.jsonl.

The reference shows loss curves live in the notebook (nb01 cell 22: one
panel with Discriminator/Generator/Encoder lines, redrawn 3x per epoch);
our training loop persists the same series to metrics.jsonl, and this CLI
turns any run's log into the equivalent committed figure.

  python scripts/plot_losses.py --metrics runs/cap03/metrics.jsonl \
      --out docs/evidence/cap03_losses.png
"""

import argparse
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.utils.viz import plot_loss_curves


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--metrics", required=True,
                    help="metrics.jsonl written by a training run")
    ap.add_argument("--out", required=True, help="output PNG path")
    ap.add_argument("--x-key", default="step",
                    help="x axis field (default: step)")
    ap.add_argument("--keys", nargs="+", default=["errD", "errG", "errE"],
                    help="model-loss fields for the left panel")
    args = ap.parse_args()

    plot_loss_curves(args.metrics, model_keys=tuple(args.keys),
                     x_key=args.x_key, save_path=args.out)
    print(f"loss curves -> {args.out}")


if __name__ == "__main__":
    main()
