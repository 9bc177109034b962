#!/usr/bin/env python
"""Host input-pipeline benchmark: native C++ loader vs PIL.

Measures end-to-end batch production (decode + center-crop 178 + resize 128
+ flip + per-image min-max) over the synthetic CelebA fixture and writes
``docs/BENCH_LOADER.json`` — the recorded artifact behind docs/PERF.md's
host-pipeline numbers.
"""

import argparse
import json
import os
import sys
import time

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.data import DataLoader, FaceDataset, make_synthetic_celeba


def run(loader, epochs):
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += batch["image"].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--per-class", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "BENCH_LOADER.json"))
    args = ap.parse_args()

    root, attrs = make_synthetic_celeba("/tmp/srgan_loader_bench",
                                        n_per_class=args.per_class)
    ds = FaceDataset(root, attr_file=attrs, data_type="train",
                     train_num=args.per_class, val_num=0, test_num=1)

    results = {"n_images": len(ds), "batch_size": args.batch_size,
               "epochs": args.epochs}
    for use_native in (False, True):
        dl = DataLoader(ds, batch_size=args.batch_size, drop_last=True,
                        seed=0, use_native=use_native)
        label = "native" if dl.use_native else "pil"
        if use_native and not dl.use_native:
            results["native"] = None
            print("native loader unavailable (build failed?)")
            continue
        run(dl, 1)  # warm (file cache, lazy init)
        rate = run(dl, args.epochs)
        results[label] = round(rate, 1)
        print(f"{label}: {rate:.1f} img/s")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
