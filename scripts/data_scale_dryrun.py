#!/usr/bin/env python
"""Reference-scale ingest dry run: the full 202,599-row CelebA data path.

The evidence runs train on 200-image fixtures; this proves the ingest path
at the REAL dataset scale the reference uses (dataset.py:20-141 with
train_num=10,000 per class, notebook A cell 5's chunked label folder):

  1. synthesize a 202,599-row ``list_attr_celeba.txt`` (realistic attribute
     marginals, no pixels),
  2. time ``parse_attr_file`` + ``build_label_folder`` (41 chunk pickles)
     + ``load_label_store`` — the notebook-A path,
  3. build train/val/test ``FaceDataset`` splits at the reference's scale
     (train_num=10,000, val_num=500, test_num=500 per class), check sizes,
     disjointness, and class-major ordering,
  4. hardlink a small pool of real 178x218 PNGs over every selected path
     and measure decode->crop->resize->minmax throughput through the
     ``DataLoader`` for both the native C++ path and the PIL fallback.

Writes one JSON (--out) with every timing/throughput plus host context
(cpu count, load average) so contended numbers are identifiable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

try:
    import srgan_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.data import (DataLoader, FaceDataset, build_label_folder,
                            load_label_store, make_scale_attr_file,
                            make_synthetic_celeba, parse_attr_file)

TRAIN_NUM, VAL_NUM, TEST_NUM = 10_000, 500, 500   # the reference's nb01 scale


def _timed(fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    return out, time.perf_counter() - t0


def _loader_throughput(ds, batch_size: int, n_batches: int, workers: int,
                       use_native: bool) -> dict:
    loader = DataLoader(ds, batch_size=batch_size, shuffle=True,
                        num_workers=workers, use_native=use_native, seed=0)
    it = iter(loader)
    first = next(it)                       # warm-up (thread pool, lib load)
    assert first["image"].shape == (batch_size, ds.image_size,
                                    ds.image_size, 3)
    n_img, t0 = 0, time.perf_counter()
    for _ in range(n_batches):
        batch = next(it)
        n_img += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    return {"native": bool(loader.use_native), "images": n_img,
            "seconds": round(dt, 3), "img_per_s": round(n_img / dt, 1)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="runs/data_scale")
    ap.add_argument("--out", default="docs/evidence/data_scale_dryrun.json")
    ap.add_argument("--n-rows", type=int, default=202_599)
    ap.add_argument("--pixel-pool", type=int, default=256,
                    help="distinct PNGs; all dataset paths hardlink into it")
    ap.add_argument("--bench-batches", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    report = {"n_rows": args.n_rows, "train_num": TRAIN_NUM,
              "val_num": VAL_NUM, "test_num": TEST_NUM,
              "cpu_count": os.cpu_count(),
              "loadavg_start": os.getloadavg()}

    # -- 1. full-scale attribute file ------------------------------------
    attr_path = os.path.join(args.workdir, "list_attr_celeba.txt")
    _, t = _timed(make_scale_attr_file, attr_path, args.n_rows, 0)
    report["synthesize_attr_s"] = round(t, 2)
    report["attr_file_mb"] = round(os.path.getsize(attr_path) / 2**20, 1)

    # -- 2. notebook-A label-folder build ---------------------------------
    info, t = _timed(parse_attr_file, attr_path)
    report["parse_attr_s"] = round(t, 2)
    assert info.shape == (args.n_rows, 41), info.shape

    label_root = os.path.join(args.workdir, "label_folder")
    chunk_paths, t = _timed(build_label_folder, attr_path, label_root)
    report["build_label_folder_s"] = round(t, 2)
    report["label_chunks"] = len(chunk_paths)       # ceil(202599/5000) = 41

    chunks, t = _timed(load_label_store, label_root)
    report["load_label_store_s"] = round(t, 2)
    assert sum(len(c) for c in chunks) == args.n_rows

    # -- 3. FaceDataset splits at reference scale --------------------------
    img_root = os.path.join(args.workdir, "img")
    os.makedirs(img_root, exist_ok=True)
    splits = {}
    for dtype in ("train", "val", "test"):
        ds, t = _timed(FaceDataset, img_root, label_root=label_root,
                       data_type=dtype, train_num=TRAIN_NUM,
                       val_num=VAL_NUM, test_num=TEST_NUM)
        counts = np.bincount(ds.labels, minlength=4).tolist()
        splits[dtype] = {"init_s": round(t, 2), "size": len(ds),
                         "per_class": counts}
        # class-major ordering (quirk #10): labels must be non-decreasing
        assert (np.diff(ds.labels) >= 0).all(), "not class-major"
        splits[dtype]["_paths"] = set(ds.images)
        splits[dtype]["_ds"] = ds
    # per-class split disjointness + exact sizes
    for dtype, want in (("train", TRAIN_NUM), ("val", VAL_NUM),
                        ("test", TEST_NUM)):
        per = splits[dtype]["per_class"]
        assert all(c == want for c in per), (dtype, per)
    assert not (splits["train"]["_paths"] & splits["val"]["_paths"])
    assert not (splits["train"]["_paths"] & splits["test"]["_paths"])
    assert not (splits["val"]["_paths"] & splits["test"]["_paths"])
    train_ds = splits["train"].pop("_ds")
    all_paths = sorted(set.union(*(s.pop("_paths") for s in splits.values()
                                   )) )
    for s in splits.values():
        s.pop("_ds", None)
    report["splits"] = splits
    report["selected_images"] = len(all_paths)      # 4*(10000+500+500)

    # -- 4. pixel pool + loader throughput --------------------------------
    pool_dir, t = _timed(make_synthetic_celeba,
                         os.path.join(args.workdir, "pool"),
                         args.pixel_pool // 4, seed=1, mode="structured")
    pool_pngs = sorted(os.path.join(pool_dir[0], f)
                       for f in os.listdir(pool_dir[0]))
    report["pixel_pool"] = {"distinct": len(pool_pngs),
                            "generate_s": round(t, 2)}

    t0 = time.perf_counter()
    for i, path in enumerate(all_paths):
        os.link(pool_pngs[i % len(pool_pngs)], path)
    report["hardlink_s"] = round(time.perf_counter() - t0, 2)

    bench = {}
    bench["native"] = _loader_throughput(
        train_ds, args.batch_size, args.bench_batches, args.workers,
        use_native=True)
    bench["pil"] = _loader_throughput(
        train_ds, args.batch_size, max(4, args.bench_batches // 4),
        args.workers, use_native=False)
    if bench["native"]["native"]:
        bench["native_speedup"] = round(
            bench["native"]["img_per_s"] / bench["pil"]["img_per_s"], 2)
    report["loader"] = bench
    report["loadavg_end"] = os.getloadavg()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
