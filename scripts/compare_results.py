#!/usr/bin/env python
"""Aggregate PRDC result pickles into comparison tables (notebook 06).

Given one pickle per model (from evaluate_prdc.py), prints:
  - per-model (fe x metric) means for a chosen (source, target) pair
  - per-(source x target) matrix for a chosen fe/metric
  - the all-pairs model x metric mean table
"""

import argparse
import pickle
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

METRICS = ("precision", "recall", "density", "coverage")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pickles", nargs="+",
                    help="result pickles from evaluate_prdc.py")
    ap.add_argument("--names", nargs="+", help="model names (default: paths)")
    ap.add_argument("--fe", default=None,
                    help="feature extractor (default: first in each pickle)")
    ap.add_argument("--source", type=int, default=3)
    ap.add_argument("--target", type=int, default=2)
    ap.add_argument("--json-out",
                    help="also write the full (model x fe x metric) "
                         "source x target tables as a JSON artifact")
    args = ap.parse_args()

    names = args.names or args.pickles
    results = []
    for path in args.pickles:
        with open(path, "rb") as f:
            results.append(pickle.load(f))

    fe = args.fe or next(iter(results[0]))
    classes = sorted(results[0][fe])

    # nb06 cell 12: per-model metric means at one (source, target) pair
    rows = [[np.mean(r[fe][args.source][args.target][m]) for m in METRICS]
            for r in results]
    print(f"\n{fe}  s={args.source} t={args.target}:")
    print(pd.DataFrame(rows, index=names, columns=METRICS).round(4))

    # nb06 cell 10: source x target matrix for the first model
    for metric in METRICS:
        mat = [[np.mean(results[0][fe][s][t][metric]) for t in classes]
               for s in classes]
        print(f"\n{names[0]} / {fe} / {metric} (source x target):")
        print(pd.DataFrame(mat, index=classes, columns=classes).round(4))
        break

    # nb06 cell 14: mean over all (source, target) pairs, model x metric
    rows = []
    for r in results:
        vals = []
        for m in METRICS:
            vals.append(np.mean([np.mean(r[fe][s][t][m])
                                 for s in classes for t in classes]))
        rows.append(vals)
    print(f"\nall-pairs mean / {fe}:")
    print(pd.DataFrame(rows, index=names, columns=METRICS).round(4))

    if args.json_out:
        import json
        import os

        report = {}
        for name, r in zip(names, results):
            report[name] = {}
            for fe_name in r:
                fes = {}
                for metric in METRICS:
                    mat = [[float(np.mean(r[fe_name][s][t][metric]))
                            for t in classes] for s in classes]
                    off_diag = [mat[s][t] for s in range(len(classes))
                                for t in range(len(classes)) if s != t]
                    fes[metric] = {
                        "source_x_target": mat,
                        "mean_all_pairs": float(np.mean(
                            [v for row in mat for v in row])),
                        "mean_translation_pairs": float(np.mean(off_diag)),
                    }
                report[name][fe_name] = fes
        os.makedirs(os.path.dirname(os.path.abspath(args.json_out)) or ".",
                    exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump({"classes": classes, "models": report}, f, indent=1)
        print(f"\nJSON tables -> {args.json_out}")


if __name__ == "__main__":
    main()
