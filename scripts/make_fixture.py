#!/usr/bin/env python
"""Generate a synthetic CelebA fixture with a RECORDED recipe.

Evidence runs (docs/TRAINING_EVIDENCE.md) train on synthetic fixtures; this
CLI makes their generation reproducible from the repo instead of from ad-hoc
interpreter calls whose parameters are otherwise lost with the run directory
(a round-4 lesson: the round-3 boosted-fixture parameters had to be
reconstructed from prose).  Writes the images + ``list_attr_celeba.txt`` plus
a ``fixture.json`` recording every generation parameter.

Named recipes used by the committed evidence:

  structured   docs/evidence/prdc_comparison_r04.json (PRDC capstone):
               structured low-frequency content, 300/class, boost 40
  boost        docs/evidence/summary_match_*.json (equilibrium study):
               noise mode, sigma 15, 116/class, boost 40
"""

import argparse
import json
import os
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.data import make_synthetic_celeba

RECIPES = {
    "structured": dict(n_per_class=300, seed=0, smiling_boost=40.0,
                       mode="structured"),
    "boost": dict(n_per_class=116, seed=0, noise_sigma=15.0,
                  smiling_boost=40.0, mode="noise"),
    "strong": dict(n_per_class=200, seed=0, noise_sigma=15.0, mode="noise"),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="fixture directory")
    ap.add_argument("--recipe", choices=sorted(RECIPES), default=None)
    ap.add_argument("--n-per-class", type=int)
    ap.add_argument("--seed", type=int)
    ap.add_argument("--noise-sigma", type=float)
    ap.add_argument("--smiling-boost", type=float)
    ap.add_argument("--mode", choices=["noise", "structured"])
    args = ap.parse_args()

    params = dict(RECIPES[args.recipe]) if args.recipe else {}
    for k, v in (("n_per_class", args.n_per_class), ("seed", args.seed),
                 ("noise_sigma", args.noise_sigma),
                 ("smiling_boost", args.smiling_boost), ("mode", args.mode)):
        if v is not None:
            params[k] = v

    img_root, attr_file = make_synthetic_celeba(args.out, **params)
    with open(os.path.join(args.out, "fixture.json"), "w") as f:
        json.dump({"recipe": args.recipe, "params": params}, f, indent=1)
    print(f"{img_root}\n{attr_file}")


if __name__ == "__main__":
    main()
