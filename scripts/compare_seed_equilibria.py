#!/usr/bin/env python
"""Compare torch-reference vs srgan_tpu translation equilibria across seeds.

Round-4 evidence tool (VERDICT #4): the round-3 headline — "the reference's
own torch trainer and the TPU rebuild converge to the identical
translation-pair equilibrium" — rested on one seed.  This script aggregates
per-seed oracle summaries (produced by ``scripts/ref_torch_train.py`` for the
torch arm and ``scripts/translation_oracle.py`` for the JAX arm, both scored
by the same nearest-class-signature oracle) into one committed comparison
artifact.

Usage:
  python scripts/compare_seed_equilibria.py \
      --pair 0 docs/evidence/summary_match_torch.json docs/evidence/summary_match_jax.json \
      --pair 1 docs/evidence/summary_match_torch_s1.json docs/evidence/summary_match_jax_s1.json \
      --out docs/evidence/seed_equilibria_r04.json
"""

import argparse
import json


def _pair_set(summary: dict, phase: str, thresh: float = 0.75) -> list[str]:
    """Translation pairs the oracle scores at/above ``thresh`` accuracy."""
    return sorted(k for k, v in summary[phase]["pairs"].items() if v >= thresh)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pair", nargs=3, action="append", required=True,
                    metavar=("SEED", "TORCH_JSON", "JAX_JSON"))
    ap.add_argument("--thresh", type=float, default=0.75,
                    help="oracle accuracy above which a pair counts as learned")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    seeds = {}
    for seed, torch_path, jax_path in args.pair:
        t = json.load(open(torch_path))
        j = json.load(open(jax_path))
        entry = {}
        for phase in ("init", "trained"):
            tp = _pair_set(t, phase, args.thresh)
            jp = _pair_set(j, phase, args.thresh)
            entry[phase] = {
                "torch_pairs": tp,
                "jax_pairs": jp,
                "pairs_identical": tp == jp,
                "torch_acc": t[phase]["acc"],
                "jax_acc": j[phase]["acc"],
                "acc_delta": abs(t[phase]["acc"] - j[phase]["acc"]),
            }
        entry["sources"] = {"torch": torch_path, "jax": jax_path}
        seeds[str(seed)] = entry

    n = len(seeds)
    report = {
        "oracle_pair_threshold": args.thresh,
        "seeds": seeds,
        "all_trained_pairsets_identical": all(
            s["trained"]["pairs_identical"] for s in seeds.values()),
        "all_init_pairsets_identical": all(
            s["init"]["pairs_identical"] for s in seeds.values()),
        "max_trained_acc_delta": max(
            s["trained"]["acc_delta"] for s in seeds.values()),
        "n_seeds": n,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in report if k != "seeds"}, indent=1))
    for seed, s in seeds.items():
        print(f"seed {seed}: trained torch={s['trained']['torch_pairs']} "
              f"jax={s['trained']['jax_pairs']} "
              f"identical={s['trained']['pairs_identical']}")


if __name__ == "__main__":
    main()
