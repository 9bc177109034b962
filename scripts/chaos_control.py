#!/usr/bin/env python
"""Chaos control for the N=50 dynamics decorrelation (VERDICT r3 weak #2).

The committed N=50 torch-vs-jax dynamics curve
(``docs/evidence/trainer_dynamics_r03_n50.json``) shows the errE loss
trajectory decorrelating up to 5%/20% (strict/full regime) by step 50 while
the param-drift envelope stays sub-linear; docs/PARITY.md attributes the
loss-level divergence to chaotic trajectory separation — until now a
qualitative argument.

This script makes it quantitative WITHOUT any jax in the loop: it runs the
reference's OWN torch ``SRGAN_training`` (util_notebook.py:419-734, imported
from /root/reference/pyfiles and executed, not copied) TWICE — identical
init, identical batches, identical torch RNG stream — except run B perturbs
ONE generator weight by ``eps`` (default 1e-6, the fp32 round-off scale of
the cross-framework comparison).  It records the same per-step relative
errD/errE/errG separation used in the torch-vs-jax study.  If the reference
decorrelates from an eps-copy of ITSELF at the same magnitude it decorrelates
from the TPU rebuild, the torch-vs-jax loss divergence is explained by
exponential amplification of fp noise (a Lyapunov property of the training
dynamics), not by an implementation difference.

Writes ``docs/evidence/chaos_control_r04.json`` including a side-by-side
with the committed torch-vs-jax N=50 separations.
"""

import argparse
import json
import os
import sys
import types

import numpy as np
import torch

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.utils.torch14 import Adam14

REF_PYFILES = "/root/reference/pyfiles"
# the dynamics-study geometry (HW stays 128: the reference solo-D head is
# hard-wired to 128px/num_cls=4, docs/PARITY.md quirk ledger)
B, K, HW, NDIM, LR = 8, 2, 128, 8, 1e-4


def load_ref():
    if not os.path.isdir(REF_PYFILES):
        raise SystemExit("reference checkout not available")
    if "prdc" not in sys.modules:  # evaluation.py imports it at module scope
        stub = types.ModuleType("prdc")
        stub.compute_prdc = None
        sys.modules["prdc"] = stub
    sys.path.insert(0, REF_PYFILES)
    try:
        import model as ref_model
        import util_notebook as ref_trainer
    finally:
        sys.path.remove(REF_PYFILES)
    return types.SimpleNamespace(model=ref_model, trainer=ref_trainer)


def make_batches(n_steps, b=B, seed=7):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        src = rng.integers(0, 4, b)
        tgt = (src + rng.integers(1, 4, b)) % 4
        img = rng.uniform(-1, 1, (b, HW, HW, 3)).astype(np.float32)
        x = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())
        label = {"source": torch.from_numpy(src.astype(np.int64)),
                 "target": torch.from_numpy(tgt.astype(np.int64))}
        batches.append((x, label))
    return batches


def run_reference(ref, batches, reg, idt_reg, eps=0.0, nch=16, b=B):
    """One N-step run of the reference trainer; eps perturbs ONE G weight."""
    torch.manual_seed(0)  # identical init across runs
    lbd = {"class": 1, "cycle": 5, "idt": 5, "reg": reg, "idt_reg": idt_reg,
           "KL": 0, "batch_KL": 10, "corr_enc": 100, "hist": 100}
    netG = ref.model.SingleGenerator(3, nch, 2, 2, 2, "instance", num_con=12)
    netD = ref.model.SingleDiscriminator_solo_multi(3, nch, 2, 4,
                                                    "instance", 4)
    netE = ref.model.Encoder(3, 8, nch, 4, "instance", 4, "cpu")
    if eps:
        with torch.no_grad():
            next(netG.parameters()).view(-1)[0] += eps

    optG = Adam14(netG.parameters(), lr=LR, betas=(0.5, 0.999))
    sg = ref.trainer.SRGAN_training(
        [netG, netD, netE], [optG, None, None],
        [torch.nn.MSELoss(), torch.nn.MSELoss()], lbd, K, "cpu",
        np.eye(4), batch_size=b, encoded_feature="mu", ndim=NDIM)
    sg.opt_sche_initialization()

    torch.manual_seed(1234)  # identical in-training draw stream across runs
    traj = []
    for x, label in batches:
        errG, errD, errE = sg.train(x, label)
        traj.append({"errG": float(errG), "errD": float(errD),
                     "errE": float(errE)})
    return traj


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--reg", type=float, default=0.5)
    ap.add_argument("--idt-reg", type=float, default=0.5)
    ap.add_argument("--nch", type=int, default=16,
                    help="model width (tiny smoke runs use 8)")
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--out",
                    default="docs/evidence/chaos_control_r04.json")
    ap.add_argument("--compare",
                    default="docs/evidence/trainer_dynamics_r03_n50.json",
                    help="committed torch-vs-jax N-step curve to put "
                         "side-by-side (skipped if absent)")
    args = ap.parse_args()

    ref = load_ref()
    batches = make_batches(args.steps, b=args.batch)
    print(f"run A (baseline, {args.steps} steps) ...", flush=True)
    ta = run_reference(ref, batches, args.reg, args.idt_reg, eps=0.0,
                       nch=args.nch, b=args.batch)
    print("run B (one G weight += %g) ..." % args.eps, flush=True)
    tb = run_reference(ref, batches, args.reg, args.idt_reg, eps=args.eps,
                       nch=args.nch, b=args.batch)

    per_step = []
    for i, (ra, rb) in enumerate(zip(ta, tb)):
        sep = {m: abs(ra[m] - rb[m]) / max(1.0, abs(ra[m]))
               for m in ("errD", "errE", "errG")}
        per_step.append({"step": i + 1, **{f"{m}_A": ra[m] for m in ra},
                         **{f"{m}_B": rb[m] for m in rb},
                         **{f"sep_{m}": sep[m] for m in sep}})

    report = {
        "what": "reference torch trainer vs an eps-perturbed copy of "
                "itself (identical batches/draws); same separation metric "
                "as the committed torch-vs-jax N=50 study",
        "eps": args.eps, "n_steps": args.steps,
        "reg": args.reg, "idt_reg": args.idt_reg,
        "geometry": {"B": args.batch, "K": K, "hw": HW, "nch": args.nch,
                     "ndim": NDIM},
        "final_separation": {m: per_step[-1][f"sep_{m}"]
                             for m in ("errD", "errE", "errG")},
        "max_separation": {m: max(r[f"sep_{m}"] for r in per_step)
                           for m in ("errD", "errE", "errG")},
        "per_step": per_step,
    }

    if args.compare and os.path.exists(args.compare):
        cmp_data = json.load(open(args.compare))
        side = {}
        for regime, d in cmp_data.items():
            rows = d["trajectory"]
            seps = [{m: abs(r[f"{m}_jax"] - r[f"{m}_torch"])
                     / max(1.0, abs(r[f"{m}_torch"]))
                     for m in ("errD", "errE", "errG")} for r in rows]
            side[regime] = {
                "n_steps": len(rows),
                "final_separation": seps[-1],
                "max_separation": {m: max(s[m] for s in seps)
                                   for m in ("errD", "errE", "errG")},
            }
        report["torch_vs_jax_committed"] = side
        full = side.get("full_stack")
        if full and args.steps >= full["n_steps"]:
            at_n = per_step[full["n_steps"] - 1]
            report["verdict"] = {
                "torch_vs_eps_torch_errE_at_N": at_n["sep_errE"],
                "torch_vs_jax_errE_at_N":
                    full["final_separation"]["errE"],
                "same_order": 0.1 <= (
                    (at_n["sep_errE"] + 1e-12)
                    / (full["final_separation"]["errE"] + 1e-12)) <= 10.0,
            }

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".",
                exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "per_step"},
                     indent=1))


if __name__ == "__main__":
    main()
