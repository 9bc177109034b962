#!/usr/bin/env python
"""Quantify the data-parallel scaling claim (VERDICT r3 item 6).

The single-chip step is closed at 93% of nominal MXU peak (docs/PERF.md
round 3); the remaining scaling axis is chips.  This tool turns "the scaling
axis is chips" into numbers:

  1. **Analytic collective budget** — per-step all-reduce bytes under a 1-D
     data mesh: the gradient trees (D grads all-reduced once per unrolled-k
     D update, G grads twice — the two-phase update — and E grads once;
     training/gan.py) plus the psum'd batch-global loss statistics
     (batch-KL moments, corrcoef moments, histogram counts — KB-scale,
     SURVEY.md §2.7), against published v5e ICI bandwidth, assuming a
     bidirectional-ring all-reduce (2.(n-1)/n bytes on the wire per chip).
  2. **HLO sanity check** — jit the real sharded train step over an
     n-device virtual CPU mesh at reduced geometry, pull the OPTIMIZED HLO
     (``lower().compile().as_text()``), and count the all-reduce ops and
     their operand bytes; the analytic model must agree on what actually
     gets all-reduced (XLA fuses grad trees into few tuple all-reduces, so
     we compare total bytes, not op counts).

Writes docs/evidence/scaling_analysis.json.

v5e interconnect assumptions (documented, not measured — no multi-chip
hardware in this environment): 4 ICI links/chip, 400 Gbps/link/direction
=> 200 GB/s aggregate one-direction per chip (Google Cloud TPU v5e specs:
1,600 Gbps interchip bandwidth per chip).  A conservative bound uses one
link direction only (50 GB/s).
"""

import argparse
import json
import os
import re
import subprocess
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e ICI (see module docstring)
ICI_BYTES_PER_SEC = {"aggregate_200GBps": 200e9, "single_link_50GBps": 50e9}

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}


def tree_bytes(tree) -> int:
    import jax
    import numpy as np

    return int(sum(np.prod(np.shape(x)) * np.dtype(x.dtype).itemsize
                   for x in jax.tree.leaves(tree)))


def analytic_budget(cfg, step_time_s: float, images_per_sec: float,
                    n_chips: int = 8) -> dict:
    """Per-step all-reduce byte budget + predicted DP efficiency."""
    import jax

    from srgan_tpu.training import GANTrainer

    trainer = GANTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0))
    sizes = {"G": tree_bytes(state.g_params),
             "D": tree_bytes(state.d_params),
             "E": tree_bytes(state.e_params)}
    k = cfg.train.unrolled_k
    # gradient all-reduces per step: k x D (one per unrolled D update),
    # 2 x G (two-phase update), 1 x E (training/gan.py)
    grad_bytes = k * sizes["D"] + 2 * sizes["G"] + sizes["E"]
    # batch-global loss statistics psums (SURVEY §2.7): batch-KL moments
    # (2 x ndim), corrcoef moments (ndim + ndim^2), histogram counts
    # (bins x ndim) — per G/E grad phase, forward+backward; bound with 4x
    ndim, bins = cfg.model.ndim, 50
    stat_bytes = 4 * 4 * (2 * ndim + ndim + ndim * ndim + bins * ndim)
    total = grad_bytes + stat_bytes

    out = {"param_bytes": sizes, "unrolled_k": k,
           "grad_allreduce_bytes_per_step": int(grad_bytes),
           "loss_stat_psum_bytes_per_step": int(stat_bytes),
           "total_allreduce_bytes_per_step": int(total),
           "n_chips": n_chips,
           "single_chip_step_time_s": step_time_s,
           "single_chip_images_per_sec": images_per_sec,
           "predictions": {}}
    wire = 2 * (n_chips - 1) / n_chips * total   # ring all-reduce per chip
    for name, bw in ICI_BYTES_PER_SEC.items():
        t_ar = wire / bw
        # zero-overlap (conservative): collectives serialize after compute
        eff = step_time_s / (step_time_s + t_ar)
        out["predictions"][name] = {
            "allreduce_time_s": t_ar,
            "efficiency_no_overlap": eff,
            "predicted_images_per_sec_8chip": images_per_sec * n_chips * eff,
        }
    return out


_HLO_CHILD = """
import json, re, sys
import numpy as np
import jax, jax.numpy as jnp
from srgan_tpu.configs import ExperimentConfig, LossWeights, ModelConfig, TrainConfig
from srgan_tpu.parallel import make_mesh, shard_batch
from srgan_tpu.training import GANTrainer

hw, batch, k = {hw}, {batch}, {k}
cfg = ExperimentConfig(
    name="scaling_hlo",
    model=ModelConfig(image_size=hw, g_nch={g_nch}, g_res_num={g_res_num},
                      d_nch={d_nch}, d_num_cls={d_num_cls},
                      e_nch={e_nch}, e_num_cls={e_num_cls}),
    train=TrainConfig(batch_size=batch, unrolled_k=k, encoded_feature="mu"),
    loss=LossWeights.proposed_kl(cls=1.0), trainer="srgan")
mesh = make_mesh({n})
t = GANTrainer(cfg, mesh=mesh, donate=False, grad_sync="{grad_sync}")
state = t.init_state(jax.random.PRNGKey(0), image_size=hw)
r = np.random.default_rng(0); src = r.integers(0, 4, batch)
b = shard_batch({{
    "image": jnp.asarray(r.uniform(-1, 1, (batch, hw, hw, 3)).astype(np.float32)),
    "source_label": jnp.asarray(src),
    "target_label": jnp.asarray((src + r.integers(1, 4, batch)) % 4)}}, mesh)
lr_g, lr_d, lr_e = t.lr_at(0)
lowered = t._jit_step.lower(state, b["image"], b["source_label"],
                            b["target_label"], jax.random.PRNGKey(1),
                            jnp.float32(lr_g), jnp.float32(lr_d),
                            jnp.float32(lr_e))
txt = lowered.compile().as_text()
sys.stdout.write("HLO_BEGIN\\n" + txt + "\\nHLO_END\\n")
"""


def _shape_bytes(dt: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def hlo_allreduce_bytes(hlo_text: str) -> dict:
    """Sum operand bytes of every all-reduce in optimized HLO, attributed
    to the module producing each gradient (via op_name metadata on the
    tuple elements)."""
    total, count = 0, 0
    by_module = {"G": 0, "D": 0, "E": 0, "other": 0}

    def module_of(op_name: str) -> str:
        if "SingleGenerator" in op_name:
            return "G"
        if "Discriminator" in op_name:
            return "D"
        if "Encoder" in op_name:
            return "E"
        return "other"

    # tuple elements carry the metadata: attribute per element
    for m in re.finditer(
            r"=\s*(\w+)\[([0-9,]*)\][^=]*get-tuple-element\(%all-reduce"
            r"[^)]*\).*?op_name=\"([^\"]+)\"", hlo_text):
        dt, dims, op = m.groups()
        by_module[module_of(op)] += _shape_bytes(dt, dims)
    # plain (non-tuple) all-reduces carry their own metadata
    for m in re.finditer(
            r"%all-reduce[.\d]* = (\w+)\[([0-9,]*)\][^(]*all-reduce\("
            r".*?op_name=\"([^\"]+)\"", hlo_text):
        dt, dims, op = m.groups()
        by_module[module_of(op)] += _shape_bytes(dt, dims)
    count = len(re.findall(r"%all-reduce[.\d]* =", hlo_text))
    total = sum(by_module.values())
    return {"num_all_reduces": count, "total_bytes": int(total),
            "bytes_by_module": by_module}


def run_hlo_check(n: int, hw: int, batch: int, k: int, geom: dict,
                  grad_sync: str = "auto") -> dict:
    """Compile the sharded step on an n-device virtual CPU mesh in a child
    process (the parent may own the TPU backend) and analyze its HLO."""
    env = dict(os.environ)
    env["_SRGAN_SCALING_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={n}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), "tests", ".jax_cache"))
    code = _HLO_CHILD.format(hw=hw, batch=batch, k=k, n=n,
                             grad_sync=grad_sync, **geom)
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    if res.returncode != 0:
        raise RuntimeError(f"HLO child failed:\n{res.stderr[-3000:]}")
    hlo = res.stdout.split("HLO_BEGIN\n", 1)[1].rsplit("\nHLO_END", 1)[0]
    return hlo_allreduce_bytes(hlo)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="docs/evidence/scaling_analysis.json")
    ap.add_argument("--n-chips", type=int, default=8)
    ap.add_argument("--images-per-sec", type=float, default=343.96,
                    help="measured single-chip throughput (BENCH_r03.json)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--skip-hlo", action="store_true")
    ap.add_argument("--hlo-hw", type=int, default=64,
                    help="reduced geometry for the CPU-mesh HLO check")
    ap.add_argument("--hlo-nch", type=int, default=8)
    args = ap.parse_args()

    from srgan_tpu.configs import srgan_nopretraining

    cfg = srgan_nopretraining()   # the bench.py flagship arm
    step_time = args.batch_size / args.images_per_sec
    report = {"flagship": analytic_budget(cfg, step_time,
                                          args.images_per_sec,
                                          args.n_chips)}

    if not args.skip_hlo:
        import dataclasses

        geom = dict(g_nch=args.hlo_nch, g_res_num=1, d_nch=args.hlo_nch,
                    d_num_cls=3, e_nch=args.hlo_nch, e_num_cls=2)
        small = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, image_size=args.hlo_hw,
                                      **geom),
            train=dataclasses.replace(cfg.train, batch_size=16,
                                      unrolled_k=2))
        hlo = run_hlo_check(args.n_chips, args.hlo_hw, 16, 2, geom)
        expect = analytic_budget(small, 1.0, 16.0, args.n_chips)
        report["hlo_check"] = {
            "geometry": {"hw": args.hlo_hw, "batch": 16, "unrolled_k": 2,
                         **geom},
            "hlo": hlo,
            "analytic_bytes": expect["total_allreduce_bytes_per_step"],
            "ratio_hlo_over_analytic":
                hlo["total_bytes"]
                / max(expect["total_allreduce_bytes_per_step"], 1),
        }
        # measured per-module multipliers: XLA all-reduces each G call
        # site's PARTIAL param-cotangents separately (the step applies G
        # ~8x: k fake gens + cycle/idt + phase-2 reg/idt-reg), while D
        # grads match the ideal k x |D| exactly and E ~1 x |E|.
        # Extrapolate flagship bytes with those multipliers (the G call-
        # site count is k-independent on the D side only).
        small_sizes = expect["param_bytes"]
        mult = {
            "G": hlo["bytes_by_module"]["G"] / small_sizes["G"],
            "D_per_update": hlo["bytes_by_module"]["D"]
                / (2 * small_sizes["D"]),
            "E": hlo["bytes_by_module"]["E"] / small_sizes["E"],
        }
        flag = report["flagship"]
        measured_total = (
            mult["G"] * flag["param_bytes"]["G"]
            + mult["D_per_update"] * flag["unrolled_k"]
            * flag["param_bytes"]["D"]
            + mult["E"] * flag["param_bytes"]["E"]
            + flag["loss_stat_psum_bytes_per_step"])
        report["hlo_check"]["measured_multipliers"] = mult
        report["flagship_hlo_extrapolated"] = {
            "total_allreduce_bytes_per_step": int(measured_total),
            "predictions": {}}
        wire = 2 * (args.n_chips - 1) / args.n_chips * measured_total
        for name, bw in ICI_BYTES_PER_SEC.items():
            t_ar = wire / bw
            eff = step_time / (step_time + t_ar)
            report["flagship_hlo_extrapolated"]["predictions"][name] = {
                "allreduce_time_s": t_ar,
                "efficiency_no_overlap": eff,
                "predicted_images_per_sec_8chip":
                    args.images_per_sec * args.n_chips * eff,
            }

        # --- manual grad-sync mode (shard_map + one pmean per grad tree;
        # training/gan.py grad_sync="manual") — the wire volume SHOULD be
        # the analytic ideal 2|G| + k|D| + |E| + stats, with no per-call-
        # site partial-cotangent blowup.
        hlo_man = run_hlo_check(args.n_chips, args.hlo_hw, 16, 2, geom,
                                grad_sync="manual")
        ratio_man = (hlo_man["total_bytes"]
                     / max(expect["total_allreduce_bytes_per_step"], 1))
        report["hlo_check_manual"] = {
            "geometry": report["hlo_check"]["geometry"],
            "hlo": hlo_man,
            "analytic_bytes": expect["total_allreduce_bytes_per_step"],
            "ratio_hlo_over_analytic": ratio_man,
            "bytes_saved_vs_auto":
                hlo["total_bytes"] - hlo_man["total_bytes"],
            "volume_vs_auto":
                hlo_man["total_bytes"] / max(hlo["total_bytes"], 1),
        }
        # flagship prediction under manual mode: scale the analytic ideal
        # by the measured small-geometry ratio (covers psum'd loss stats
        # and any residual XLA bookkeeping)
        flag = report["flagship"]
        man_total = ratio_man * flag["total_allreduce_bytes_per_step"]
        report["flagship_manual"] = {
            "total_allreduce_bytes_per_step": int(man_total),
            "predictions": {}}
        wire = 2 * (args.n_chips - 1) / args.n_chips * man_total
        for name, bw in ICI_BYTES_PER_SEC.items():
            t_ar = wire / bw
            eff = step_time / (step_time + t_ar)
            report["flagship_manual"]["predictions"][name] = {
                "allreduce_time_s": t_ar,
                "efficiency_no_overlap": eff,
                "predicted_images_per_sec_8chip":
                    args.images_per_sec * args.n_chips * eff,
            }

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
