"""Multi-step trainer-dynamics parity vs the reference torch trainer.

Round-3 extension of tests/test_trainer_parity.py from 1 iteration to N:
same injected draws, same data sequence, for N consecutive ``train()``
calls of the reference's ``SRGAN_training`` (util_notebook.py:419-734)
against N calls of our jitted step.  Two regimes:

  - reg=0, idt_reg=0 (phase-2 grads exactly zero): the whole trajectory
    must track — per-step losses stay within a tight relative bound and
    post-run params within the Adam noise-floor envelope.
  - full proposedKL stack (reg=0.5, idt_reg=0.5): phase-1 quantities track;
    the documented phase-2 divergence (training/gan.py docstring item 5)
    is measured per step and asserted to grow at most linearly — the
    committed curve (docs/evidence/trainer_dynamics_r03.json, written when
    SRGAN_TPU_WRITE_EVIDENCE=1) quantifies the accumulation.

Step count: asserted at N=20 (override with SRGAN_TPU_DYNAMICS_STEPS); an
extended N=50 run is committed as
docs/evidence/trainer_dynamics_r03_n50.json.  At 50 steps the param-drift
envelope stays sub-linear (g_max 2.9e-3 strict / 6.5e-3 full — far inside
the linear bound) but the errE *loss trajectory* decorrelates up to
5%/20% (strict/full): errE sums chaotic KL/corr/hist terms in the
thousands, and fp-noise-seeded trajectory separation is exponential in
any chaotic system — the macro dynamics still match (the full-length
equilibrium identity in docs/TRAINING_EVIDENCE.md).  Hence loss-level
assertions are only claimed for N=20.

Injection mechanics: the one-step tests bake draws in at trace time, which
cannot replay different draws through ONE compiled step.  Here the draws
come from a host-side schedule through ``jax.pure_callback``: draw sites
are numbered in trace order (matching the one-step draw order), and each
executed step pops its row of the schedule — so the step compiles once and
replays N steps of prerecorded torch draws.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from test_trainer_parity import (  # noqa: E402
    B,
    HW,
    K,
    LR,
    NDIM,
    Adam14,
    _batch,
    _patch_randn,
    _patch_reparam,
    _sd,
    _torch_inputs,
    ref,  # noqa: F401  (fixture re-export)
)

from srgan_tpu.configs import (  # noqa: E402
    ExperimentConfig,
    LossWeights,
    ModelConfig,
    TrainConfig,
)
from srgan_tpu.training import GANTrainer  # noqa: E402
from srgan_tpu.utils.checkpoint import (  # noqa: E402
    import_torch_encoder,
    import_torch_generator,
    import_torch_solo_discriminator,
)

N_STEPS = int(os.environ.get("SRGAN_TPU_DYNAMICS_STEPS", "20"))


class ScheduledTrainer(GANTrainer):
    """GANTrainer whose in-step draws replay a host schedule at RUN time."""

    def set_schedule(self, schedule):
        # schedule[step][site] -> (B, NDIM) array; sites numbered in trace
        # order (identical to the one-step InjectedTrainer pop order)
        self._sched = [[np.asarray(d, np.float32) for d in row]
                       for row in schedule]
        self._site_seq = 0
        self._site_calls = {}

    def _draw_latent(self, key, shape):
        site = self._site_seq
        self._site_seq += 1

        def pop():
            i = self._site_calls.get(site, 0)
            self._site_calls[site] = i + 1
            arr = self._sched[i][site]
            assert arr.shape == tuple(shape), (arr.shape, tuple(shape))
            return arr

        return jax.pure_callback(
            pop, jax.ShapeDtypeStruct(tuple(shape), jnp.float32))


def _tree_abs_diff_stats(ours, theirs):
    d = np.concatenate([
        np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32)).ravel()
        for x, y in zip(jax.tree.leaves(ours), jax.tree.leaves(theirs))])
    return float(d.max()), float(d.mean())


def _run_dynamics(ref, monkeypatch, seed, reg, idt_reg, n_steps=N_STEPS):
    torch.manual_seed(0)
    rng = np.random.default_rng(seed)
    lbd = {"class": 1, "cycle": 5, "idt": 5, "reg": reg, "idt_reg": idt_reg,
           "KL": 0, "batch_KL": 10, "corr_enc": 100, "hist": 100}
    netG = ref.model.SingleGenerator(3, 16, 2, 2, 2, "instance", num_con=12)
    netD = ref.model.SingleDiscriminator_solo_multi(3, 16, 2, 4, "instance", 4)
    netE = ref.model.Encoder(3, 8, 16, 4, "instance", 4, "cpu")

    g_params = import_torch_generator(_sd(netG), num_cls=2, res_num=2)
    d_params = import_torch_solo_discriminator(_sd(netD), num_cls=4)
    e_params = import_torch_encoder(_sd(netE), num_cls=4, conditional=False)

    optG = Adam14(netG.parameters(), lr=LR, betas=(0.5, 0.999))
    sg = ref.trainer.SRGAN_training(
        [netG, netD, netE], [optG, None, None],
        [torch.nn.MSELoss(), torch.nn.MSELoss()], lbd, K, "cpu",
        np.eye(4), batch_size=B, encoded_feature="mu", ndim=NDIM)
    sg.opt_sche_initialization()
    hist_target = sg.hi.target.detach().numpy()

    batches = [_batch(rng) for _ in range(n_steps)]
    # K draw sites per step (update_D loop x (K-1) + phase-1 latent)
    schedule = [[rng.standard_normal((B, NDIM)).astype(np.float32)
                 for _ in range(K)] for _ in range(n_steps)]

    _patch_randn(monkeypatch, [d for row in schedule for d in row])
    _patch_reparam(netE, [np.zeros((B, NDIM), np.float32)] * (8 * n_steps))

    cfg = ExperimentConfig(
        name="dynamics",
        model=ModelConfig(image_size=HW, g_nch=16, g_res_num=2, d_nch=16,
                          d_num_cls=4, e_nch=16, e_num_cls=4),
        train=TrainConfig(batch_size=B, unrolled_k=K, encoded_feature="mu",
                          lr_g=LR, lr_d=LR, lr_e=LR),
        loss=LossWeights(cycle=5, idt=5, reg=reg, idt_reg=idt_reg, KL=0,
                         batch_KL=10, corr_enc=100, hist=100, cls=1),
        trainer="srgan")
    trainer = ScheduledTrainer(cfg, donate=False)
    trainer.set_schedule(schedule)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(g_params=g_params, d_params=d_params,
                          e_params=e_params,
                          hist_target=jnp.asarray(hist_target))

    traj = []
    for step, (img, src, tgt) in enumerate(batches):
        x, label = _torch_inputs(img, src, tgt)
        errG_t, errD_t, errE_t = sg.train(x, label)

        batch = {"image": jnp.asarray(img), "source_label": jnp.asarray(src),
                 "target_label": jnp.asarray(tgt)}
        state, m = trainer.step(state, batch, jax.random.PRNGKey(step))

        g_max, g_mean = _tree_abs_diff_stats(
            state.g_params, import_torch_generator(_sd(netG), num_cls=2,
                                                   res_num=2))
        d_max, d_mean = _tree_abs_diff_stats(
            state.d_params, import_torch_solo_discriminator(_sd(netD),
                                                            num_cls=4))
        e_max, e_mean = _tree_abs_diff_stats(
            state.e_params, import_torch_encoder(_sd(netE), num_cls=4,
                                                 conditional=False))
        traj.append({
            "step": step + 1,
            "errD_torch": float(errD_t), "errD_jax": float(m["errD"]),
            "errE_torch": float(errE_t), "errE_jax": float(m["errE"]),
            "errG_torch": float(errG_t), "errG_jax": float(m["errG"]),
            "g_max": g_max, "g_mean": g_mean,
            "d_max": d_max, "d_mean": d_mean,
            "e_max": e_max, "e_mean": e_mean,
        })
    # every scheduled draw must have been consumed exactly once per side
    assert all(n == n_steps for n in trainer._site_calls.values()), \
        trainer._site_calls
    assert len(trainer._site_calls) == K
    return traj


def _maybe_write_evidence(name, traj, meta):
    if os.environ.get("SRGAN_TPU_WRITE_EVIDENCE") != "1":
        return
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "evidence",
                        "trainer_dynamics_r03.json")
    path = os.path.abspath(path)
    data = {}
    if os.path.exists(path):
        data = json.load(open(path))
    data[name] = {"meta": meta, "trajectory": traj}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def test_srgan_dynamics_strict_no_phase2(ref, monkeypatch):
    """reg=idt_reg=0 -> phase-2 grads are exactly zero on both sides: the
    20-step loss trajectories and final params must track within the Adam
    noise-floor envelope (no compounding blow-up)."""
    traj = _run_dynamics(ref, monkeypatch, seed=42, reg=0.0, idt_reg=0.0)
    _maybe_write_evidence(
        "strict_no_phase2", traj,
        {"n_steps": N_STEPS, "reg": 0, "idt_reg": 0, "B": B, "K": K,
         "hw": HW, "note": "phase-2 grads exactly zero on both sides"})

    for row in traj:
        # fp noise amplified through GAN feedback grows with step count;
        # measured max rel-err over 20 steps is ~1e-3 (see committed
        # evidence) — bound at 3x that with linear growth allowance
        tol = 2e-4 + 3e-4 * row["step"]
        for k in ("errD", "errE", "errG"):
            a, b = row[f"{k}_jax"], row[f"{k}_torch"]
            assert abs(a - b) <= tol * max(1.0, abs(b)), (k, row)
    last = traj[-1]
    # params: bounded by n_steps opposite noise-floor Adam steps; the MEAN
    # divergence accumulates ~0.1 x LR per step from noise-floor elements
    # wandering (measured: g 2.1e-4, d 1.1e-5, e 1.6e-5 after 20 steps) —
    # bound at 0.25 x LR x N
    for net in ("g", "d", "e"):
        assert last[f"{net}_max"] <= 2.2 * 2 * N_STEPS * LR, (net, last)
        assert last[f"{net}_mean"] <= 0.25 * LR * N_STEPS, (net, last)


def test_srgan_dynamics_full_stack_bounded_divergence(ref, monkeypatch):
    """Full proposedKL stack: the phase-2 reference-point divergence
    (training/gan.py:34-39) must accumulate at most ~linearly in G and not
    contaminate phase-1 quantities beyond the noise envelope."""
    traj = _run_dynamics(ref, monkeypatch, seed=7, reg=0.5, idt_reg=0.5)
    _maybe_write_evidence(
        "full_stack", traj,
        {"n_steps": N_STEPS, "reg": 0.5, "idt_reg": 0.5, "B": B, "K": K,
         "hw": HW,
         "note": "phase-2 recomputes fakes with post-phase-1 G (documented "
                 "divergence); curve quantifies accumulation"})

    for row in traj:
        # errD/errE are phase-1 quantities; allow the indirect contamination
        # through G's phase-2 divergence to grow linearly
        tol = 2e-4 + 1e-3 * row["step"]
        for k in ("errD", "errE"):
            a, b = row[f"{k}_jax"], row[f"{k}_torch"]
            assert abs(a - b) <= tol * max(1.0, abs(b)), (k, row)
    # G divergence: per-step phase-2 reference-point gap is bounded by a
    # couple of Adam steps; over N steps the accumulated gap must stay
    # within a linear envelope (no compounding blow-up)
    for row in traj:
        assert row["g_max"] <= 5 * LR * (1 + row["step"]), row
    last = traj[-1]
    assert last["d_max"] <= 2.2 * 2 * N_STEPS * LR + 5 * LR * N_STEPS * 0.5, \
        last
    assert last["e_mean"] <= 2 * LR, last
