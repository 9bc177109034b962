"""One-iteration trainer parity vs the ACTUAL reference torch trainers.

Runs the reference's own ``SRGAN_training`` (util_notebook.py:419-734) and
``SingleGAN_training`` (:28-417) for one ``train()`` on CPU with
  - identical weights (exported through the .pth importers),
  - identical random draws (torch.randn / reparametrize eps intercepted and
    the same values injected into our trainer's ``_draw_latent`` seam),
  - the identical histogram-imitation target,
then asserts the returned losses and the post-step parameters match.

Phase-2 note (training/gan.py docstring item 5): the reference's second G
step backprops a retained graph whose saved weight tensors were already
updated in-place by phase-1 Adam (a torch .data-update artifact); we
recompute phase-2 forwards with post-phase-1 params.  Therefore:
  - with reg=0 and idt_reg=0 the phase-2 gradients are exactly zero on both
    sides and the WHOLE step must match strictly (test_srgan_strict...);
  - with the full loss stack, phase-1 quantities (errD, errE, D and E params)
    still match strictly and the G divergence is bounded by the size of two
    Adam steps (test_srgan_full... / test_singlegan...).
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

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
    import_torch_original_discriminator,
    import_torch_solo_discriminator,
)

REF_PYFILES = "/root/reference/pyfiles"
B = 8       # batch
K = 2       # unrolled_k
HW = 128    # solo-D tests: the reference's head width min(nch*2^num_cls,
            # nch*8) only matches its own trunk when num_cls=4 (the cap
            # binds), and its hardcoded 8/4 class kernels need 128px
NDIM = 8
LR = 1e-4


@pytest.fixture(scope="module")
def ref():
    import os
    if not os.path.isdir(REF_PYFILES):
        pytest.skip("reference checkout not available")
    if "prdc" not in sys.modules:
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


class InjectedTrainer(GANTrainer):
    """GANTrainer whose in-step normal draws come from a preset list."""

    def set_draws(self, draws):
        self._draw_list = [np.asarray(d, np.float32) for d in draws]
        self._draw_i = 0

    def _draw_latent(self, key, shape):
        arr = self._draw_list[self._draw_i]
        self._draw_i += 1
        assert arr.shape == tuple(shape), (arr.shape, tuple(shape))
        return jnp.asarray(arr)


from srgan_tpu.utils.torch14 import Adam14  # noqa: E402


def _sd(net):
    # .copy() is load-bearing: .numpy() aliases the live parameter memory,
    # and the torch optimizers later update those params IN PLACE — without
    # the copy the "initial" weights handed to our trainer would mutate
    # under it (CPU jax can zero-copy numpy arrays).
    return {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}


def _tree_max_diff(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                           - y.astype(jnp.float32)))), a, b)
    return max(jax.tree.leaves(diffs))


def _assert_param_parity(ours, theirs, n_steps, name):
    """Post-step parity tolerant of early-Adam sign amplification.

    At t=1, Adam's update is g/(|g|+eps) ~= sign(g): for parameters whose
    true gradient is at the fp32-noise floor (~1e-7), torch and jax can
    legitimately step in opposite directions, each by ~lr.  So strict
    elementwise equality is impossible by construction; instead require
    (a) the bulk of elements match tightly, (b) outliers are bounded by the
    worst case of n_steps opposite full steps, (c) the mean diff is a tiny
    fraction of one step.
    """
    d = np.concatenate([
        np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32)).ravel()
        for x, y in zip(jax.tree.leaves(ours), jax.tree.leaves(theirs))])
    # worst case: both sides step n_steps times in opposite directions, each
    # step up to ~1.1 x lr (Adam bias-correction transients)
    assert d.max() <= 2.2 * n_steps * LR, (name, float(d.max()))
    assert d.mean() < 0.02 * LR, (name, float(d.mean()))
    frac = float((d > 1e-6).mean())
    assert frac < 0.01, (name, frac)


def _patch_randn(monkeypatch, draws):
    """torch.randn -> pop preset (B, NDIM) arrays; other shapes unexpected."""
    it = iter([torch.from_numpy(np.asarray(d, np.float32)) for d in draws])

    def fake_randn(*shape, **kw):
        t = next(it)
        assert tuple(t.shape) == tuple(shape), (t.shape, shape)
        return t

    monkeypatch.setattr(torch, "randn", fake_randn)


def _patch_reparam(net, eps_list):
    """Replace net.reparametrize with a deterministic eps-popping version."""
    it = iter([torch.from_numpy(np.asarray(e, np.float32)) for e in eps_list])

    def fake_reparam(self, mu, logvar):
        eps = next(it)
        return eps * torch.exp(0.5 * logvar) + mu

    net.reparametrize = types.MethodType(fake_reparam, net)


def _batch(rng):
    src = rng.integers(0, 4, B)
    tgt = (src + rng.integers(1, 4, B)) % 4
    img = rng.uniform(-1, 1, (B, HW, HW, 3)).astype(np.float32)
    return img, src.astype(np.int64), tgt.astype(np.int64)


def _torch_inputs(img, src, tgt):
    x = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())
    label = {"source": torch.from_numpy(src), "target": torch.from_numpy(tgt)}
    return x, label


# ---------------------------------------------------------------------------
# SRGAN trainer (util_notebook.py:419-734), encoded_feature="mu"
# ---------------------------------------------------------------------------

def _run_srgan_pair(ref, monkeypatch, rng, reg, idt_reg):
    torch.manual_seed(0)
    lbd = {"class": 1, "cycle": 5, "idt": 5, "reg": reg, "idt_reg": idt_reg,
           "KL": 0, "batch_KL": 10, "corr_enc": 100, "hist": 100}
    netG = ref.model.SingleGenerator(3, 16, 2, 2, 2, "instance", num_con=12)
    netD = ref.model.SingleDiscriminator_solo_multi(3, 16, 2, 4, "instance", 4)
    netE = ref.model.Encoder(3, 8, 16, 4, "instance", 4, "cpu")

    g_params = import_torch_generator(_sd(netG), num_cls=2, res_num=2)
    d_params = import_torch_solo_discriminator(_sd(netD), num_cls=4)
    e_params = import_torch_encoder(_sd(netE), num_cls=4, conditional=False)

    # torch trainer (constructed before patching randn: histogram_imitation
    # draws its 100k-sample target here — we reuse it verbatim on our side)
    optG = Adam14(netG.parameters(), lr=LR, betas=(0.5, 0.999))
    sg = ref.trainer.SRGAN_training(
        [netG, netD, netE], [optG, None, None],
        [torch.nn.MSELoss(), torch.nn.MSELoss()], lbd, K, "cpu",
        np.eye(4), batch_size=B, encoded_feature="mu", ndim=NDIM)
    sg.opt_sche_initialization()
    hist_target = sg.hi.target.detach().numpy()

    img, src, tgt = _batch(rng)
    latents = [rng.standard_normal((B, NDIM)).astype(np.float32)
               for _ in range(K)]
    # torch consumes K randn (update_D) and several reparametrize eps that
    # never reach a loss in mu mode — feed it zeros for those
    _patch_randn(monkeypatch, latents)
    _patch_reparam(netE, [np.zeros((B, NDIM), np.float32)] * 8)

    x, label = _torch_inputs(img, src, tgt)
    errG_t, errD_t, errE_t = sg.train(x, label)

    # --- our side
    cfg = ExperimentConfig(
        name="parity",
        model=ModelConfig(image_size=HW, g_nch=16, g_res_num=2, d_nch=16,
                          d_num_cls=4, e_nch=16, e_num_cls=4),
        train=TrainConfig(batch_size=B, unrolled_k=K, encoded_feature="mu",
                          lr_g=LR, lr_d=LR, lr_e=LR),
        loss=LossWeights(cycle=5, idt=5, reg=reg, idt_reg=idt_reg, KL=0,
                         batch_KL=10, corr_enc=100, hist=100, cls=1),
        trainer="srgan")
    trainer = InjectedTrainer(cfg, donate=False)
    trainer.set_draws(latents)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(g_params=g_params, d_params=d_params,
                          e_params=e_params,
                          hist_target=jnp.asarray(hist_target))
    batch = {"image": jnp.asarray(img), "source_label": jnp.asarray(src),
             "target_label": jnp.asarray(tgt)}
    new_state, metrics = trainer.step(state, batch, jax.random.PRNGKey(1))

    post = types.SimpleNamespace(
        g=import_torch_generator(_sd(netG), num_cls=2, res_num=2),
        d=import_torch_solo_discriminator(_sd(netD), num_cls=4),
        e=import_torch_encoder(_sd(netE), num_cls=4, conditional=False))
    errs = (float(errG_t), float(errD_t), float(errE_t))
    return errs, post, new_state, metrics


def test_srgan_strict_parity_without_phase2(ref, monkeypatch):
    """reg=0, idt_reg=0: phase-2 grads are exactly zero on both sides, so the
    entire iteration — losses AND post-step G/D/E params — must match."""
    rng = np.random.default_rng(42)
    (errG_t, errD_t, errE_t), post, new_state, m = _run_srgan_pair(
        ref, monkeypatch, rng, reg=0.0, idt_reg=0.0)

    assert np.isclose(float(m["errD"]), errD_t, rtol=2e-4), (
        float(m["errD"]), errD_t)
    assert np.isclose(float(m["errE"]), errE_t, rtol=2e-4), (
        float(m["errE"]), errE_t)
    assert np.isclose(float(m["errG"]), errG_t, rtol=2e-4), (
        float(m["errG"]), errG_t)

    # all three nets match modulo a handful of sign-amplified noise-floor
    # elements (see _assert_param_parity) — otherwise exact.
    _assert_param_parity(new_state.e_params, post.e, n_steps=1, name="E")
    _assert_param_parity(new_state.d_params, post.d, n_steps=2, name="D")
    _assert_param_parity(new_state.g_params, post.g, n_steps=2, name="G")


def test_srgan_full_stack_phase1_parity_and_bounded_phase2(ref, monkeypatch):
    """Full proposedKL stack (reg=0.5, idt_reg=0.5): phase-1 quantities match
    strictly; the G divergence from the documented phase-2 semantics is
    bounded by the scale of the two Adam steps."""
    rng = np.random.default_rng(7)
    (errG_t, errD_t, errE_t), post, new_state, m = _run_srgan_pair(
        ref, monkeypatch, rng, reg=0.5, idt_reg=0.5)

    # phase-1 losses: errD and errE are pure phase-1 quantities
    assert np.isclose(float(m["errD"]), errD_t, rtol=2e-4)
    assert np.isclose(float(m["errE"]), errE_t, rtol=2e-4)
    # errG includes phase-2 (errG_ex); ours recomputes the fakes with
    # phase-1-updated G, the reference reuses pre-update fakes -> close but
    # not identical
    assert np.isclose(float(m["errG"]), errG_t, rtol=5e-3)

    # E is phase-1-only and its grads are large: near-strict
    _assert_param_parity(new_state.e_params, post.e, n_steps=1, name="E")
    _assert_param_parity(new_state.d_params, post.d, n_steps=2, name="D")
    # G: phase-1 step identical; phase-2 gradient reference point diverges
    # (documented) — bound by two full opposite steps
    g_diff = _tree_max_diff(new_state.g_params, post.g)
    assert g_diff < 5 * LR, g_diff


# ---------------------------------------------------------------------------
# SingleGAN trainer (util_notebook.py:28-417), per-domain D list,
# conventional-KL config (encoded_feature="latent", KL=0.1)
# ---------------------------------------------------------------------------

def test_singlegan_conventional_kl_parity(ref, monkeypatch):
    torch.manual_seed(0)
    rng = np.random.default_rng(3)
    lbd = {"cycle": 5, "idt": 5, "reg": 0.5, "idt_reg": 0, "KL": 0.1,
           "batch_KL": 0, "corr_enc": 0, "hist": 0}
    netG = ref.model.SingleGenerator(3, 16, 2, 2, 2, "instance", num_con=12)
    netDs = [ref.model.SingleDiscriminator_original_multi(3, 16, 2, 3,
                                                          "instance")
             for _ in range(4)]
    netE = ref.model.Encoder_original(3, 8, 16, 4, "instance", 4, "cpu")

    g_params = import_torch_generator(_sd(netG), num_cls=2, res_num=2)
    d_list = [import_torch_original_discriminator(_sd(d), num_cls=3)
              for d in netDs]
    d_params = jax.tree.map(lambda *xs: jnp.stack(xs), *d_list)
    e_params = import_torch_encoder(_sd(netE), num_cls=4, conditional=True)

    optG = Adam14(netG.parameters(), lr=LR, betas=(0.5, 0.999))
    sg = ref.trainer.SingleGAN_training(
        [netG, netDs, netE], [optG, None, None],
        [torch.nn.MSELoss(), None], lbd, 1, "cpu", np.eye(4), NDIM,
        list(range(4)), batch_size=B, encoded_feature="latent", singleD=False)
    sg.opt_sche_initialization()

    img, src, tgt = _batch(rng)
    latent0 = rng.standard_normal((B, NDIM)).astype(np.float32)
    eps_recon = rng.standard_normal((B, NDIM)).astype(np.float32)
    eps_idt = rng.standard_normal((B, NDIM)).astype(np.float32)
    _patch_randn(monkeypatch, [latent0])
    # torch E eps order: recon, idt, phase-2 E(target) (unused -> zeros)
    _patch_reparam(netE, [eps_recon, eps_idt,
                          np.zeros((B, NDIM), np.float32)])

    x, label = _torch_inputs(img, src, tgt)
    errG_t, errD_t, errE_t = sg.train(x, label)

    cfg = ExperimentConfig(
        name="parity01",
        model=ModelConfig(image_size=HW, g_nch=16, g_res_num=2, d_nch=16,
                          d_num_cls=3, e_nch=16, e_num_cls=4),
        train=TrainConfig(batch_size=B, unrolled_k=1,
                          encoded_feature="latent",
                          lr_g=LR, lr_d=LR, lr_e=LR),
        loss=LossWeights(cycle=5, idt=5, reg=0.5, idt_reg=0, KL=0.1,
                         batch_KL=0, corr_enc=0, hist=0, cls=0),
        trainer="singlegan")
    trainer = InjectedTrainer(cfg, donate=False)
    # our draw order: D-loop latent, then style_recon eps, then style_idt eps
    trainer.set_draws([latent0, eps_recon, eps_idt])
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(g_params=g_params, d_params=d_params,
                          e_params=e_params)
    batch = {"image": jnp.asarray(img), "source_label": jnp.asarray(src),
             "target_label": jnp.asarray(tgt)}
    new_state, m = trainer.step(state, batch, jax.random.PRNGKey(1))

    # errD is not comparable: the reference returns the LAST domain's errD
    # from the update_D loop (util_notebook.py:251 returns `errD`, while the
    # accumulated all_errD is discarded); ours reports the mean over domains.
    assert np.isclose(float(m["errE"]), float(errE_t), rtol=2e-4)
    assert np.isclose(float(m["errG"]), float(errG_t), rtol=5e-3)

    post_e = import_torch_encoder(_sd(netE), num_cls=4, conditional=True)
    post_d = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[import_torch_original_discriminator(_sd(d), num_cls=3)
          for d in netDs])
    post_g = import_torch_generator(_sd(netG), num_cls=2, res_num=2)
    _assert_param_parity(new_state.e_params, post_e, n_steps=1, name="E")
    _assert_param_parity(new_state.d_params, post_d, n_steps=1, name="D")
    assert _tree_max_diff(new_state.g_params, post_g) < 5 * LR
