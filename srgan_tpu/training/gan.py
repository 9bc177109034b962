"""The unified GAN trainer — one jitted train step for all three variants.

Behavioral spec (SURVEY.md §2.3 "trainer semantics", reference
util_notebook.py):

  variant "singlegan"       nb01: per-domain multi-scale D list, conditional
                            encoder (EncoderOriginal), no class loss.
  variant "singlegan_solo"  nb02: solo D + aux classifier, conditional encoder.
  variant "srgan"           nb03/05: solo D, unconditional Encoder.

Replicated semantics:
  1. UnrolledGAN (util_notebook.py:369-411/:696-728): D updated k times, each
     with *fresh* random latents; G/E update once against the k-step D.  The
     reference INTENDS to restore D to a post-first-update snapshot, but its
     ``state_dict()`` snapshot aliases the live tensors that torch Adam
     updates in place, so the restore is a silent no-op and D keeps all k
     updates (verified against the actual torch trainer in
     tests/test_trainer_parity.py).  Default replicates that; set
     ``TrainConfig.unrolled_restore=True`` for the documented intent
     (restore params, keep Adam moments — torch state_dict carries no
     optimizer state either way).
  2. Two-phase G/E update (:253-367/:596-694).  Phase 1:
     ``errG.backward(retain); errE.backward(retain); optG.step(); optE.step()``
     is mathematically a single grad of (errG + errE) wrt (G, E) since errE
     does not touch G — one jax.grad call.  Phase 2 steps G a second time on
     the regression losses.
  3. The G step consumes the fakes from the LAST update_D call, gradient
     flowing through G (retained graph).  In JAX we recompute
     ``G(source, c_rand)`` inside the loss with the same ``c_rand`` — exact
     rematerialization of the retained graph.
  4. Per-domain D path: batch masked per domain (:225-249); per-domain Adams
     == elementwise Adam over the stacked D param tree (masked-out grads are
     zero but the step still runs, matching torch's zero-grad step decay).
  5. Divergence (documented): phase 2 recomputes its forwards with the
     phase-1-updated G/E params.  The reference backprops a graph whose
     activations came from pre-step params but whose weights were updated
     in-place by Adam (a torch-1.4 inplace artifact with no clean functional
     equivalent).  The loss VALUES match; only the phase-2 gradient reference
     point differs.

TPU-native: the whole iteration (k D-steps + both G/E phases) is ONE jitted,
state-donated function; data-parallel via NamedSharding on the batch axis —
GSPMD inserts the gradient all-reduces and makes the batch-global losses
(batch-KL / corrcoef / histogram) global automatically.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srgan_tpu.configs import ExperimentConfig
from srgan_tpu.nn import (
    Encoder,
    EncoderOriginal,
    SingleDiscriminatorOriginalMulti,
    SingleDiscriminatorSoloMulti,
    SingleGenerator,
)
from srgan_tpu.ops import losses as L
from srgan_tpu.training.state import (
    GANTrainState,
    adam_apply,
    adam_chain,
    freeze_mask,
    mask_grads,
)

Array = jax.Array


def _dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class GANTrainer:
    """Builds models + the jitted train step for an ExperimentConfig."""

    def __init__(self, cfg: ExperimentConfig, mesh: Optional[Mesh] = None,
                 cls_kernels: Optional[Tuple[int, int]] = None,
                 donate: bool = True, grad_sync: str = "auto"):
        """grad_sync: "auto" (GSPMD derives the collectives from the
        NamedShardings) or "manual" (the step runs inside shard_map with ONE
        pmean per gradient tree and explicit psums for the batch-global
        losses).  GSPMD all-reduces each G call-site's partial cotangents
        separately (~8.2x|G|/step measured, scaling_analysis.json); manual
        mode cuts the wire volume to the ideal 2|G|+k|D|+|E|.  Results are
        numerically identical to fp tolerance (tests/test_sharding.py)."""
        if grad_sync not in ("auto", "manual"):
            raise ValueError(f"grad_sync must be auto|manual, got {grad_sync}")
        if grad_sync == "manual" and mesh is None:
            raise ValueError("grad_sync='manual' requires a mesh")
        if grad_sync == "manual" and cfg.model.norm_type == "batch":
            # BatchNorm running stats would be computed per shard inside
            # shard_map (GSPMD computes them globally); keep bn on GSPMD
            raise ValueError("grad_sync='manual' does not support "
                             "norm_type='batch'; use grad_sync='auto'")
        self.grad_sync = grad_sync
        self._axis = "data" if grad_sync == "manual" else None
        self._n_shards = int(np.prod(list(mesh.shape.values()))) if mesh else 1
        self.donate = donate
        self.use_bn = cfg.model.norm_type == "batch"
        self.cfg = cfg
        self.mesh = mesh
        m = cfg.model
        dtype = _dtype_of(cfg.train.compute_dtype)
        self.generator = SingleGenerator(
            nch_in=m.nch_in, nch=m.g_nch, reduce=m.g_reduce,
            num_cls=m.g_num_cls, res_num=m.g_res_num, norm_type=m.norm_type,
            num_con=m.num_con, dtype=dtype)
        self.per_domain = cfg.trainer == "singlegan"
        if self.per_domain:
            self.discriminator = SingleDiscriminatorOriginalMulti(
                nch_in=m.nch_in, nch=m.d_nch, reduce=m.d_reduce,
                num_cls=m.d_num_cls, dtype=dtype)
        else:
            if cls_kernels is None:
                # classification-head kernels sized to the trunk's output
                # maps (the reference hardcodes 8/4 for 128px / 2^4,
                # model.py:330-331); generalize to any geometry
                k1 = m.image_size // (2 ** m.d_num_cls)
                cls_kernels = (k1, k1 // 2)
            self.discriminator = SingleDiscriminatorSoloMulti(
                nch_in=m.nch_in, nch=m.d_nch, reduce=m.d_reduce,
                num_cls=m.d_num_cls, n_class=m.n_classes,
                cls_kernels=cls_kernels, dtype=dtype)
        self.conditional_e = cfg.trainer in ("singlegan", "singlegan_solo")
        if self.conditional_e:
            self.encoder = EncoderOriginal(
                nch_in=m.nch_in, nch_out=m.ndim, nch=m.e_nch,
                num_cls=m.e_num_cls, norm_type=m.norm_type, dtype=dtype)
        else:
            self.encoder = Encoder(
                nch_in=m.nch_in, nch_out=m.ndim, nch=m.e_nch,
                num_cls=m.e_num_cls, num_con=m.n_classes,
                norm_type=m.norm_type, dtype=dtype)

        self.tx = adam_chain(cfg.train.adam_b1, cfg.train.adam_b2)
        self.ref_label = np.eye(m.n_classes, dtype=np.float32)
        self._jit_step = self._build_step()
        # jitted inference paths (shape-polymorphic via retrace-and-cache)
        self._jit_G_apply = jax.jit(
            lambda p, stats, x, c: self.generator.apply(
                {"params": p, **({"batch_stats": stats}
                                 if stats is not None else {})},
                x, c, train=False))
        self._jit_E_apply = jax.jit(
            lambda p, stats, x, onehot: self._E_trunk(p, x, onehot,
                                                      stats=stats,
                                                      train=False)[:3])

    # ------------------------------------------------------------------
    # model call helpers
    # ------------------------------------------------------------------
    def _G(self, params, x, cond):
        return self.generator.apply({"params": params}, x, cond)

    def _G_t(self, params, stats, x, cond):
        """Training-mode generator apply; threads batch-norm running stats
        (stats is None in instance mode -> plain apply)."""
        if stats is None:
            return self._G(params, x, cond), None
        out, upd = self.generator.apply(
            {"params": params, "batch_stats": stats}, x, cond, train=True,
            mutable=["batch_stats"])
        return out, upd["batch_stats"]

    def _D(self, params, x):
        if self.per_domain:
            # stacked per-domain params -> outputs (n_domains, B, h, w, 1) x2
            return jax.vmap(
                lambda p: self.discriminator.apply({"params": p}, x))(params)
        return self.discriminator.apply({"params": params}, x)

    def _E_trunk(self, params, x, onehot, stats=None, train=True):
        """One encoder forward returning (mu, logvar, class_out or None,
        new_stats or None).

        The reference calls E up to 3x per phase with identical inputs; the
        trunk is deterministic (instance mode) so we compute it once and
        reuse (eps draws stay independent, matching the reference's per-call
        resampling).  In batch mode running stats are threaded through.
        """
        variables = {"params": params}
        kwargs = dict(sample=False, rngs={"reparam": jax.random.PRNGKey(0)})
        mutable = False
        if stats is not None:
            variables["batch_stats"] = stats
            kwargs["train"] = train
            if train:
                mutable = ["batch_stats"]
        args = (x, onehot) if self.conditional_e else (x,)
        out = self.encoder.apply(variables, *args, mutable=mutable, **kwargs)
        new_stats = None
        if mutable:
            out, upd = out
            new_stats = upd["batch_stats"]
        if self.conditional_e:
            _, mu, logvar = out
            return mu, logvar, None, new_stats
        _, mu, logvar, cls_out, _ = out
        return mu, logvar, cls_out, new_stats

    def _draw_latent(self, key, shape):
        """Every standard-normal draw inside the train step goes through this
        seam, so parity tests can inject the torch trainer's exact draws by
        overriding it (they run at trace time, baking the values in)."""
        return jax.random.normal(key, shape, jnp.float32)

    def _sample_latent(self, mu, logvar, key):
        eps = self._draw_latent(key, mu.shape)
        return eps * jnp.exp(0.5 * logvar) + mu

    def _onehot(self, labels):
        return jnp.asarray(self.ref_label)[labels]

    def _G_pair(self, params, stats, x1, c1, x2, c2):
        """Two generator applications fused into one 2B-batch forward —
        per-sample ops (convs, instance norm, CBINorm) make this exact.
        Batch mode: one running-stats update from the 2B batch (the reference
        would update twice with B each — documented bn-mode divergence)."""
        b = x1.shape[0]
        out, new_stats = self._G_t(params, stats,
                                   jnp.concatenate([x1, x2], 0),
                                   jnp.concatenate([c1, c2], 0))
        return out[:b], out[b:], new_stats

    # ------------------------------------------------------------------
    # the train step
    # ------------------------------------------------------------------
    def _build_step(self):
        cfg = self.cfg
        lw = cfg.loss
        k = cfg.train.unrolled_k
        ndim = cfg.model.ndim
        n_classes = cfg.model.n_classes
        n_batch_cfg = cfg.train.batch_size
        use_latent = cfg.train.encoded_feature == "latent"
        unrolled_restore = cfg.train.unrolled_restore
        solo = not self.per_domain

        # --- manual grad-sync plumbing (no-ops when ax is None) ----------
        # Recipe: per-shard losses keep plain batch MEANS local (pmean of
        # their grads == grad of the global mean), while batch-SUM and
        # nonlinear batch-global terms go through psum inside the loss (the
        # psum transpose contributes an n_shards factor that the final pmean
        # cancels exactly).  One pmean per gradient tree is the only
        # param-sized collective per phase.
        ax = self._axis
        n_shards = self._n_shards

        def sync_grads(tree):
            if ax is None:
                return tree
            return jax.tree.map(lambda g: jax.lax.pmean(g, ax), tree)

        def draw_batch(key, b, d):
            """Per-shard slice of the GLOBAL (n*b, d) normal draw, so manual
            mode consumes bit-identical latents to the single-device /
            GSPMD step (row-major batch sharding)."""
            if ax is None:
                return self._draw_latent(key, (b, d))
            g = self._draw_latent(key, (n_shards * b, d))
            return jax.lax.dynamic_slice_in_dim(
                g, jax.lax.axis_index(ax) * b, b, 0)

        def sample_latent(mu, logvar, key):
            eps = draw_batch(key, mu.shape[0], mu.shape[1])
            return eps * jnp.exp(0.5 * logvar) + mu

        if ax is None:
            masked_lsgan = L.masked_lsgan_loss
            diversification = L.diversification_loss
        else:
            from srgan_tpu.parallel import collectives as C

            def masked_lsgan(outputs, target, mask):
                return C.global_masked_lsgan_loss(outputs, target, mask, ax)

            def diversification(mu, logvar, *, weights, n_batch, hist_target):
                return C.global_diversification_loss(
                    mu, logvar, weights=weights, n_batch=n_batch,
                    hist_target=hist_target, axis=ax)

        def d_loss_fn(d_params, images, fake, onehot_src, src_labels,
                      tgt_labels):
            B = images.shape[0]
            both = jnp.concatenate([images, jax.lax.stop_gradient(fake)], 0)
            if solo:
                adv, cls = self._D(d_params, both)
                adv_r = [a[:B] for a in adv]
                adv_f = [a[B:] for a in adv]
                cls_r = [c[:B] for c in cls]
                errD = L.lsgan_loss(adv_r, 1.0)
                if lw.cls > 0:
                    errD = errD + lw.cls * L.domain_classification_loss(
                        cls_r, onehot_src)
                errD = errD + L.lsgan_loss(adv_f, 0.0)
                return errD, errD
            # per-domain: evaluate every stacked D on the full batch, mask.
            adv = self._D(d_params, both)               # [(n,2B,h,w,1)] x2
            adv_r = [a[:, :B] for a in adv]
            adv_f = [a[:, B:] for a in adv]
            per_domain_err = []
            for i in range(n_classes):
                m_src = (src_labels == i)
                m_tgt = (tgt_labels == i)
                e = (masked_lsgan([a[i] for a in adv_r], 1.0, m_src)
                     + masked_lsgan([a[i] for a in adv_f], 0.0, m_tgt))
                per_domain_err.append(e)
            total = sum(per_domain_err)
            mean_err = total / n_classes
            return total, mean_err

        def ge_loss_fn(g_params, e_params, d_params_in, d_opt_in, g_stats,
                       e_stats, images, onehot_src, onehot_tgt, src_labels,
                       tgt_labels, c_rand, hist_target, keys, lr_d):
            # --- the k-th unrolled fake, computed ONCE: its stop_gradient'd
            # value drives the final D update (folded in here so the same
            # G forward serves both that update and phase 1's retained-graph
            # rematerialization — the reference's retained graph shares it
            # too, util_notebook.py:202/:278); the outer grad does not flow
            # into the D update (stop_gradient in d_loss_fn), matching
            # torch autograd never differentiating through optD.step().
            fake, g_stats = self._G_t(g_params, g_stats, images,
                                      jnp.concatenate([onehot_tgt, c_rand], 1))
            d_grads, errD_last = jax.grad(d_loss_fn, has_aux=True)(
                d_params_in, images, fake, onehot_src, src_labels, tgt_labels)
            d_params, d_opt = adam_apply(self.tx, sync_grads(d_grads),
                                         d_opt_in, d_params_in, lr_d)

            # --- encoder on source (one trunk forward, per-call eps draws)
            mu, logvar, _, e_stats = self._E_trunk(e_params, images,
                                                   onehot_src, stats=e_stats)
            style_recon = (sample_latent(mu, logvar, keys[0])
                           if use_latent else mu)
            if lw.idt > 0:
                style_idt = (sample_latent(mu, logvar, keys[1])
                             if use_latent else mu)
                recon, idt_img, g_stats = self._G_pair(
                    g_params, g_stats,
                    fake, jnp.concatenate([onehot_src, style_recon], 1),
                    images, jnp.concatenate([onehot_src, style_idt], 1))
            else:
                idt_img = None
                recon, g_stats = self._G_t(g_params, g_stats, fake,
                                           jnp.concatenate(
                                               [onehot_src, style_recon], 1))

            metrics = {}
            # --- adversarial (+ class) for G on the fakes
            if solo:
                adv, cls_out = self._D(d_params, fake)
                errG = L.lsgan_loss(adv, 1.0)
                if lw.cls > 0:
                    errG = errG + lw.cls * L.domain_classification_loss(
                        cls_out, onehot_tgt)
            else:
                adv = self._D(d_params, fake)
                errG = 0.0
                for i in range(n_classes):
                    errG = errG + masked_lsgan(
                        [a[i] for a in adv], 1.0, tgt_labels == i) / n_classes

            err_cycle = L.l1_loss(images, recon)
            errG = errG + lw.cycle * err_cycle
            metrics["loss_cycle"] = err_cycle

            errE_out = lw.cycle * err_cycle
            if lw.idt > 0:
                err_idt = L.l1_loss(images, idt_img)
                errG = errG + lw.idt * err_idt
                errE_out = errE_out + lw.idt * err_idt
                metrics["loss_idt"] = err_idt

            errE, div_metrics = diversification(
                mu, logvar, weights=lw, n_batch=n_batch_cfg,
                hist_target=hist_target)
            metrics.update(div_metrics)
            errE_out = errE_out + errE

            total = errG + errE
            metrics["errG_phase1"] = errG
            metrics["errE"] = errE_out
            return total, (metrics, g_stats, e_stats, d_params, d_opt,
                           errD_last)

        def g2_loss_fn(g_params, e_params, g_stats, e_stats, images,
                       onehot_src, onehot_tgt, c_rand, keys):
            # style regression: |c_rand - E(G(source, c_rand)).mu|
            B = images.shape[0]
            cond_fake = jnp.concatenate([onehot_tgt, c_rand], 1)
            if lw.idt_reg * lw.idt > 0:
                if self.conditional_e:
                    # SingleGAN flavor (:352-360): random source-style image
                    reg_target = draw_batch(keys[0], B, ndim)
                    cond_idt = jnp.concatenate([onehot_src, reg_target], 1)
                else:
                    # SRGAN flavor (:680-687): encoder-driven identity image
                    mu_s, logvar_s, _, e_stats = self._E_trunk(
                        e_params, images, None, stats=e_stats)
                    style = (sample_latent(mu_s, logvar_s, keys[1])
                             if use_latent else mu_s)
                    reg_target = mu_s
                    cond_idt = jnp.concatenate([onehot_src, style], 1)
                fake, idt_img, g_stats = self._G_pair(
                    g_params, g_stats, images, cond_fake, images, cond_idt)
                onehot_both = jnp.concatenate([onehot_tgt, onehot_src], 0)
                mu_both, _, _, e_stats = self._E_trunk(
                    e_params, jnp.concatenate([fake, idt_img], 0),
                    onehot_both if self.conditional_e else None,
                    stats=e_stats)
                errG_ex = lw.reg * L.l1_loss(c_rand, mu_both[:B])
                errG_ex = errG_ex + (L.l1_loss(reg_target, mu_both[B:])
                                     * lw.idt_reg * (lw.idt / lw.cycle))
            else:
                fake, g_stats = self._G_t(g_params, g_stats, images,
                                          cond_fake)
                mu_t, _, _, e_stats = self._E_trunk(e_params, fake,
                                                    onehot_tgt, stats=e_stats)
                errG_ex = lw.reg * L.l1_loss(c_rand, mu_t)
            return errG_ex, (g_stats, e_stats)

        def train_step(state: GANTrainState, images, src_labels, tgt_labels,
                       rng, lr_g, lr_d, lr_e):
            onehot_src = self._onehot(src_labels)
            onehot_tgt = self._onehot(tgt_labels)
            B = images.shape[0]

            # ---------------- unrolled D updates ----------------
            # k is static and small (<= 5): an unrolled Python loop lets the
            # first-iteration snapshot be a plain reference (no masking), and
            # XLA is free to schedule the k G-forwards independently.  The
            # k-th update is folded into the phase-1 grad function so its
            # fake's G forward is computed once, not twice.
            keys = jax.random.split(rng, k + 4)
            d_params, d_opt = state.d_params, state.d_opt
            g_stats, e_stats = state.g_stats, state.e_stats
            snap = None
            errD0 = None
            for i in range(k - 1):
                latent = draw_batch(keys[i], B, ndim)
                fake, g_stats = self._G_t(state.g_params, g_stats, images,
                                          jnp.concatenate(
                                              [onehot_tgt, latent], 1))
                grads, errD_mean = jax.grad(d_loss_fn, has_aux=True)(
                    d_params, images, fake, onehot_src, src_labels, tgt_labels)
                d_params, d_opt = adam_apply(self.tx, sync_grads(grads),
                                             d_opt, d_params, lr_d)
                if i == 0:
                    # snapshot AFTER the first update (quirk #8); only
                    # meaningful under unrolled_restore=True — the
                    # reference's own restore is a no-op (see module docstring)
                    snap = d_params
                    errD0 = errD_mean

            # ---------------- phase 1: joint G/E (+ final D update) --------
            latent = draw_batch(keys[k - 1], B, ndim)
            ge_keys = keys[k:k + 2]
            (_, (metrics, g_stats, e_stats, d_params, d_opt, errD_last)), \
                (g_grads, e_grads) = \
                jax.value_and_grad(ge_loss_fn, argnums=(0, 1), has_aux=True)(
                    state.g_params, state.e_params, d_params, d_opt, g_stats,
                    e_stats, images, onehot_src, onehot_tgt, src_labels,
                    tgt_labels, latent, state.hist_target, ge_keys, lr_d)
            if k == 1:
                snap = d_params
                errD0 = errD_last
            g_grads, e_grads = sync_grads((g_grads, e_grads))
            if state.e_mask is not None:
                e_grads = mask_grads(e_grads, state.e_mask)
            g_params, g_opt = adam_apply(self.tx, g_grads, state.g_opt,
                                         state.g_params, lr_g)
            e_params, e_opt = adam_apply(self.tx, e_grads, state.e_opt,
                                         state.e_params, lr_e)

            # ---------------- phase 2: exclusive G ----------------
            g2_keys = keys[k + 2:k + 4]
            (errG_ex, (g_stats, e_stats)), g2_grads = jax.value_and_grad(
                g2_loss_fn, has_aux=True)(
                    g_params, e_params, g_stats, e_stats, images, onehot_src,
                    onehot_tgt, latent, g2_keys)
            g_params, g_opt = adam_apply(self.tx, sync_grads(g2_grads),
                                         g_opt, g_params, lr_g)

            metrics = dict(metrics)
            metrics["errD"] = errD0
            metrics["errG"] = metrics.pop("errG_phase1") + errG_ex
            metrics["errG_ex"] = errG_ex
            if ax is not None:
                # shard-local means -> global means (replicated batch-global
                # terms pass through pmean unchanged)
                metrics = jax.tree.map(lambda v: jax.lax.pmean(v, ax),
                                       metrics)

            new_state = state.replace(
                step=state.step + 1,
                g_params=g_params, g_opt=g_opt,
                # reference behavior: keep all k updates (its restore is a
                # no-op); optional true restore rolls params (not Adam
                # moments) back to the post-first-update snapshot
                d_params=snap if unrolled_restore else d_params,
                d_opt=d_opt,
                e_params=e_params, e_opt=e_opt,
                g_stats=g_stats, e_stats=e_stats,
            )
            return new_state, metrics

        donate = (0,) if self.donate else ()
        # 64 MiB scoped VMEM (default 16) lets the TPU compiler build larger
        # conv fusions: +3.5% step throughput measured on v5e (docs/PERF.md)
        opts = ({"xla_tpu_scoped_vmem_limit_kib": "65536"}
                if jax.default_backend() == "tpu" else None)
        if self.mesh is not None:
            step = train_step
            if ax is not None:
                # one collective per grad tree instead of GSPMD's
                # per-call-site partial all-reduces (see __init__ docstring)
                step = jax.shard_map(
                    train_step, mesh=self.mesh,
                    in_specs=(P(), P("data"), P("data"), P("data"),
                              P(), P(), P(), P()),
                    out_specs=(P(), P()), check_vma=False)
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            return jax.jit(
                step, donate_argnums=donate,
                in_shardings=(repl, data, data, data, repl, repl, repl, repl),
                out_shardings=(repl, repl),
                compiler_options=opts,
            )
        return jax.jit(train_step, donate_argnums=donate,
                       compiler_options=opts)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, image_size: Optional[int] = None,
                   e_params_override=None, freeze_pretrained: bool = False
                   ) -> GANTrainState:
        cfg = self.cfg
        m = cfg.model
        hw = image_size or m.image_size
        kg, kd, ke, kh = jax.random.split(rng, 4)
        dummy_img = jnp.zeros((2, hw, hw, m.nch_in), jnp.float32)
        dummy_cond = jnp.zeros((2, m.num_con), jnp.float32)
        # jit the inits: unjitted op-by-op dispatch is pathologically slow on
        # the tunneled TPU platform (minutes for the full-width models)
        g_vars = jax.jit(self.generator.init)(kg, dummy_img, dummy_cond)
        g_params = g_vars["params"]
        g_stats = g_vars.get("batch_stats") if self.use_bn else None
        if self.per_domain:
            d_init = jax.jit(self.discriminator.init)
            d_list = [d_init(jax.random.fold_in(kd, i), dummy_img)["params"]
                      for i in range(m.n_classes)]
            d_params = jax.tree.map(lambda *xs: jnp.stack(xs), *d_list)
        else:
            d_params = jax.jit(self.discriminator.init)(kd,
                                                        dummy_img)["params"]
        e_rngs = {"params": ke, "reparam": jax.random.fold_in(ke, 1)}
        if self.conditional_e:
            onehot = jnp.zeros((2, m.n_classes), jnp.float32)
            e_vars = jax.jit(self.encoder.init)(e_rngs, dummy_img, onehot)
        else:
            e_vars = jax.jit(self.encoder.init)(e_rngs, dummy_img)
        e_params = e_vars["params"]
        e_stats = e_vars.get("batch_stats") if self.use_bn else None
        if e_params_override is not None:
            e_params = {**e_params, **e_params_override}

        hist_target = (L.histogram_target(kh)
                       if cfg.loss.batch_KL > 0 and cfg.loss.hist > 0 else None)
        e_mask = freeze_mask(e_params) if freeze_pretrained else None
        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, d_params=d_params, e_params=e_params,
            g_opt=self.tx.init(g_params), d_opt=self.tx.init(d_params),
            e_opt=self.tx.init(e_params),
            hist_target=hist_target, e_mask=e_mask,
            g_stats=g_stats, e_stats=e_stats)
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            state = jax.device_put(state, repl)
        return state

    def lr_at(self, epoch: int) -> Tuple[float, float, float]:
        """ExponentialLR(gamma) stepped per epoch (util_notebook.py:118-131)."""
        g = self.cfg.train.lr_gamma ** epoch
        t = self.cfg.train
        return t.lr_g * g, t.lr_d * g, t.lr_e * g

    def step(self, state: GANTrainState, batch: Dict[str, Any],
             rng: jax.Array, epoch: int = 0):
        lr_g, lr_d, lr_e = self.lr_at(epoch)
        return self._jit_step(state, batch["image"], batch["source_label"],
                              batch["target_label"], rng,
                              jnp.float32(lr_g), jnp.float32(lr_d),
                              jnp.float32(lr_e))

    # --- inference helpers (the G_transformation surface) ---------------
    def transform(self, state: GANTrainState, images, target_labels,
                  latent=None, rng=None):
        """G_transformation with random or given latents
        (util_notebook.py:134-186 / :510-561)."""
        onehot = self._onehot(target_labels)
        if latent is None:
            latent = jax.random.normal(rng, (images.shape[0],
                                             self.cfg.model.ndim), jnp.float32)
        else:
            latent = jnp.asarray(latent, jnp.float32)
            if latent.ndim == 1:  # one style for the whole batch
                # (the sweep notebooks apply a single latent across a batch,
                # util.py:356-373)
                latent = jnp.broadcast_to(latent,
                                          (images.shape[0], latent.shape[0]))
        cond = jnp.concatenate([onehot, latent], 1)
        return self._jit_G_apply(state.g_params, state.g_stats, images,
                                 cond), latent

    def encode(self, state: GANTrainState, images, labels=None):
        """Encoder forward returning (mu, logvar, class_out_or_None)."""
        onehot = self._onehot(labels) if labels is not None else None
        return self._jit_E_apply(state.e_params, state.e_stats, images,
                                 onehot)
