"""norm_type="batch" through the full trainer: CBBNorm/BatchNorm running
stats threaded through the jitted step (the reference's selectable-but-unused
get_norm_layer("batch") path, model.py:173-182)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.configs import ExperimentConfig, LossWeights, ModelConfig, TrainConfig
from srgan_tpu.training import GANTrainer

HW = 32


def bn_cfg(trainer="srgan") -> ExperimentConfig:
    model = ModelConfig(image_size=HW, g_nch=8, g_res_num=1, d_nch=8,
                        d_num_cls=2, e_nch=8, e_num_cls=2, norm_type="batch")
    train = TrainConfig(batch_size=8, unrolled_k=1, encoded_feature="mu")
    return ExperimentConfig(name="bn", model=model, train=train,
                            loss=LossWeights.proposed_kl(cls=1.0),
                            trainer=trainer)


def make_batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 4, b)
    return {"image": jnp.asarray(rng.uniform(-1, 1, (b, HW, HW, 3))
                                 .astype(np.float32)),
            "source_label": jnp.asarray(src),
            "target_label": jnp.asarray((src + rng.integers(1, 4, b)) % 4)}


def test_batch_mode_step_and_stats():
    cfg = bn_cfg()
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    assert state.g_stats is not None and state.e_stats is not None
    # BN stats start at mean 0 / var 1
    assert all(float(jnp.abs(x).max()) in (0.0, 1.0) for x in
               jax.tree.leaves(state.g_stats))

    new_state, metrics = t.step(state, make_batch(), jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # running stats moved (multiple G/E forwards updated them)
    moved = any(not np.allclose(a, b) for a, b in
                zip(jax.tree.leaves(state.g_stats),
                    jax.tree.leaves(new_state.g_stats)))
    assert moved, "generator batch stats should update"
    moved_e = any(not np.allclose(a, b) for a, b in
                  zip(jax.tree.leaves(state.e_stats),
                      jax.tree.leaves(new_state.e_stats)))
    assert moved_e, "encoder batch stats should update"


def test_batch_mode_inference_uses_running_stats():
    cfg = bn_cfg()
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    batch = make_batch()
    state, _ = t.step(state, batch, jax.random.PRNGKey(1))
    fake, _ = t.transform(state, batch["image"], batch["target_label"],
                          rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(fake)).all()
    assert float(jnp.max(jnp.abs(fake))) <= 1.0
    # eval-mode output must not depend on batch composition (running stats)
    one = t.transform(state, batch["image"][:1], batch["target_label"][:1],
                      latent=jnp.zeros((1, 8)))[0]
    full = t.transform(state, batch["image"], batch["target_label"],
                       latent=jnp.zeros((8, 8)))[0]
    np.testing.assert_allclose(np.asarray(one[0]), np.asarray(full[0]),
                               atol=1e-4)


def test_instance_mode_state_has_no_stats():
    cfg = dataclasses.replace(
        bn_cfg(), model=dataclasses.replace(bn_cfg().model,
                                            norm_type="instance"))
    t = GANTrainer(cfg, donate=False)
    state = t.init_state(jax.random.PRNGKey(0), image_size=HW)
    assert state.g_stats is None and state.e_stats is None
