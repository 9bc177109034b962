"""End-to-end epoch-loop tests on CPU with a tiny model + synthetic data."""

import dataclasses
import json
import os

import numpy as np
import pytest

from srgan_tpu.configs import ExperimentConfig, LossWeights, ModelConfig, TrainConfig
from srgan_tpu.training.loop import train_gan


def tiny_cfg() -> ExperimentConfig:
    model = ModelConfig(image_size=64, g_nch=8, g_res_num=1, d_nch=8,
                        d_num_cls=2, e_nch=8, e_num_cls=2)
    train = TrainConfig(batch_size=8, unrolled_k=1, encoded_feature="mu",
                        train_num=8, val_num=0, test_num=2)
    return ExperimentConfig(name="loop_tiny", model=model, train=train,
                            loss=LossWeights.proposed_kl(cls=1.0),
                            trainer="srgan")


def test_train_gan_end_to_end(tmp_path):
    cfg = tiny_cfg()
    trainer, state = train_gan(
        cfg, str(tmp_path / "run"), epochs=1, sample_grids=False,
        synthetic_per_class=10, echo=False,
        synthetic_dir_override=str(tmp_path / "data"))
    # metrics written
    lines = [json.loads(l) for l in
             open(tmp_path / "run" / "metrics.jsonl")]
    assert lines and np.isfinite(lines[0]["errG"])
    # checkpoint exists (periodic after epoch 0 and the final save both
    # use the epochs-completed convention -> step_1)
    assert os.path.isdir(tmp_path / "run" / "ckpt" / "step_1")
    assert not os.path.isdir(tmp_path / "run" / "ckpt" / "step_0")


def test_train_gan_resume(tmp_path):
    cfg = tiny_cfg()
    out = str(tmp_path / "run")
    train_gan(cfg, out, epochs=1, sample_grids=False, synthetic_per_class=10,
              echo=False, synthetic_dir_override=str(tmp_path / "data"))
    # resume continues from the final checkpoint
    trainer, state = train_gan(
        cfg, out, epochs=2, sample_grids=False, synthetic_per_class=10,
        echo=False, resume=True,
        synthetic_dir_override=str(tmp_path / "data"))
    assert int(state.step) >= 2


def test_grid_every_epochs_thins_progress_pngs(tmp_path):
    """VERDICT r4 weak-5: long evidence runs need a grid-cadence knob so a
    120-epoch run doesn't emit 480 PNGs; default keeps the reference's
    ~3x/epoch cadence (nb01 cell 22)."""
    cfg = tiny_cfg()
    out = tmp_path / "run"
    train_gan(cfg, str(out), epochs=2, sample_grids=True,
              grid_every_epochs=2, synthetic_per_class=10, echo=False,
              synthetic_dir_override=str(tmp_path / "data"))
    pngs = sorted(p.name for p in out.glob("progress_*.png"))
    assert pngs, "epoch 0 must still render grids"
    assert all(p.startswith("progress_e000") for p in pngs), pngs


def test_train_gan_pretrained_requires_ckpt(tmp_path):
    cfg = dataclasses.replace(tiny_cfg(), pretrained_encoder=True)
    with pytest.raises(ValueError, match="classifier_ckpt"):
        train_gan(cfg, str(tmp_path / "run"), epochs=1, sample_grids=False,
                  synthetic_per_class=10, echo=False,
                  synthetic_dir_override=str(tmp_path / "data"))


def test_nb05_pretrain_then_train_end_to_end(tmp_path):
    """The full notebook-04 -> notebook-05 pipeline: pretrain the
    Encoder_classifier on synthetic data, keep the best checkpoint, feed it
    into train_gan with pretrained_encoder=True, and assert (a) the
    classifier learned above chance, (b) the transferred trunk + fcclass are
    bit-frozen through GAN training, (c) fcmean trains, (d) the encoder's
    class head still classifies above chance after GAN training."""
    import jax
    import jax.numpy as jnp

    from srgan_tpu.configs import ClassifierConfig
    from srgan_tpu.data import DataLoader, FaceDataset, make_synthetic_celeba
    from srgan_tpu.training.classifier import ClassifierTrainer
    from srgan_tpu.utils.checkpoint import save_checkpoint

    model = tiny_cfg().model
    data_root, attr_file = make_synthetic_celeba(str(tmp_path / "data"),
                                                 n_per_class=24)
    ccfg = ClassifierConfig(model=model, epochs=6, lr=1e-3, batch_size=16,
                            test_interval=2, train_num=16, val_num=4,
                            test_num=4)
    common = dict(attr_file=attr_file, train_num=16, val_num=4, test_num=4,
                  image_size=model.image_size)
    train_ds = FaceDataset(data_root, data_type="train", **common)
    val_ds = FaceDataset(data_root, data_type="val", **common)

    ctrainer = ClassifierTrainer(ccfg)
    cstate = ctrainer.init_state(jax.random.PRNGKey(0))

    def batches(ds, shuffle):
        def it():
            dl = DataLoader(ds, batch_size=16, shuffle=shuffle,
                            drop_last=shuffle, sample_targets=False, seed=0)
            for b in dl:
                yield b["image"], b["source_label"]
        return it

    cstate, best_params, best_acc = ctrainer.fit(
        cstate, batches(train_ds, True), batches(val_ds, False))
    # the synthetic classes are separated by mean color: must beat chance
    assert best_acc > 0.5, best_acc
    save_checkpoint(str(tmp_path / "clf" / "classifier_best"),
                    jax.device_get(best_params))

    cfg = dataclasses.replace(tiny_cfg(), pretrained_encoder=True)
    trainer, state = train_gan(
        cfg, str(tmp_path / "run"), epochs=1, sample_grids=False,
        synthetic_per_class=10, echo=False,
        classifier_ckpt=str(tmp_path / "clf" / "classifier_best"),
        synthetic_dir_override=str(tmp_path / "gan_data"))

    # (b) frozen transfer: trunk + fcclass identical to the classifier ckpt
    post = jax.device_get(state.e_params)
    for key in best_params:
        for (pa, pb) in zip(jax.tree.leaves(best_params[key]),
                            jax.tree.leaves(post[key])):
            np.testing.assert_array_equal(pa, pb, err_msg=key)
    # (c) fcmean trained (it feeds the style losses)
    init_state = trainer.init_state(
        jax.random.PRNGKey(cfg.train.seed),
        e_params_override=best_params, freeze_pretrained=True)
    assert not np.allclose(post["fcmean"]["kernel"],
                           np.asarray(init_state.e_params["fcmean"]["kernel"]))

    # (d) encoder class head still classifies above chance
    correct = total = 0
    dl = DataLoader(val_ds, batch_size=16, shuffle=False, drop_last=False,
                    sample_targets=False)
    for b in dl:
        _, _, cls_out = trainer.encode(state, jnp.asarray(b["image"]))
        preds = np.argmax(np.asarray(cls_out), axis=1)
        correct += int((preds == np.asarray(b["source_label"])).sum())
        total += len(preds)
    assert correct / total > 0.5, (correct, total)


def test_vgg_finetune_job_steps_and_improves_loss(tmp_path):
    """The notebook-B job (training/vgg_finetune.py): a few fine-tune steps
    on synthetic data must run, update BN stats, and reduce the loss."""
    import jax
    import numpy as np

    from srgan_tpu.training.vgg_finetune import VGGFinetuneTrainer

    # the job's real lr (notebook B used 5e-5); larger rates explode a
    # random-init VGG19-BN within a step
    trainer = VGGFinetuneTrainer(n_classes=4, lr=5e-5)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, 4)
    # strong class-dependent color so a few steps suffice
    base = np.eye(4, dtype=np.float32)[labels] @ np.array(
        [[0.8, -0.8, 0.0], [-0.8, 0.8, 0.0], [0.0, 0.8, -0.8],
         [-0.8, 0.0, 0.8]], np.float32)
    imgs = np.clip(base[:, None, None, :]
                   + rng.normal(0, 0.1, (4, 128, 128, 3)), -1, 1
                   ).astype(np.float32)

    bs_before = jax.tree.leaves(state.batch_stats)[0].copy()
    losses = []
    for _ in range(5):
        state, m = trainer.step(state, imgs, labels)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0], losses
    # BN running stats actually updated
    assert not np.allclose(jax.tree.leaves(state.batch_stats)[0], bs_before)
    # eval path runs
    acc = trainer.evaluate(state, [(imgs, labels)])
    assert 0.0 <= acc <= 1.0


def test_sigterm_checkpoints_and_stops(tmp_path, monkeypatch):
    """Preemption safety: a stop signal mid-training produces a resumable
    checkpoint at the completed-epoch boundary and exits the loop."""
    import signal
    import os as _os

    cfg = tiny_cfg()
    out = str(tmp_path / "run")

    # deliver SIGTERM deterministically from inside the loop (first metrics
    # log of epoch 0) — the loop's handler sets a flag, the epoch finishes,
    # then the loop checkpoints and stops
    from srgan_tpu.utils import metrics as metrics_mod
    orig_log = metrics_mod.MetricLogger.log
    fired = []

    def log_and_kill(self, *a, **k):
        if not fired:
            fired.append(1)
            _os.kill(_os.getpid(), signal.SIGTERM)
        return orig_log(self, *a, **k)

    monkeypatch.setattr(metrics_mod.MetricLogger, "log", log_and_kill)
    trainer, state = train_gan(
        cfg, out, epochs=50, sample_grids=False, synthetic_per_class=10,
        echo=False, synthetic_dir_override=str(tmp_path / "data"))
    # stopped early with a checkpoint present
    assert int(state.step) < 50 * 4
    ckpts = sorted(os.listdir(tmp_path / "run" / "ckpt"))
    assert ckpts, "no checkpoint written on stop"
    # resume works from it
    trainer, state2 = train_gan(
        cfg, out, epochs=int(ckpts[-1].rsplit("_", 1)[1]) + 1,
        sample_grids=False, synthetic_per_class=10, echo=False, resume=True,
        synthetic_dir_override=str(tmp_path / "data"))
    assert int(state2.step) > 0
    # the metrics.jsonl step column must stay monotonic across the resume
    # (a resumed run used to restart it at 1)
    import json as _json
    logged = [_json.loads(l)["step"]
              for l in open(os.path.join(out, "metrics.jsonl"))]
    assert logged == sorted(logged) and len(set(logged)) == len(logged), (
        f"non-monotonic step column across resume: {logged}")


def test_resume_with_different_config_refuses(tmp_path):
    """--resume must not silently replace the run's config.json record
    (round-3 advisor finding): differing configs are an error."""
    cfg = tiny_cfg()
    out = str(tmp_path / "run")
    train_gan(cfg, out, epochs=1, sample_grids=False, synthetic_per_class=10,
              echo=False, synthetic_dir_override=str(tmp_path / "data"))
    other = dataclasses.replace(cfg, name="loop_other")
    with pytest.raises(ValueError, match="resume with a different config"):
        train_gan(other, out, epochs=2, sample_grids=False,
                  synthetic_per_class=10, echo=False, resume=True,
                  synthetic_dir_override=str(tmp_path / "data"))
    # identical config still resumes fine
    train_gan(cfg, out, epochs=2, sample_grids=False, synthetic_per_class=10,
              echo=False, resume=True,
              synthetic_dir_override=str(tmp_path / "data"))
    # run-length extension is exempt: a differing cfg.train.epochs is the
    # re-run-the-training-cell workflow, not a config change
    longer = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=cfg.train.epochs + 5))
    trainer, state = train_gan(
        longer, out, epochs=3, sample_grids=False, synthetic_per_class=10,
        echo=False, resume=True, synthetic_dir_override=str(tmp_path / "data"))
    assert int(state.step) >= 3


def test_load_config_warns_on_conflicting_preset(tmp_path):
    """Passing --preset alongside a run dir that has a differing config.json
    warns which one wins (round-3 advisor finding)."""
    import warnings

    from srgan_tpu.configs import load_config_for_ckpt, save_config

    cfg = tiny_cfg()
    save_config(cfg, str(tmp_path))
    with pytest.warns(UserWarning, match="differ"):
        got = load_config_for_ckpt(str(tmp_path), "03_srgan_nopretraining")
    assert got == cfg
    # no warning when no preset is passed
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert load_config_for_ckpt(str(tmp_path)) == cfg


def test_preset_registry_accepts_05_config_name():
    """srgan_full() names its config '05_srgan_pretrained'; users who read
    that name out of a run's config.json and pass it back as --preset must
    not get a KeyError, so the registry carries it as an alias.  (The nb01
    presets intentionally use short registry keys while their config names
    encode hyperparameters reference-filename style — no alias needed there
    because the name never doubles as a lookup key in our CLIs' examples.)"""
    from srgan_tpu.configs import PRESETS

    assert "05_srgan_pretrained" in PRESETS
    assert PRESETS["05_srgan_pretrained"]() == PRESETS["05_srgan_full"]()
    assert PRESETS["05_srgan_full"]().name == "05_srgan_pretrained"
