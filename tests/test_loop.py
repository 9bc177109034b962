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
    # checkpoints exist (epoch 0 + final)
    assert os.path.isdir(tmp_path / "run" / "ckpt" / "step_0")
    assert os.path.isdir(tmp_path / "run" / "ckpt" / "step_1")


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


def test_train_gan_pretrained_requires_ckpt(tmp_path):
    cfg = dataclasses.replace(tiny_cfg(), pretrained_encoder=True)
    with pytest.raises(ValueError, match="classifier_ckpt"):
        train_gan(cfg, str(tmp_path / "run"), epochs=1, sample_grids=False,
                  synthetic_per_class=10, echo=False,
                  synthetic_dir_override=str(tmp_path / "data"))
