"""Experiment configuration.

The reference has no config system; hyperparameters live in "adjustable
parameter" notebook cells plus the ``lbd`` loss-weight dict
(reference notebook/01 cells 13/16/18, util_notebook.py:76-99).  Here the same
knobs — same names, same defaults — are real dataclasses, with one preset per
shipped experiment arm (BASELINE.json "configs").
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """The reference's ``lbd`` dict (notebook/01 cell 16, notebook/02-05 cell 16).

    Gating semantics replicate the reference exactly, including the quirk that
    ``corr_enc`` and ``hist`` only apply when ``batch_KL > 0``
    (util_notebook.py:314-332, :644-662).
    """

    cycle: float = 5.0      # cycle-consistency L1
    idt: float = 5.0        # identity L1
    reg: float = 0.5        # style regression
    idt_reg: float = 0.5    # regression for identity images
    KL: float = 0.0         # conventional per-sample VAE KL
    batch_KL: float = 10.0  # batch-distribution KL
    corr_enc: float = 100.0  # correlation loss (active only if batch_KL > 0)
    hist: float = 100.0     # histogram-imitation loss (active only if batch_KL > 0)
    cls: float = 1.0        # aux-classifier loss ("class" in the reference dict)

    @classmethod
    def conventional_kl(klass, **kw) -> "LossWeights":
        """restriction_type == "conventionalKL" (notebook/01 cell 16)."""
        return klass(KL=0.1, batch_KL=0.0, corr_enc=0.0, hist=0.0, **kw)

    @classmethod
    def proposed_kl(klass, **kw) -> "LossWeights":
        """restriction_type == "proposedKL" (notebook/01 cell 16)."""
        return klass(KL=0.0, batch_KL=10.0, corr_enc=100.0, hist=100.0, **kw)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (notebook/01 cell 13; identical in 02/03/05)."""

    image_size: int = 128
    nch_in: int = 3          # input image channels
    ndim: int = 8            # style-latent dimension
    n_classes: int = 4       # domains (male/female x smiling/not)

    # generator (reference model.py:203-249)
    g_nch: int = 64
    g_reduce: int = 2
    g_num_cls: int = 2       # down/up conv blocks
    g_res_num: int = 6
    norm_type: str = "instance"   # "instance" | "batch"

    # discriminator (reference model.py:255-346)
    d_nch: int = 64
    d_reduce: int = 2
    d_num_cls: int = 4       # conv blocks in the D trunk

    # encoder (reference model.py:352-508)
    e_nch: int = 64
    e_num_cls: int = 4       # BasicBlocks in the encoder trunk

    @property
    def num_con(self) -> int:
        """Conditioning dim fed to the generator: one-hot class + style latent."""
        return self.n_classes + self.ndim


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters.

    NOTE (quirk ledger #3): the notebooks declare lr_G=2e-4 / lr_E=1e-3 but call
    ``opt_sche_initialization()`` with no args whose default is 1e-4 for all
    three models (util_notebook.py:101, :484) — so the reference actually
    trains everything at 1e-4.  We default to the *actual* behavior.
    """

    batch_size: int = 128
    epochs: int = 31
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    lr_e: float = 1e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    lr_gamma: float = 0.95       # ExponentialLR per-epoch decay
    unrolled_k: int = 5          # UnrolledGAN k
    # UnrolledGAN restore semantics.  The reference INTENDS to snapshot D
    # after the first of the k updates and restore it afterwards
    # (util_notebook.py:393-410 / :720-727), but its snapshot is
    # ``D.state_dict()`` whose tensors alias the live parameters — torch
    # optimizers update them in place, so ``load_state_dict(paramD)`` copies
    # the current values onto themselves and D silently keeps all k updates
    # (verified empirically, tests/test_trainer_parity.py).  False (default)
    # replicates the reference's ACTUAL behavior; True implements the
    # documented intent (restore params to the post-first-update snapshot).
    unrolled_restore: bool = False
    encoded_feature: str = "mu"  # "latent" | "mu" — what E feeds G / reg target
    train_num: int = 10000       # images per class
    val_num: int = 0
    test_num: int = 100
    seed: int = 0
    # TPU-native knobs (no reference equivalent)
    compute_dtype: str = "float32"   # "float32" | "bfloat16" for conv compute
    drop_last: bool = True           # static shapes for XLA


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model: ModelConfig
    train: TrainConfig
    loss: LossWeights
    trainer: str = "srgan"     # "singlegan" | "singlegan_solo" | "srgan"
    pretrained_encoder: bool = False   # load + freeze classifier trunk (nb05)

    @property
    def ref_label(self) -> np.ndarray:
        """One-hot reference label matrix (``ref_label = np.eye(4)``, nb01 cell 13)."""
        return np.eye(self.model.n_classes, dtype=np.float32)


def _base_model() -> ModelConfig:
    return ModelConfig()


def conventional_singlegan(unrolled_k: int = 5, idt_reg: float = 0.0,
                           restriction: str = "conventionalKL") -> ExperimentConfig:
    """Notebook 01: SingleGAN baseline with 4 per-domain multi-scale Ds.

    The three shipped arms (util_notebook.py:10-18):
      ("conventionalKL", k=1, idt_reg=0), ("preposedKL", 1, 0), ("preposedKL", 5, 0.5).
    """
    lw = (LossWeights.conventional_kl(idt_reg=idt_reg, cls=0.0)
          if restriction == "conventionalKL"
          else LossWeights.proposed_kl(idt_reg=idt_reg, cls=0.0))
    enc_feat = "latent" if restriction == "conventionalKL" else "mu"
    return ExperimentConfig(
        name=f"01_singlegan_{restriction}_k{unrolled_k}_idtreg{idt_reg}",
        model=_base_model(),
        train=TrainConfig(unrolled_k=unrolled_k, encoded_feature=enc_feat),
        loss=lw,
        trainer="singlegan",
    )


def singlegan_solod() -> ExperimentConfig:
    """Notebook 02: SingleGAN with a solo (StarGAN-style) D + aux classifier."""
    return ExperimentConfig(
        name="02_singlegan_soloD",
        model=_base_model(),
        train=TrainConfig(encoded_feature="mu"),
        loss=LossWeights.proposed_kl(cls=1.0),
        trainer="singlegan_solo",
    )


def srgan_nopretraining() -> ExperimentConfig:
    """Notebook 03: SRGAN (unconditional encoder), no pretraining.

    NB: the shipped notebook leaves debug values batch_size=16/train_num=10 in
    cell 18 (quirk ledger #5); the real runs used 128/10000 — we default to the
    real values.
    """
    return ExperimentConfig(
        name="03_srgan_nopretraining",
        model=_base_model(),
        train=TrainConfig(encoded_feature="mu"),
        loss=LossWeights.proposed_kl(cls=1.0),
        trainer="srgan",
    )


def srgan_full() -> ExperimentConfig:
    """Notebook 05: full SRGAN with the classification-pretrained encoder."""
    return ExperimentConfig(
        name="05_srgan_pretrained",
        model=_base_model(),
        train=TrainConfig(encoded_feature="mu"),
        loss=LossWeights.proposed_kl(cls=1.0),
        trainer="srgan",
        pretrained_encoder=True,
    )


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    """Notebook 04 encoder-classifier pretraining job (cells 15/18/20)."""

    model: ModelConfig = dataclasses.field(default_factory=_base_model)
    epochs: int = 301
    lr: float = 1e-4
    lr_gamma: float = 0.99
    batch_size: int = 512
    test_interval: int = 3
    train_num: int = 10000
    val_num: int = 1000
    test_num: int = 100
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class PRDCConfig:
    """Notebook 06 / evaluation.py harness (evaluation.py:38-110)."""

    nearest_k: int = 5
    batch: int = 32
    feature_extractors: Tuple[str, ...] = (
        "vgg-initialization", "vgg-ImageNet", "vgg-CelebA")
    metrics: Tuple[str, ...] = ("precision", "recall", "density", "coverage")


def config_to_dict(cfg: ExperimentConfig) -> dict:
    return dataclasses.asdict(cfg)


def config_from_dict(d: dict) -> ExperimentConfig:
    return ExperimentConfig(
        name=d["name"],
        model=ModelConfig(**d["model"]),
        train=TrainConfig(**d["train"]),
        loss=LossWeights(**d["loss"]),
        trainer=d.get("trainer", "srgan"),
        pretrained_encoder=d.get("pretrained_encoder", False),
    )


def save_config(cfg: ExperimentConfig, out_dir: str) -> str:
    """Persist the exact experiment config next to a run's artifacts so
    downstream CLIs (sample_sweep / evaluate_prdc / serve / export) can
    rebuild the matching model without the user re-specifying preset +
    overrides.  The reference has no such record — its notebooks ARE the
    config."""
    import json
    import os

    path = os.path.join(out_dir, "config.json")
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=1)
    return path


def load_config_for_ckpt(ckpt_path: str, preset: str | None = None
                         ) -> ExperimentConfig:
    """Resolve the config for a checkpoint dir: a ``config.json`` saved by
    train.py (in the ckpt dir or its parent run dir) wins — it reflects the
    run's actual overrides; otherwise fall back to the named preset."""
    import json
    import os

    p = os.path.abspath(ckpt_path)
    for cand_dir in (p, os.path.dirname(p)):
        cand = os.path.join(cand_dir, "config.json")
        if os.path.exists(cand):
            cfg = config_from_dict(json.load(open(cand)))
            if preset is not None and cfg != PRESETS[preset]():
                import warnings
                warnings.warn(
                    f"both {cand} and --preset {preset} given and they "
                    f"differ: using the stored run config '{cfg.name}' "
                    "(it reflects the run's actual overrides)")
            return cfg
    if preset is None:
        raise ValueError(
            f"no config.json found near {ckpt_path} and no --preset given")
    return PRESETS[preset]()


PRESETS = {
    "01_conventional_singlegan": lambda: conventional_singlegan(1, 0.0, "conventionalKL"),
    "01_proposed_singlegan_k1": lambda: conventional_singlegan(1, 0.0, "proposedKL"),
    "01_proposed_singlegan_k5": lambda: conventional_singlegan(5, 0.5, "proposedKL"),
    "02_singlegan_solod": singlegan_solod,
    "03_srgan_nopretraining": srgan_nopretraining,
    "05_srgan_full": srgan_full,
    # alias: the config produced by srgan_full is *named*
    # "05_srgan_pretrained" (configs.py:187), so accept that name here too —
    # otherwise a user reading it out of a run's config.json and passing it
    # back as --preset gets a KeyError
    "05_srgan_pretrained": srgan_full,
}


def get_adjustable_parameters(notebook_no: int = 1):
    """The reference's experiment registry (util_notebook.py:10-26) as a
    pandas table; None for notebooks whose registry was None."""
    import numpy as np
    import pandas as pd

    if notebook_no == 1:
        models = [["conventionalKL", 1, 0],
                  ["preposedKL", 1, 0],
                  ["preposedKL", 5, 0.5]]
        return pd.DataFrame(np.array(models),
                            columns=["restriction_type", "unrolled_k",
                                     "idt_reg"])
    return None
