"""Epoch-loop drivers — the notebook training cells as first-class functions.

``train_gan`` mirrors the nb01/02/03/05 driver loop (cell 22/24): per-epoch
iteration over a shuffled loader, target labels sampled per batch, loss
tracking, a progress sample-grid ~3x per epoch, checkpoints every 3 epochs —
plus what the reference lacks: JSONL metrics, a throughput meter, orbax
checkpoints with optimizer state, and device prefetch.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from srgan_tpu.configs import ExperimentConfig
from srgan_tpu.data import DataLoader, FaceDataset, make_synthetic_celeba
from srgan_tpu.data.dataset import LABEL_DESCRIPTION
from srgan_tpu.data.loader import prefetch_to_device
from srgan_tpu.training.gan import GANTrainer
from srgan_tpu.utils.checkpoint import (
    import_torch_classifier,
    load_torch_state_dict,
    restore_checkpoint,
    save_checkpoint,
)
from srgan_tpu.utils.metrics import MetricLogger, StepTimer


def build_datasets(cfg: ExperimentConfig, data_root: Optional[str] = None,
                   attr_file: Optional[str] = None,
                   label_root: Optional[str] = None,
                   synthetic_dir: Optional[str] = None,
                   synthetic_per_class: int = 16):
    if data_root is None:
        synthetic_dir = synthetic_dir or "/tmp/srgan_tpu_synthetic"
        data_root, attr_file = make_synthetic_celeba(
            synthetic_dir, n_per_class=synthetic_per_class)
        # small synthetic fixture: don't let the preset's test_num swallow it
        if cfg.train.test_num >= synthetic_per_class:
            import dataclasses as _dc
            cfg = _dc.replace(cfg, train=_dc.replace(
                cfg.train, test_num=max(synthetic_per_class // 4, 1)))
    t = cfg.train
    common = dict(attr_file=attr_file, label_root=label_root,
                  train_num=t.train_num, val_num=t.val_num,
                  test_num=t.test_num, image_size=cfg.model.image_size)
    train = FaceDataset(data_root, data_type="train", **common)
    sample = FaceDataset(data_root, data_type="test", **common)
    return train, sample


def load_pretrained_encoder(path: str, cfg: ExperimentConfig):
    """nb05 cell 22: load the nb04 classifier checkpoint into the encoder
    (strict=False semantics — trunk + fcclass transfer, fcmean/fcvar fresh).
    Accepts a torch .pth or an orbax dir."""
    if path.endswith(".pth"):
        sd = load_torch_state_dict(path)
        return import_torch_classifier(sd, num_cls=cfg.model.e_num_cls)
    return restore_checkpoint(path, None)


def train_gan(cfg: ExperimentConfig, out_dir: str,
              data_root: Optional[str] = None,
              attr_file: Optional[str] = None,
              label_root: Optional[str] = None,
              mesh=None,
              grad_sync: str = "auto",
              epochs: Optional[int] = None,
              classifier_ckpt: Optional[str] = None,
              sample_grids: bool = True,
              grid_every_epochs: int = 1,
              checkpoint_every: int = 3,
              synthetic_per_class: int = 16,
              echo: bool = True,
              resume: bool = False,
              profile_dir: Optional[str] = None,
              debug_nans: bool = False,
              synthetic_dir_override: Optional[str] = None):
    if debug_nans:
        # jax-native replacement for the sanitizers the reference lacks
        # (SURVEY.md §5): fail fast on the first non-finite value
        jax.config.update("jax_debug_nans", True)
    os.makedirs(out_dir, exist_ok=True)
    from srgan_tpu.configs import config_from_dict, config_to_dict, save_config
    cfg_json = os.path.join(out_dir, "config.json")
    if resume and os.path.exists(cfg_json):
        # the original run record is what downstream CLIs rebuild the model
        # from — never silently replace it on --resume
        import dataclasses as _dc
        import json
        stored = config_from_dict(json.load(open(cfg_json)))
        # epochs is a run-length, not a model/trainer identity: extending a
        # finished run (--resume --epochs 240 over a 120-epoch record) is the
        # reference's own re-run-the-training-cell workflow, so it is exempt
        # from the equality guard.  The stored record keeps the original
        # epochs value.
        stored_cmp = _dc.replace(
            stored, train=_dc.replace(stored.train, epochs=cfg.train.epochs))
        if stored_cmp != cfg:
            raise ValueError(
                f"--resume with a different config than {cfg_json} "
                f"(stored '{stored.name}' != requested '{cfg.name}' or "
                "overrides differ); re-run with the original preset/"
                "overrides, or use a fresh --out dir")
    else:
        save_config(cfg, out_dir)   # downstream CLIs auto-load this
    train_ds, sample_ds = build_datasets(
        cfg, data_root, attr_file, label_root,
        synthetic_dir=synthetic_dir_override,
        synthetic_per_class=synthetic_per_class)
    loader = DataLoader(train_ds, batch_size=cfg.train.batch_size,
                        drop_last=cfg.train.drop_last,
                        classes=tuple(range(cfg.model.n_classes)),
                        seed=cfg.train.seed)
    if len(loader) == 0:
        raise ValueError(
            f"dataset ({len(train_ds)}) smaller than batch "
            f"({cfg.train.batch_size}); lower batch_size or add data")

    trainer = GANTrainer(cfg, mesh=mesh, grad_sync=grad_sync)
    e_override = None
    if cfg.pretrained_encoder:
        if classifier_ckpt is None:
            raise ValueError("pretrained_encoder config needs "
                             "classifier_ckpt (run pretrain_classifier "
                             "first, nb04 equivalent)")
        e_override = load_pretrained_encoder(classifier_ckpt, cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed),
                               e_params_override=e_override,
                               freeze_pretrained=cfg.pretrained_encoder)
    start_epoch = 0
    if resume:
        import glob as _glob
        ckpts = sorted(_glob.glob(os.path.join(out_dir, "ckpt", "step_*")),
                       key=lambda p: int(p.rsplit("_", 1)[1]))
        if ckpts:
            start_epoch = int(ckpts[-1].rsplit("_", 1)[1])
            state = restore_checkpoint(os.path.join(out_dir, "ckpt"),
                                       jax.device_get(state),
                                       step=start_epoch)
            print(f"resumed from epoch {start_epoch} "
                  "(checkpoint step = epochs completed; pre-0.3 checkpoints "
                  "used step = last epoch index and will re-train one epoch)")

    logger = MetricLogger(os.path.join(out_dir, "metrics.jsonl"), echo=echo)
    timer = StepTimer()
    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    epochs = epochs if epochs is not None else cfg.train.epochs
    interval = max(len(loader) // 3, 1)

    # preemption safety: on SIGTERM/SIGINT finish the current step, save a
    # resumable checkpoint, and exit cleanly (--resume picks it up).  The
    # reference loses up to 3 epochs on any interruption.
    stop_requested = []

    def _request_stop(signum, frame):
        stop_requested.append(signum)

    import signal
    old_handlers = {}
    try:
        for sig in (signal.SIGTERM, signal.SIGINT):
            old_handlers[sig] = signal.signal(sig, _request_stop)
    except ValueError:
        pass    # not in the main thread (e.g. under a test runner)

    # the state's own step counter survives checkpoint/restore, so logged
    # steps stay monotonic across --resume (a resumed run used to restart
    # the metrics.jsonl step column at 1)
    step = int(jax.device_get(state.step))
    # advertise chip occupancy for the loop's duration so bench.py can
    # refuse/annotate instead of recording a contended number (entered
    # manually to join the existing try/finally)
    from srgan_tpu.utils.chiplock import hold_chip
    chip = hold_chip(f"train_gan {out_dir}")
    chip.__enter__()
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        for epoch in range(start_epoch, epochs):
            timer.reset()
            for it, batch in enumerate(prefetch_to_device(loader, mesh)):
                rng, sub = jax.random.split(rng)
                state, metrics = trainer.step(state, batch, sub, epoch)
                timer.update(cfg.train.batch_size)
                step += 1
                if it % interval == 0:
                    # sync (scalar fetch) so the throughput meter is honest
                    logger.log(metrics, epoch=epoch, step=step,
                               images_per_sec=timer.images_per_sec)
                    # grid at every metric interval = ~3x/epoch, the
                    # reference's cadence (nb01 cell 22 renders alongside
                    # each loss append)
                    # grid_every_epochs > 1 thins long evidence runs (a
                    # 120-epoch run at the default cadence emits 480 PNGs)
                    # while keeping the reference's 3x/epoch default
                    if (sample_grids and len(sample_ds)
                            and epoch % max(grid_every_epochs, 1) == 0):
                        from srgan_tpu.utils.viz import (
                            training_progress_grid)
                        fig = training_progress_grid(
                            trainer, state, sample_ds,
                            min(53, len(sample_ds) - 1), LABEL_DESCRIPTION,
                            rng=sub)
                        fig.savefig(os.path.join(
                            out_dir, f"progress_e{epoch:03d}_i{it:05d}.png"))
                        import matplotlib.pyplot as plt
                        plt.close(fig)
            # step = epochs COMPLETED, matching the preemption/final saves
            # and the resume logic (resume re-enters at epoch == step)
            if checkpoint_every and epoch % checkpoint_every == 0:
                save_checkpoint(os.path.join(out_dir, "ckpt"), state,
                                step=epoch + 1)
            if stop_requested:
                print(f"signal {stop_requested[0]} received: checkpointing "
                      f"at epoch {epoch + 1} and stopping")
                save_checkpoint(os.path.join(out_dir, "ckpt"), state,
                                step=epoch + 1)
                break
    finally:
        # restore handlers on ANY exit (exceptions included) so the calling
        # process — notebooks, tests — keeps a working Ctrl-C
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        if profile_dir:
            jax.profiler.stop_trace()
        logger.close()
        chip.__exit__(None, None, None)
    if not stop_requested:
        save_checkpoint(os.path.join(out_dir, "ckpt"), state, step=epochs)
    return trainer, state
