#!/usr/bin/env python
"""Latent sample sweep + GIF/grid export (the reference's test notebooks).

Loads a trained checkpoint, sweeps latent codes per target class for a chosen
source image, writes per-class GIFs and a grid PNG — the capability of the
missing ``*-test_*.ipynb`` notebooks (get_samples + save_gif,
util_notebook.py:858 / util.py:356).
"""

import argparse
import os
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from srgan_tpu.configs import PRESETS, load_config_for_ckpt
from srgan_tpu.data import FaceDataset, make_synthetic_celeba
from srgan_tpu.data.dataset import LABEL_DESCRIPTION
from srgan_tpu.training import GANTrainer
from srgan_tpu.utils.checkpoint import restore_checkpoint
from srgan_tpu.utils.viz import get_samples, save_gif, training_progress_grid


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS),
                    help="fallback when the run dir has no config.json")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--ckpt-step", type=int)
    ap.add_argument("--out", required=True)
    ap.add_argument("--data-root")
    ap.add_argument("--attr-file")
    ap.add_argument("--label-root")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--index", type=int, default=0)
    ap.add_argument("--num-latents", type=int, default=24)
    ap.add_argument("--sweep-dim", type=int, default=None,
                    help="sweep one latent dim -8..8 instead of random draws")
    args = ap.parse_args()

    cfg = load_config_for_ckpt(args.ckpt, args.preset)
    data_root, attr_file = args.data_root, args.attr_file
    if args.synthetic or not data_root:
        data_root, attr_file = make_synthetic_celeba(
            "/tmp/srgan_tpu_synthetic", n_per_class=16)
    test_ds = FaceDataset(data_root, attr_file=attr_file,
                          label_root=args.label_root, data_type="test",
                          train_num=cfg.train.train_num, val_num=0,
                          test_num=cfg.train.test_num,
                          image_size=cfg.model.image_size)

    trainer = GANTrainer(cfg)
    # pretrained-encoder configs carry an e_mask tree in their train state;
    # build the restore target with the same structure
    target = jax.device_get(trainer.init_state(
        jax.random.PRNGKey(0), freeze_pretrained=cfg.pretrained_encoder))
    state = restore_checkpoint(args.ckpt, target, step=args.ckpt_step)

    if args.sweep_dim is not None:
        latent = np.zeros((args.num_latents, cfg.model.ndim), np.float32)
        latent[:, args.sweep_dim] = np.linspace(-8, 8, args.num_latents)
    else:
        latent = np.random.default_rng(0).standard_normal(
            (args.num_latents, cfg.model.ndim)).astype(np.float32)

    os.makedirs(args.out, exist_ok=True)
    data, label = get_samples(trainer, state, test_ds, args.index, latent)
    for cls, images in data["target"].items():
        save_gif(images, os.path.join(
            args.out, f"index{args.index}_class{cls}.gif"))
        np.save(os.path.join(args.out, f"latent_mu_class{cls}.npy"),
                label["latent"][cls])
    fig = training_progress_grid(trainer, state, test_ds, args.index,
                                 LABEL_DESCRIPTION)
    fig.savefig(os.path.join(args.out,
                             f"result_index{args.index}_grid.png"))
    print(f"GIFs + grid -> {args.out}")


if __name__ == "__main__":
    from srgan_tpu.utils.chiplock import hold_chip
    with hold_chip("sample_sweep"):   # bench.py contention guard
        main()
