#!/usr/bin/env python
"""Export a trained orbax GAN checkpoint back to reference-format .pth files.

Counterpart of scripts/import_torch_checkpoint.py: writes state dicts that
load strictly into the reference's torch modules (pyfiles/model.py), so
models trained here can be consumed by the reference's notebooks/pipelines.

Example:
  python scripts/export_torch_checkpoint.py --preset 03_srgan_nopretraining \
      --ckpt runs/srgan/ckpt --ckpt-step 30 --out runs/srgan/torch
  # -> generator.pth, discriminator.pth, encoder.pth
"""

import argparse
import os
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from srgan_tpu.configs import PRESETS, load_config_for_ckpt
from srgan_tpu.training import GANTrainer
from srgan_tpu.utils.checkpoint import (
    export_torch_encoder,
    export_torch_generator,
    export_torch_original_discriminator,
    export_torch_solo_discriminator,
    restore_checkpoint,
    save_torch_state_dict,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS),
                help="fallback when the run dir has no config.json")
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--ckpt-step", type=int)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    cfg = load_config_for_ckpt(args.ckpt, args.preset)
    trainer = GANTrainer(cfg)
    target = jax.device_get(trainer.init_state(
        jax.random.PRNGKey(0), freeze_pretrained=cfg.pretrained_encoder))
    state = restore_checkpoint(args.ckpt, target, step=args.ckpt_step)
    os.makedirs(args.out, exist_ok=True)

    m = cfg.model
    g_sd = export_torch_generator(jax.device_get(state.g_params),
                                  num_cls=m.g_num_cls, res_num=m.g_res_num)
    save_torch_state_dict(os.path.join(args.out, "generator.pth"), g_sd)

    d_params = jax.device_get(state.d_params)
    if cfg.trainer == "singlegan":
        # stacked per-domain Ds -> one .pth per domain (reference keeps a list)
        for i in range(m.n_classes):
            di = jax.tree.map(lambda x: x[i], d_params)
            sd = export_torch_original_discriminator(di, num_cls=m.d_num_cls)
            save_torch_state_dict(
                os.path.join(args.out, f"discriminator_{i}.pth"), sd)
    else:
        sd = export_torch_solo_discriminator(d_params, num_cls=m.d_num_cls)
        save_torch_state_dict(os.path.join(args.out, "discriminator.pth"), sd)

    conditional = cfg.trainer in ("singlegan", "singlegan_solo")
    e_sd = export_torch_encoder(jax.device_get(state.e_params),
                                num_cls=m.e_num_cls, conditional=conditional)
    save_torch_state_dict(os.path.join(args.out, "encoder.pth"), e_sd)
    print(f"exported -> {args.out}")


if __name__ == "__main__":
    main()
