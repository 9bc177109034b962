#!/usr/bin/env python
"""Convert reference .pth checkpoints into an orbax GAN train state.

The reference ships per-model state dicts (``data/parameters/NN/*.pth``,
saved via ``torch.save(net.module.state_dict(), ...)``).  This imports any
subset of {generator, discriminator, encoder} onto a fresh train state so
``sample_sweep.py`` / ``evaluate_prdc.py`` can run against reference weights
for output-fidelity checks (BASELINE.md north star).
"""

import argparse
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from srgan_tpu.configs import PRESETS, save_config
from srgan_tpu.training import GANTrainer
from srgan_tpu.utils.checkpoint import (
    import_torch_encoder,
    import_torch_generator,
    import_torch_original_discriminator,
    import_torch_solo_discriminator,
    load_torch_state_dict,
    save_checkpoint,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS))
    ap.add_argument("--config-from",
                    help="config.json of an existing run — takes precedence "
                         "over --preset (carries geometry overrides)")
    ap.add_argument("--generator-pth")
    ap.add_argument("--discriminator-pth", nargs="+",
                    help="solo: one .pth; per-domain: one per domain")
    ap.add_argument("--encoder-pth")
    ap.add_argument("--out", required=True)
    ap.add_argument("--step", type=int, default=0)
    args = ap.parse_args()

    if args.config_from:
        import json

        from srgan_tpu.configs import config_from_dict
        cfg = config_from_dict(json.load(open(args.config_from)))
    elif args.preset:
        cfg = PRESETS[args.preset]()
    else:
        ap.error("pass --preset or --config-from")
    trainer = GANTrainer(cfg)
    state = trainer.init_state(
        jax.random.PRNGKey(0), freeze_pretrained=cfg.pretrained_encoder)

    m = cfg.model
    if args.generator_pth:
        g = import_torch_generator(load_torch_state_dict(args.generator_pth),
                                   num_cls=m.g_num_cls, res_num=m.g_res_num)
        state = state.replace(g_params=g)
        print("imported generator")
    if args.discriminator_pth:
        if cfg.trainer == "singlegan":
            # per-domain D list (nb01): one .pth per domain, stacked
            if len(args.discriminator_pth) != m.n_classes:
                raise SystemExit(f"per-domain preset needs {m.n_classes} "
                                 "discriminator .pth files")
            ds = [import_torch_original_discriminator(
                load_torch_state_dict(pth), num_cls=m.d_num_cls)
                for pth in args.discriminator_pth]
            import jax.numpy as jnp
            d = jax.tree.map(lambda *xs: jnp.stack(xs), *ds)
        else:
            d = import_torch_solo_discriminator(
                load_torch_state_dict(args.discriminator_pth[0]),
                num_cls=m.d_num_cls)
        state = state.replace(d_params=d)
        print("imported discriminator")
    if args.encoder_pth:
        e = import_torch_encoder(
            load_torch_state_dict(args.encoder_pth), num_cls=m.e_num_cls,
            conditional=cfg.trainer in ("singlegan", "singlegan_solo"))
        state = state.replace(e_params=e)
        print("imported encoder")

    save_checkpoint(args.out, state, step=args.step)
    save_config(cfg, args.out)   # let downstream CLIs rebuild the model
    print(f"orbax state -> {args.out}/step_{args.step}")


if __name__ == "__main__":
    main()
