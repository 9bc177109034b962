#!/usr/bin/env python
"""PRDC evaluation harness (reference test-notebooks + notebook 06).

For each (source, target) domain pair: takes test images of the source
domain, translates them to the target domain with random latents, embeds
real-target and translated images with the chosen VGG extractors, computes
precision/recall/density/coverage, repeats, and pickles the
``evaluation_init``-shaped result dict.  Prints nb06-style tables.
"""

import argparse
import os
import pickle
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
from srgan_tpu.evaluation import GANEvaluation, evaluation_init
from srgan_tpu.evaluation.harness import comparison_table
from srgan_tpu.training import GANTrainer
from srgan_tpu.utils.checkpoint import (
    import_torch_vgg,
    load_torch_state_dict,
    restore_checkpoint,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS),
                help="fallback when the run dir has no config.json")
    ap.add_argument("--ckpt", required=True,
                    help="orbax dir of the trained GAN state")
    ap.add_argument("--ckpt-step", type=int)
    ap.add_argument("--out", required=True)
    ap.add_argument("--data-root")
    ap.add_argument("--attr-file")
    ap.add_argument("--label-root")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--feature-extractors", nargs="+",
                    default=["vgg-initialization"])
    ap.add_argument("--vgg-imagenet-pth",
                    help="torchvision vgg19_bn .pth for vgg-ImageNet")
    ap.add_argument("--vgg-celeba-ckpt",
                    help="orbax dir of the fine-tuned VGG (vgg-CelebA)")
    ap.add_argument("--num-samples", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--nearest-k", type=int, default=5)
    ap.add_argument("--test-num", type=int, default=100)
    ap.add_argument("--init-baseline", action="store_true",
                    help="evaluate a FRESH-INIT model of the checkpoint's "
                         "config instead of restoring weights (the untrained "
                         "reference point for nb06-style tables)")
    args = ap.parse_args()

    cfg = load_config_for_ckpt(args.ckpt, args.preset)
    data_root, attr_file = args.data_root, args.attr_file
    if args.synthetic or not data_root:
        data_root, attr_file = make_synthetic_celeba(
            "/tmp/srgan_tpu_synthetic", n_per_class=max(16, args.test_num))

    test_ds = FaceDataset(data_root, attr_file=attr_file,
                          label_root=args.label_root, data_type="test",
                          train_num=cfg.train.train_num, val_num=0,
                          test_num=args.test_num,
                          image_size=cfg.model.image_size)
    classes = tuple(range(cfg.model.n_classes))
    by_class = {c: np.stack([test_ds[i][0] for i in range(len(test_ds))
                             if test_ds.labels[i] == c]) for c in classes}

    trainer = GANTrainer(cfg)
    # pretrained-encoder configs carry an e_mask tree in their train state;
    # build the restore target with the same structure
    target = jax.device_get(trainer.init_state(
        jax.random.PRNGKey(0), freeze_pretrained=cfg.pretrained_encoder))
    if args.init_baseline:
        # untrained fresh-init comparison point: same config/seed as
        # translation_oracle's init arm
        state = target
    else:
        state = restore_checkpoint(args.ckpt, target, step=args.ckpt_step)

    evaluators = {}
    for fe in args.feature_extractors:
        variables = None
        if "ImageNet" in fe:
            if not args.vgg_imagenet_pth:
                raise SystemExit(f"{fe} needs --vgg-imagenet-pth")
            variables = import_torch_vgg(
                load_torch_state_dict(args.vgg_imagenet_pth))
        elif "CelebA" in fe:
            if not args.vgg_celeba_ckpt:
                raise SystemExit(f"{fe} needs --vgg-celeba-ckpt")
            variables = restore_checkpoint(args.vgg_celeba_ckpt, None)
        evaluators[fe] = GANEvaluation(fe, classes=classes,
                                       variables=variables)

    results = evaluation_init(args.feature_extractors, classes)
    rng = jax.random.PRNGKey(0)
    for rep in range(args.repeats):
        for s in classes:
            src = by_class[s][:args.num_samples]
            for t in classes:
                rng, sub = jax.random.split(rng)
                fake, _ = trainer.transform(
                    state, src, np.full(len(src), t), rng=sub)
                real = by_class[t][:args.num_samples]
                for fe, ev in evaluators.items():
                    m = ev.get_prdc(real, np.asarray(fake),
                                    nearest_k=args.nearest_k)
                    for k, v in m.items():
                        results[fe][s][t][k].append(v)
                print(f"rep {rep} s={s} t={t}: " + " ".join(
                    f"{fe}:{results[fe][s][t]['coverage'][-1]:.3f}"
                    for fe in evaluators))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".",
                exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(results, f)
    for fe in evaluators:
        for metric in ("precision", "recall", "density", "coverage"):
            mat = comparison_table(results, fe, metric, classes)
            print(f"\n{fe} / {metric} (source x target):")
            print(np.array_str(mat, precision=4))
    print(f"\nresults -> {args.out}")


if __name__ == "__main__":
    from srgan_tpu.utils.chiplock import hold_chip
    with hold_chip("evaluate_prdc"):   # bench.py contention guard
        main()
