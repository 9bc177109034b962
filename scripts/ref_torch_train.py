#!/usr/bin/env python
"""Train the reference's ACTUAL torch SRGAN trainer end-to-end on a fixture.

Evidence tool (docs/TRAINING_EVIDENCE.md): runs ``SRGAN_training`` from
``/root/reference/pyfiles/util_notebook.py:419-734`` — the reference's own
code, unmodified — over the same synthetic-CelebA fixture that
``scripts/train.py`` trains on, replicating the notebook-03 driver loop
(``03-train_Style-Restricted_GAN_nopretraining.ipynb`` cells 20-24:
``weights_init``, ``get_target(..., whole=False)[:, 0]`` target sampling,
per-epoch ``scheG/scheD/scheE.step()``), then scores translation with the
same nearest-class-signature oracle as ``scripts/translation_oracle.py``.

Purpose: an apples-to-apples answer to "is the translation-pair plateau a
property of our rebuild or of the reference algorithm?"  Run this and the
JAX side at the same (reduced) width on the same fixture and compare which
source->target pairs each learns.

The only departure from the reference's environment: modern torch rejects
the reference's phase-2 retained-graph backward, so G's optimizer is the
torch-1.4-semantics ``Adam14`` shim (srgan_tpu/utils/torch14.py) — the same
shim under which one-step numeric parity is proven
(tests/test_trainer_parity.py).

Run on CPU (``env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu``): the data
loading imports srgan_tpu, and the single TPU chip should stay free for the
JAX arm.
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_SCRIPTS)
REF_PYFILES = os.environ.get("SRGAN_REF_PYFILES", "/root/reference/pyfiles")

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    sys.path.insert(0, _REPO)

import torch

from srgan_tpu.data import FaceDataset
from srgan_tpu.utils.torch14 import Adam14

sys.path.insert(0, _SCRIPTS)
from translation_oracle import class_means, oracle_classify  # noqa: E402


def _import_reference():
    if "prdc" not in sys.modules:  # pyfiles/util.py imports it; pip pkg absent
        stub = types.ModuleType("prdc")
        stub.compute_prdc = None
        sys.modules["prdc"] = stub
    sys.path.insert(0, REF_PYFILES)
    import model as ref_model
    import util as ref_util
    import util_notebook as ref_trainer
    return types.SimpleNamespace(model=ref_model, util=ref_util,
                                 trainer=ref_trainer)


def _to_torch(images_nhwc):
    return torch.tensor(np.asarray(images_nhwc).transpose(0, 3, 1, 2))


def _oracle_pairs(sg, by_class, sigs, n_classes):
    """Translate every (s, t) test pair with the reference's own
    G_transformation (random-latent path, util_notebook.py:510-561) and
    score with the nearest-signature oracle."""
    pairs, total, hits = {}, 0, 0
    sg.G.eval()
    with torch.no_grad():
        for s in sorted(by_class):
            x = _to_torch(by_class[s])
            for t in sorted(by_class):
                if t == s:
                    continue
                tgt = torch.tensor(np.full(len(x), t, np.int64))
                fake, _ = sg.G_transformation(tgt, x)
                fake_nhwc = fake.numpy().transpose(0, 2, 3, 1)
                pred = oracle_classify(fake_nhwc, sigs)
                pairs[f"{s}->{t}"] = round(float((pred == t).mean()), 3)
                total += len(x)
                hits += int((pred == t).sum())
    sg.G.train()
    return pairs, hits / total


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--attr-file", required=True)
    ap.add_argument("--out", required=True, help="summary JSON path")
    ap.add_argument("--save-dir", help="optionally torch.save G/D/E here")
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--nch", type=int, default=16,
                    help="base width for G, D and E (notebook full width: 64)")
    ap.add_argument("--res-num", type=int, default=2)
    ap.add_argument("--d-num-cls", type=int, default=4,
                    help="D trunk depth; use 3 at 64px so the reference's "
                         "hard-coded 8x8/4x4 class-head kernels fit "
                         "(model.py:322-334)")
    ap.add_argument("--ndim", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--unrolled-k", type=int, default=5)
    ap.add_argument("--train-num", type=int, default=100)
    ap.add_argument("--test-num", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ref = _import_reference()
    torch.manual_seed(args.seed)
    n_classes = 4
    classes = tuple(range(n_classes))

    # data through OUR loader (PIL path; transform parity vs the reference's
    # torchvision pipeline is pinned separately in tests/test_data.py — the
    # reference's own dataset.py needs torchvision, absent here)
    train_ds = FaceDataset(args.data_root, attr_file=args.attr_file,
                           data_type="train", train_num=args.train_num,
                           val_num=0, test_num=args.test_num,
                           image_size=args.image_size)
    test_ds = FaceDataset(args.data_root, attr_file=args.attr_file,
                          data_type="test", train_num=args.train_num,
                          val_num=0, test_num=args.test_num,
                          image_size=args.image_size)
    by_class = {c: np.stack([test_ds[i][0] for i in range(len(test_ds))
                             if test_ds.labels[i] == c]) for c in classes}
    sigs = class_means(by_class)
    real_hits = real_total = 0
    for c in classes:
        pred = oracle_classify(by_class[c], sigs)
        real_hits += int((pred == c).sum())
        real_total += len(pred)

    # notebook-03 cell 20: models at (reduced) width + weights_init
    netG = ref.model.SingleGenerator(3, args.nch, 2, 2, args.res_num,
                                     "instance", num_con=n_classes + args.ndim)
    netG.apply(ref.util.weights_init)
    netD = ref.model.SingleDiscriminator_solo_multi(3, args.nch, 2,
                                                    args.d_num_cls,
                                                    "instance", n_classes)
    netD.apply(ref.util.weights_init)
    netE = ref.model.Encoder(3, args.ndim, args.nch, 4, "instance",
                             n_classes, "cpu")
    netE.apply(ref.util.weights_init)

    lbd = {"class": 1, "cycle": 5, "idt": 5, "reg": 0.5, "idt_reg": 0.5,
           "KL": 0, "batch_KL": 10, "corr_enc": 100, "hist": 100}
    optG = Adam14(netG.parameters(), lr=1e-4, betas=(0.5, 0.999))
    sg = ref.trainer.SRGAN_training(
        [netG, netD, netE], [optG, None, None],
        [torch.nn.MSELoss(), torch.nn.MSELoss()], lbd, args.unrolled_k,
        "cpu", np.eye(n_classes), batch_size=args.batch_size,
        encoded_feature="mu", ndim=args.ndim)
    sg.opt_sche_initialization()

    init_pairs, init_acc = _oracle_pairs(sg, by_class, sigs, n_classes)

    rng = np.random.default_rng(args.seed)
    n = len(train_ds)
    steps_per_epoch = n // args.batch_size
    labels = np.asarray(train_ds.labels)
    print(f"train {n} images, {steps_per_epoch} steps/epoch x "
          f"{args.epochs} epochs", flush=True)

    for epoch in range(args.epochs):
        t0 = time.time()
        perm = rng.permutation(n)
        loss_g = []
        for it in range(steps_per_epoch):
            idx = perm[it * args.batch_size:(it + 1) * args.batch_size]
            imgs = np.stack([train_ds[int(i)][0] for i in idx])
            src = torch.tensor(labels[idx])
            # notebook-03 cell 24 target sampling
            whole_target = ref.util.get_target(src, classes, whole=False)
            tgt = torch.tensor(whole_target[:, 0], dtype=torch.long)
            errG, errD, errE = sg.train(_to_torch(imgs),
                                        {"source": src, "target": tgt})
            loss_g.append(float(errG.detach()))
        sg.scheD.step()
        sg.scheG.step()
        sg.scheE.step()
        print(f"epoch {epoch}: errG={np.mean(loss_g):.4f} "
              f"({time.time() - t0:.1f}s)", flush=True)

    trained_pairs, trained_acc = _oracle_pairs(sg, by_class, sigs, n_classes)

    def perfect(pairs):
        return sum(v == 1.0 for v in pairs.values())

    summary = {
        "trainer": "reference torch SRGAN_training (util_notebook.py:419)",
        "config": {"image_size": args.image_size, "nch": args.nch,
                   "res_num": args.res_num, "ndim": args.ndim,
                   "batch_size": args.batch_size, "epochs": args.epochs,
                   "unrolled_k": args.unrolled_k,
                   "train_num": args.train_num, "seed": args.seed},
        "real_acc": real_hits / real_total,
        "init": {"acc": init_acc, "perfect_pairs": perfect(init_pairs),
                 "pairs": init_pairs},
        "trained": {"acc": trained_acc,
                    "perfect_pairs": perfect(trained_pairs),
                    "pairs": trained_pairs},
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".",
                exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        for name, net in [("gen", netG), ("dis", netD), ("enc", netE)]:
            torch.save(net.state_dict(),
                       os.path.join(args.save_dir, f"{name}.pth"))


if __name__ == "__main__":
    main()
