"""Visualization / reporting utilities.

Capability mirror of the reference's plotting stack:
  - training-progress grid   get_output_and_plot  (util_notebook.py:738-846)
  - latent sample sweep      get_samples          (util_notebook.py:858-950)
  - GIF writer               save_gif             (util.py:356-373)
  - correlation matrix plot  plot_correlation_matrix (util.py:336-354)
  - confusion matrix plot    plot_confusion_matrix   (util.py:376-452)
  - loss curves              nb01 cell 22's D/G/E panel, over metrics.jsonl

All figure functions return the matplotlib Figure (headless-safe, Agg).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from srgan_tpu.data.sampling import get_target
from srgan_tpu.ops.image import to_uint8_images

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def training_progress_grid(trainer, state, dataset, index: int,
                           label_description: Dict[int, str],
                           random_sample_num: int = 5, rng=None):
    """source / target / recon / identity panels + random-latent sweeps —
    the get_output_and_plot layout (4 columns x (1 + samples) rows)."""
    import jax
    import jax.numpy as jnp

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    img, label = dataset[index]
    src = jnp.asarray(img)[None]
    src_label = np.array([label])
    classes = tuple(sorted(label_description))
    tgt_all = get_target(src_label, classes, shuffle=False)[0]
    tgt_label = np.array([tgt_all[0]])

    mu, logvar, _ = trainer.encode(state, src, src_label)
    style = mu
    tgt_by_src, _ = trainer.transform(state, src, tgt_label, latent=style)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    rep = jnp.tile(src, (random_sample_num, 1, 1, 1))
    tgt_rand, _ = trainer.transform(
        state, rep, np.repeat(tgt_label, random_sample_num), rng=k1)
    recon, _ = trainer.transform(state, tgt_rand[:1], src_label, latent=style)
    idt, _ = trainer.transform(state, src, src_label, latent=style)
    trans_imgs, _ = trainer.transform(
        state, jnp.tile(src, (len(tgt_all), 1, 1, 1)), tgt_all, rng=k2)
    recon_rand, _ = trainer.transform(
        state, jnp.tile(tgt_rand[:1], (random_sample_num, 1, 1, 1)),
        np.repeat(src_label, random_sample_num), rng=k3)
    idt_rand, _ = trainer.transform(
        state, rep, np.repeat(src_label, random_sample_num), rng=k4)

    # rows must fit both the sample sweeps and the per-class panels
    length, width = max(random_sample_num, len(tgt_all)) + 1, 4
    fig = plt.figure(figsize=(4 * width, 4 * length))

    def show(pos, image, title):
        ax = fig.add_subplot(length, width, pos)
        ax.imshow(to_uint8_images(np.asarray(image))[0])
        ax.set_title(title)
        ax.axis("off")

    show(1, src, "source")
    show(2, tgt_by_src, "target by source condition")
    show(3, recon, "recon by source condition")
    show(4, idt, "identity by source condition")
    for i, t in enumerate(tgt_all):
        show(4 * (i + 1) + 1, trans_imgs[i:i + 1], label_description[int(t)])
    for i in range(random_sample_num):
        show(4 * (i + 1) + 2, tgt_rand[i:i + 1], "target by random latent")
        show(4 * (i + 1) + 3, recon_rand[i:i + 1], "recon by random latent")
        show(4 * (i + 1) + 4, idt_rand[i:i + 1], "idt by random latent")
    fig.tight_layout()
    return fig


def get_samples(trainer, state, dataset, index: int, latent: np.ndarray,
                classes: Sequence[int] = (0, 1, 2, 3), batch: int = 32):
    """Latent sweep per target class for one source image — the test-notebook
    sample generator (util_notebook.py:858-950).

    latent: (num, ndim) or list of per-class arrays.  Returns
    (data, label) dicts: data["target"][cls] = (num, H, W, 3) images,
    label["latent"][cls] = encoder mu of each output (style round-trip).
    """
    import jax.numpy as jnp

    img, src_label = dataset[index]
    src = jnp.asarray(img)[None]
    latent_list = latent if isinstance(latent, list) else \
        [np.asarray(latent)] * len(classes)

    data = {"source": np.asarray(img), "target": {}}
    label = {"source": np.array([src_label]), "latent": {}}
    for cls, lat in zip(classes, latent_list):
        imgs, mus = [], []
        for start in range(0, len(lat), batch):
            chunk = jnp.asarray(lat[start:start + batch], jnp.float32)
            rep = jnp.tile(src, (chunk.shape[0], 1, 1, 1))
            out, _ = trainer.transform(state, rep,
                                       np.full(chunk.shape[0], cls),
                                       latent=chunk)
            mu, _, _ = trainer.encode(state, out,
                                      np.full(chunk.shape[0], cls))
            imgs.append(np.asarray(out))
            mus.append(np.asarray(mu))
        data["target"][cls] = np.concatenate(imgs)
        label["latent"][cls] = np.concatenate(mus)
    return data, label


def save_gif(images: Sequence[np.ndarray], gif_path: str,
             duration: int = 100):
    """uint8/float image sequence -> animated GIF (util.py:356-373, without
    the tempdir-of-PNGs detour)."""
    from PIL import Image

    frames = [Image.fromarray(f) for f in to_uint8_images(np.asarray(images))]
    frames[0].save(gif_path, save_all=True, append_images=frames[1:],
                   duration=duration, loop=0)


def plot_loss_curves(metrics, model_keys: Sequence[str] = ("errD", "errG",
                                                           "errE"),
                     x_key: str = "step",
                     save_path: Optional[str] = None):
    """Training loss curves — the reference's in-notebook loss panel
    (nb01 cell 22: one axes with Discriminator/Generator/Encoder lines),
    plus a second axes for the individual loss_* components our
    MetricLogger records.

    ``metrics`` is a path to a metrics.jsonl written by the training loop,
    or an already-loaded sequence of metric dicts.  Keys missing from the
    log are skipped (e.g. errE for the classifier job).
    """
    import json

    if isinstance(metrics, (str, bytes)):
        with open(metrics) as f:
            metrics = [json.loads(line) for line in f]
    metrics = list(metrics)
    if not metrics:
        raise ValueError("empty metrics log")

    xs = [m.get(x_key, i) for i, m in enumerate(metrics)]
    comp_keys = sorted({k for m in metrics for k in m
                        if k.startswith("loss_")})
    present = [k for k in model_keys if any(k in m for m in metrics)]

    def _scale(keys):
        # log hides zero/negative points without warning; fall back to
        # symlog when any plotted value is non-positive (possible for
        # future signed loss channels) so nothing silently disappears
        vals = [m[k] for m in metrics for k in keys if k in m]
        return "log" if all(v > 0 for v in vals) else "symlog"

    fig, axes = plt.subplots(1, 2 if comp_keys else 1,
                             figsize=(12 if comp_keys else 6, 4.5))
    axes = np.atleast_1d(axes)
    names = {"errD": "Discriminator", "errG": "Generator",
             "errE": "Encoder", "errG_ex": "Generator (phase 2)"}
    for k in present:
        pts = [(x, m[k]) for x, m in zip(xs, metrics) if k in m]
        axes[0].plot(*zip(*pts), label=names.get(k, k))
    axes[0].set_xlabel(x_key)
    axes[0].set_yscale(_scale(present))
    axes[0].legend()
    axes[0].set_title("model losses")
    if comp_keys:
        for k in comp_keys:
            pts = [(x, m[k]) for x, m in zip(xs, metrics) if k in m]
            axes[1].plot(*zip(*pts), label=k[len("loss_"):])
        axes[1].set_xlabel(x_key)
        axes[1].set_yscale(_scale(comp_keys))
        axes[1].legend(fontsize=8)
        axes[1].set_title("loss components")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, format="png", bbox_inches="tight")
    return fig


def plot_correlation_matrix(cm: np.ndarray, save_path: Optional[str] = None):
    fig = plt.figure(figsize=(10, 8))
    plt.imshow(cm, interpolation="nearest", cmap=plt.get_cmap("Blues"))
    plt.colorbar()
    thresh = cm.max() / 2
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            plt.text(j, i, str(round(float(cm[i, j]), 4)),
                     horizontalalignment="center",
                     color="white" if cm[i, j] > thresh else "black",
                     fontsize=12)
    plt.tight_layout()
    if save_path:
        fig.savefig(save_path, format="png", bbox_inches="tight")
    return fig


def plot_confusion_matrix(cm: np.ndarray, target_names: Sequence[str],
                          title: str = "Confusion matrix",
                          normalize: bool = True,
                          save_path: Optional[str] = None):
    accuracy = np.trace(cm) / float(np.sum(cm))
    fig = plt.figure(figsize=(10, 8))
    disp = cm.astype(float)
    if normalize:
        disp = disp / disp.sum(axis=1, keepdims=True)
    plt.imshow(disp, interpolation="nearest", cmap=plt.get_cmap("Blues"))
    plt.title(title)
    plt.colorbar()
    ticks = np.arange(len(target_names))
    plt.xticks(ticks, target_names, rotation=45)
    plt.yticks(ticks, target_names)
    thresh = disp.max() / (1.5 if normalize else 2)
    for i in range(disp.shape[0]):
        for j in range(disp.shape[1]):
            txt = f"{disp[i, j]:0.4f}" if normalize else f"{int(cm[i, j]):,}"
            plt.text(j, i, txt, horizontalalignment="center",
                     color="white" if disp[i, j] > thresh else "black")
    plt.ylabel("True label")
    plt.xlabel(f"Predicted label\naccuracy={accuracy:0.4f}; "
               f"misclass={1 - accuracy:0.4f}")
    plt.tight_layout()
    if save_path:
        fig.savefig(save_path, format="png", bbox_inches="tight")
    return fig
