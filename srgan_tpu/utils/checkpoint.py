"""Checkpointing: orbax persistence + torch ``.pth`` importers.

The reference checkpoints with ``torch.save(net.module.state_dict(), path)``
every 3 epochs, hyperparams encoded in filenames, optimizer state NOT saved,
and cross-stage transfer via ``load_state_dict(..., strict=False)``
(SURVEY.md §5).  Here:

  - ``save_checkpoint``/``restore_checkpoint``: orbax, full train state
    (params AND optimizer moments — resume actually resumes)
  - ``import_torch_*``: map the reference's shipped ``.pth`` state dicts onto
    our param trees (OIHW->HWIO conv transpose, (out,in)->(in,out) dense
    transpose, ConvTranspose (in,out,kh,kw)->(kh,kw,in,out)) so shipped
    reference checkpoints drive output-fidelity checks (BASELINE.md)

Key-name mapping follows the reference modules' attribute names
(model.py:203-508); every importer validates that all torch keys are
consumed and all target params assigned.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# orbax persistence
# ---------------------------------------------------------------------------

# On-disk format version, stamped as a sidecar ``format.json`` next to the
# orbax step dirs.  History:
#   (unversioned)  rounds 1-2 — ConvTranspose kernels stored UNflipped
#   2              round 3+   — ConvTranspose kernels stored spatially
#                  pre-flipped (nn/layers.py round-3 layout change); ALL
#                  other params unchanged
# Restoring an unversioned checkpoint is ambiguous (it computes silently
# wrong up-conv outputs if it predates the flip), so it fails loudly unless
# the caller says which layout it holds (``unversioned=``).
CKPT_FORMAT_VERSION = 2


class CheckpointVersionError(ValueError):
    """Raised when a checkpoint's on-disk format version is missing or
    unsupported (as opposed to a structure/shape mismatch)."""


def _flip_convtranspose_kernels(tree: Any) -> Any:
    """Migrate a pre-flip (rounds 1-2) param tree to the current layout by
    180deg-rotating every ConvTranspose kernel.  ConvTranspose lives only in
    the generator's ``up_conv_{j}`` modules (nn/generator.py; ``up_conv_out``
    is a plain conv)."""
    def fix(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k)))
                 for k in path]
        if (len(names) >= 2 and names[-1] == "kernel"
                and names[-2].startswith("up_conv_")
                and names[-2] != "up_conv_out"):
            return jnp.asarray(np.asarray(leaf)[::-1, ::-1])
        return leaf

    return jax.tree_util.tree_map_with_path(fix, tree)


def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpter = ocp.StandardCheckpointer()
    ckpter.save(os.path.join(path, f"step_{step}" if step is not None else
                             "state"),
                jax.device_get(state), force=True)
    ckpter.wait_until_finished()
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "format.json"), "w") as f:
        json.dump({"format_version": CKPT_FORMAT_VERSION,
                   "convtranspose_layout": "pre-flipped"}, f)


def checkpoint_format_version(path: str) -> Optional[int]:
    """Version stamped in ``path`` (or its parent, for a step dir passed
    directly); None for an unversioned (pre-round-3) checkpoint."""
    import json

    p = os.path.abspath(path)
    for cand in (p, os.path.dirname(p)):
        f = os.path.join(cand, "format.json")
        if os.path.exists(f):
            return int(json.load(open(f)).get("format_version", 0))
    return None


def latest_step(path: str) -> Optional[int]:
    """Largest ``step_N`` under an orbax checkpoint dir, or None."""
    import glob
    import re

    steps = []
    for p in glob.glob(os.path.join(os.path.abspath(path), "step_*")):
        m = re.match(r".*step_(\d+)$", p)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(path: str, target: Any, step: Optional[int] = None,
                       unversioned: str = "error"):
    """Restore an orbax checkpoint saved by ``save_checkpoint``.

    ``step=None`` restores the stepless ``state`` entry if present,
    otherwise the LATEST ``step_N`` (so CLIs pointed at a training run dir
    pick up the newest checkpoint without an explicit --ckpt-step).

    ``unversioned`` controls checkpoints with no ``format.json``:
      - ``"error"`` (default): refuse with an actionable message — an
        unversioned dir may hold the pre-flip ConvTranspose layout and
        would silently compute 180deg-rotated up-conv kernels;
      - ``"preflipped"``: trust it as the current (round-3+) layout;
      - ``"unflipped"``: treat it as rounds-1-2 layout and auto-migrate
        (flip every generator ``up_conv_*`` kernel).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    version = checkpoint_format_version(path)
    if version is not None and version > CKPT_FORMAT_VERSION:
        raise CheckpointVersionError(
            f"checkpoint {path} has format_version={version} > supported "
            f"{CKPT_FORMAT_VERSION}; upgrade srgan_tpu to restore it")
    if version is None and unversioned == "error":
        raise CheckpointVersionError(
            f"checkpoint {path} has no format.json: it predates checkpoint "
            "versioning and may hold the pre-flip ConvTranspose layout "
            "(silently wrong up-conv outputs).  If it was saved by "
            "srgan_tpu >= 0.3 (round 3), pass unversioned='preflipped'; "
            "if older, pass unversioned='unflipped' to auto-migrate.")
    if step is None and not os.path.isdir(os.path.join(path, "state")):
        step = latest_step(path)
    ckpter = ocp.StandardCheckpointer()
    restored = ckpter.restore(os.path.join(path, f"step_{step}"
                                           if step is not None else "state"),
                              jax.device_get(target))
    if target is not None:
        # orbax restores a same-structure tree even when leaf SHAPES differ
        # (e.g. a checkpoint from a different model width) — that would
        # compute silently wrong outputs downstream, so validate here
        def _check(kpath, t, r):
            ts, rs = tuple(np.shape(t)), tuple(np.shape(r))
            if ts != rs:
                name = jax.tree_util.keystr(kpath)
                raise ValueError(
                    f"checkpoint {path} param {name} has shape {rs} but the "
                    f"restore target expects {ts} — the checkpoint was "
                    "saved under a different model config")
            return r
        jax.tree_util.tree_map_with_path(_check, jax.device_get(target),
                                         restored)
    if version is None and unversioned == "unflipped":
        restored = _flip_convtranspose_kernels(restored)
    return restored


# ---------------------------------------------------------------------------
# torch state-dict import
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _conv_w(a):       # OIHW -> HWIO
    return jnp.asarray(np.transpose(a, (2, 3, 1, 0)))


def _convT_w(a):      # (in, out, kh, kw) -> (kh, kw, in, out), pre-flipped
    # spatial 180deg flip done HERE once so ConvTranspose2d.apply needs no
    # per-step jnp.flip (nn/layers.py round-3 note)
    return jnp.asarray(np.ascontiguousarray(
        np.transpose(a, (2, 3, 0, 1))[::-1, ::-1]))


def _lin_w(a):        # (out, in) -> (in, out)
    return jnp.asarray(np.transpose(a))


def _vec(a):
    return jnp.asarray(a)


class _Importer:
    """Accumulates torch-key -> target-path assignments with bookkeeping."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = dict(sd)
        self.out: Dict = {}

    def take(self, torch_key: str, path, fn):
        if torch_key not in self.sd:
            raise KeyError(f"missing torch key: {torch_key}")
        node = self.out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = fn(self.sd.pop(torch_key))

    def cbinorm(self, prefix: str, path, affine: bool = True):
        self.take(f"{prefix}.ConBias.0.weight", path + ("con_bias", "kernel"),
                  _lin_w)
        self.take(f"{prefix}.ConBias.0.bias", path + ("con_bias", "bias"),
                  _vec)
        if affine:
            self.take(f"{prefix}.weight", path + ("scale",), _vec)
            self.take(f"{prefix}.bias", path + ("bias",), _vec)

    def finish(self, allow_leftover=()):
        leftover = [k for k in self.sd
                    if not any(k.startswith(p) for p in allow_leftover)]
        if leftover:
            raise ValueError(f"unconsumed torch keys: {leftover[:8]} ...")
        return self.out


def import_torch_generator(sd: Dict[str, np.ndarray], num_cls: int = 2,
                           res_num: int = 6) -> Dict:
    """SingleGenerator state dict (model.py:203-234 naming)."""
    im = _Importer(sd)
    for i in range(num_cls + 1):
        im.take(f"down_convs.{i}.weight", (f"down_conv_{i}", "kernel"),
                _conv_w)
        im.cbinorm(f"down_cnorms.{i}", (f"down_cnorm_{i}",))
    for i in range(res_num):
        im.take(f"resBlocks.{i}.c1.weight", (f"res_{i}", "c1", "kernel"),
                _conv_w)
        im.take(f"resBlocks.{i}.c2.weight", (f"res_{i}", "c2", "kernel"),
                _conv_w)
        im.cbinorm(f"resBlocks.{i}.cn1", (f"res_{i}", "cn1"))
        im.cbinorm(f"resBlocks.{i}.cn2", (f"res_{i}", "cn2"))
    for j in range(num_cls):
        im.take(f"up_convs.{j}.weight", (f"up_conv_{j}", "kernel"), _convT_w)
    im.take(f"up_convs.{num_cls}.weight", ("up_conv_out", "kernel"), _conv_w)
    return im.finish()


def _import_solo_trunk(im: _Importer, prefix: str, target: str,
                       num_cls: int, with_head: bool):
    # torch Sequential: conv at even indices 0, 2, ..., final head conv at
    # 2*num_cls (model.py:262-276 / :302-313)
    for i in range(num_cls):
        im.take(f"{prefix}.down_convs.{2 * i}.weight",
                (target, f"conv_{i}", "kernel"), _conv_w)
    if with_head:
        im.take(f"{prefix}.down_convs.{2 * num_cls}.weight",
                (target, "conv_out", "kernel"), _conv_w)
        im.take(f"{prefix}.down_convs.{2 * num_cls}.bias",
                (target, "conv_out", "bias"), _vec)


def import_torch_original_discriminator(sd: Dict[str, np.ndarray],
                                        num_cls: int = 4) -> Dict:
    """SingleDiscriminator_original_multi (model.py:281-292)."""
    im = _Importer(sd)
    _import_solo_trunk(im, "discriminator1", "discriminator1", num_cls, True)
    _import_solo_trunk(im, "discriminator2", "discriminator2", num_cls, True)
    return im.finish()


def import_torch_solo_discriminator(sd: Dict[str, np.ndarray],
                                    num_cls: int = 4) -> Dict:
    """SingleDiscriminator_solo_multi (model.py:318-346)."""
    im = _Importer(sd)
    _import_solo_trunk(im, "discriminator1", "discriminator1", num_cls, False)
    _import_solo_trunk(im, "discriminator2", "discriminator2", num_cls, False)
    for name in ("last_layer1", "last_layer2"):
        im.take(f"{name}.weight", (name, "kernel"), _conv_w)
        im.take(f"{name}.bias", (name, "bias"), _vec)
    for name in ("classification_layer1", "classification_layer2"):
        im.take(f"{name}.0.weight", (name, "kernel"), _conv_w)
        im.take(f"{name}.0.bias", (name, "bias"), _vec)
    return im.finish()


def _import_encoder_trunk(im: _Importer, num_cls: int, conditional: bool):
    im.take("first_layer.weight", ("first_layer", "kernel"), _conv_w)
    im.take("first_layer.bias", ("first_layer", "bias"), _vec)
    for i in range(num_cls):
        im.take(f"layers.{i}.conv1.weight", (f"layers_{i}", "conv1", "kernel"),
                _conv_w)
        im.take(f"layers.{i}.cmp.0.weight",
                (f"layers_{i}", "cmp_conv", "kernel"), _conv_w)
        im.take(f"layers.{i}.shortcut.1.weight",
                (f"layers_{i}", "shortcut_conv", "kernel"), _conv_w)
        im.take(f"layers.{i}.shortcut.1.bias",
                (f"layers_{i}", "shortcut_conv", "bias"), _vec)
        if conditional:
            im.cbinorm(f"layers.{i}.cnorm1", (f"layers_{i}", "cnorm1"))
            im.cbinorm(f"layers.{i}.cnorm2", (f"layers_{i}", "cnorm2"))


def import_torch_encoder(sd: Dict[str, np.ndarray], num_cls: int = 4,
                         conditional: bool = False) -> Dict:
    """Encoder (model.py:439-482) or Encoder_original (:378-411)."""
    im = _Importer(sd)
    _import_encoder_trunk(im, num_cls, conditional)
    im.take("fcmean.weight", ("fcmean", "kernel"), _lin_w)
    im.take("fcmean.bias", ("fcmean", "bias"), _vec)
    im.take("fcvar.weight", ("fcvar", "kernel"), _lin_w)
    im.take("fcvar.bias", ("fcvar", "bias"), _vec)
    if not conditional:
        im.take("fcclass.weight", ("fcclass", "kernel"), _lin_w)
        im.take("fcclass.bias", ("fcclass", "bias"), _vec)
    return im.finish()


def import_torch_classifier(sd: Dict[str, np.ndarray],
                            num_cls: int = 4) -> Dict:
    """Encoder_classifier (model.py:484-508) — the nb04 checkpoint; drop its
    params into ``Encoder`` via ``init_state(e_params_override=...)`` for the
    nb05 strict=False transfer."""
    im = _Importer(sd)
    _import_encoder_trunk(im, num_cls, conditional=False)
    im.take("fcclass.weight", ("fcclass", "kernel"), _lin_w)
    im.take("fcclass.bias", ("fcclass", "bias"), _vec)
    return im.finish()


# ---------------------------------------------------------------------------
# torch state-dict EXPORT — exact inverses of the importers, so trained
# srgan_tpu params round-trip into the reference's torch modules
# (model.py:203-508) and its checkpoints/pipelines keep working.
# ---------------------------------------------------------------------------

def _inv_conv_w(a):   # HWIO -> OIHW
    return np.transpose(np.asarray(a), (3, 2, 0, 1))


def _inv_convT_w(a):  # (kh, kw, in, out) pre-flipped -> (in, out, kh, kw)
    return np.ascontiguousarray(
        np.transpose(np.asarray(a)[::-1, ::-1], (2, 3, 0, 1)))


def _inv_lin_w(a):    # (in, out) -> (out, in)
    return np.transpose(np.asarray(a))


def _inv_vec(a):
    return np.asarray(a)


class _Exporter:
    """Mirror of _Importer: target-path -> torch-key assignments."""

    def __init__(self, params: Dict):
        self.params = params
        self.sd: Dict[str, np.ndarray] = {}

    def _get(self, path):
        node = self.params
        for p in path:
            node = node[p]
        return node

    def put(self, torch_key: str, path, fn):
        self.sd[torch_key] = fn(self._get(path))

    def cbinorm(self, prefix: str, path, affine: bool = True):
        self.put(f"{prefix}.ConBias.0.weight", path + ("con_bias", "kernel"),
                 _inv_lin_w)
        self.put(f"{prefix}.ConBias.0.bias", path + ("con_bias", "bias"),
                 _inv_vec)
        if affine:
            self.put(f"{prefix}.weight", path + ("scale",), _inv_vec)
            self.put(f"{prefix}.bias", path + ("bias",), _inv_vec)


def export_torch_generator(params: Dict, num_cls: int = 2,
                           res_num: int = 6) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_generator (SingleGenerator naming)."""
    ex = _Exporter(params)
    for i in range(num_cls + 1):
        ex.put(f"down_convs.{i}.weight", (f"down_conv_{i}", "kernel"),
               _inv_conv_w)
        ex.cbinorm(f"down_cnorms.{i}", (f"down_cnorm_{i}",))
    for i in range(res_num):
        ex.put(f"resBlocks.{i}.c1.weight", (f"res_{i}", "c1", "kernel"),
               _inv_conv_w)
        ex.put(f"resBlocks.{i}.c2.weight", (f"res_{i}", "c2", "kernel"),
               _inv_conv_w)
        ex.cbinorm(f"resBlocks.{i}.cn1", (f"res_{i}", "cn1"))
        ex.cbinorm(f"resBlocks.{i}.cn2", (f"res_{i}", "cn2"))
    for j in range(num_cls):
        ex.put(f"up_convs.{j}.weight", (f"up_conv_{j}", "kernel"),
               _inv_convT_w)
    ex.put(f"up_convs.{num_cls}.weight", ("up_conv_out", "kernel"),
           _inv_conv_w)
    return ex.sd


def _export_solo_trunk(ex: _Exporter, prefix: str, target: str,
                       num_cls: int, with_head: bool):
    for i in range(num_cls):
        ex.put(f"{prefix}.down_convs.{2 * i}.weight",
               (target, f"conv_{i}", "kernel"), _inv_conv_w)
    if with_head:
        ex.put(f"{prefix}.down_convs.{2 * num_cls}.weight",
               (target, "conv_out", "kernel"), _inv_conv_w)
        ex.put(f"{prefix}.down_convs.{2 * num_cls}.bias",
               (target, "conv_out", "bias"), _inv_vec)


def export_torch_original_discriminator(params: Dict, num_cls: int = 4
                                        ) -> Dict[str, np.ndarray]:
    ex = _Exporter(params)
    _export_solo_trunk(ex, "discriminator1", "discriminator1", num_cls, True)
    _export_solo_trunk(ex, "discriminator2", "discriminator2", num_cls, True)
    return ex.sd


def export_torch_solo_discriminator(params: Dict, num_cls: int = 4
                                    ) -> Dict[str, np.ndarray]:
    ex = _Exporter(params)
    _export_solo_trunk(ex, "discriminator1", "discriminator1", num_cls, False)
    _export_solo_trunk(ex, "discriminator2", "discriminator2", num_cls, False)
    for name in ("last_layer1", "last_layer2"):
        ex.put(f"{name}.weight", (name, "kernel"), _inv_conv_w)
        ex.put(f"{name}.bias", (name, "bias"), _inv_vec)
    for name in ("classification_layer1", "classification_layer2"):
        ex.put(f"{name}.0.weight", (name, "kernel"), _inv_conv_w)
        ex.put(f"{name}.0.bias", (name, "bias"), _inv_vec)
    return ex.sd


def _export_encoder_trunk(ex: _Exporter, num_cls: int, conditional: bool):
    ex.put("first_layer.weight", ("first_layer", "kernel"), _inv_conv_w)
    ex.put("first_layer.bias", ("first_layer", "bias"), _inv_vec)
    for i in range(num_cls):
        ex.put(f"layers.{i}.conv1.weight", (f"layers_{i}", "conv1", "kernel"),
               _inv_conv_w)
        ex.put(f"layers.{i}.cmp.0.weight",
               (f"layers_{i}", "cmp_conv", "kernel"), _inv_conv_w)
        ex.put(f"layers.{i}.shortcut.1.weight",
               (f"layers_{i}", "shortcut_conv", "kernel"), _inv_conv_w)
        ex.put(f"layers.{i}.shortcut.1.bias",
               (f"layers_{i}", "shortcut_conv", "bias"), _inv_vec)
        if conditional:
            ex.cbinorm(f"layers.{i}.cnorm1", (f"layers_{i}", "cnorm1"))
            ex.cbinorm(f"layers.{i}.cnorm2", (f"layers_{i}", "cnorm2"))


def export_torch_encoder(params: Dict, num_cls: int = 4,
                         conditional: bool = False) -> Dict[str, np.ndarray]:
    ex = _Exporter(params)
    _export_encoder_trunk(ex, num_cls, conditional)
    ex.put("fcmean.weight", ("fcmean", "kernel"), _inv_lin_w)
    ex.put("fcmean.bias", ("fcmean", "bias"), _inv_vec)
    ex.put("fcvar.weight", ("fcvar", "kernel"), _inv_lin_w)
    ex.put("fcvar.bias", ("fcvar", "bias"), _inv_vec)
    if not conditional:
        ex.put("fcclass.weight", ("fcclass", "kernel"), _inv_lin_w)
        ex.put("fcclass.bias", ("fcclass", "bias"), _inv_vec)
    return ex.sd


def export_torch_classifier(params: Dict, num_cls: int = 4
                            ) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_classifier (Encoder_classifier naming) —
    also accepts a full Encoder param tree (fcmean/fcvar simply ignored),
    mirroring the reference's strict=False transfer direction."""
    ex = _Exporter(params)
    _export_encoder_trunk(ex, num_cls, conditional=False)
    ex.put("fcclass.weight", ("fcclass", "kernel"), _inv_lin_w)
    ex.put("fcclass.bias", ("fcclass", "bias"), _inv_vec)
    return ex.sd


def save_torch_state_dict(path: str, sd: Dict[str, np.ndarray]):
    """Write an exported state dict as a torch ``.pth`` the reference's
    ``load_state_dict`` accepts."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def export_torch_vgg(variables: Dict) -> Dict[str, np.ndarray]:
    """Inverse of ``import_torch_vgg``: ``{params, batch_stats}`` ->
    torchvision ``vgg19_bn`` state-dict naming (``features.N.*`` /
    ``classifier.N.*``), loadable with ``strict=True`` into the module the
    reference wraps (evaluation.py:44-63).  Round-trip tested in
    tests/test_vgg_fidelity.py."""
    from srgan_tpu.evaluation.features import VGG19_CFG

    params = variables["params"]
    stats = variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}
    seq = 0
    conv_i = 0
    for v in VGG19_CFG:
        if v == "M":
            seq += 1
            continue
        sd[f"features.{seq}.weight"] = _inv_conv_w(
            params[f"conv_{conv_i}"]["kernel"])
        sd[f"features.{seq}.bias"] = _inv_vec(
            params[f"conv_{conv_i}"]["bias"])
        sd[f"features.{seq + 1}.weight"] = _inv_vec(
            params[f"bn_{conv_i}"]["scale"])
        sd[f"features.{seq + 1}.bias"] = _inv_vec(
            params[f"bn_{conv_i}"]["bias"])
        sd[f"features.{seq + 1}.running_mean"] = _inv_vec(
            stats[f"bn_{conv_i}"]["mean"])
        sd[f"features.{seq + 1}.running_var"] = _inv_vec(
            stats[f"bn_{conv_i}"]["var"])
        sd[f"features.{seq + 1}.num_batches_tracked"] = np.asarray(
            0, np.int64)
        seq += 3
        conv_i += 1
    for t_idx, name in ((0, "fc0"), (3, "fc1"), (6, "fc2")):
        sd[f"classifier.{t_idx}.weight"] = _inv_lin_w(
            params[name]["kernel"])
        sd[f"classifier.{t_idx}.bias"] = _inv_vec(params[name]["bias"])
    return sd


def import_torch_vgg(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg19_bn state dict -> {params, batch_stats} variables."""
    from srgan_tpu.evaluation.features import VGG19_CFG

    im = _Importer(sd)
    params: Dict = {}
    stats: Dict = {}
    seq = 0
    conv_i = 0
    for v in VGG19_CFG:
        if v == "M":
            seq += 1
            continue
        im.take(f"features.{seq}.weight", (f"conv_{conv_i}", "kernel"),
                _conv_w)
        im.take(f"features.{seq}.bias", (f"conv_{conv_i}", "bias"), _vec)
        im.take(f"features.{seq + 1}.weight", (f"bn_{conv_i}", "scale"), _vec)
        im.take(f"features.{seq + 1}.bias", (f"bn_{conv_i}", "bias"), _vec)
        # running stats routed into the batch_stats collection afterwards
        stats[f"bn_{conv_i}"] = {
            "mean": _vec(im.sd.pop(f"features.{seq + 1}.running_mean")),
            "var": _vec(im.sd.pop(f"features.{seq + 1}.running_var")),
        }
        im.sd.pop(f"features.{seq + 1}.num_batches_tracked", None)
        seq += 3
        conv_i += 1
    for t_idx, name in ((0, "fc0"), (3, "fc1"), (6, "fc2")):
        im.take(f"classifier.{t_idx}.weight", (name, "kernel"), _lin_w)
        im.take(f"classifier.{t_idx}.bias", (name, "bias"), _vec)
    params = im.finish()
    return {"params": params, "batch_stats": stats}
