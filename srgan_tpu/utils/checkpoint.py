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

def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpter = ocp.StandardCheckpointer()
    ckpter.save(os.path.join(path, f"step_{step}" if step is not None else
                             "state"),
                jax.device_get(state), force=True)
    ckpter.wait_until_finished()


def restore_checkpoint(path: str, target: Any, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpter = ocp.StandardCheckpointer()
    return ckpter.restore(os.path.join(path, f"step_{step}"
                                       if step is not None else "state"),
                          jax.device_get(target))


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
