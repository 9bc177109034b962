"""Functional training state for the three-network GAN.

The reference holds G/D/E as stateful nn.Modules plus three torch Adam
optimizers and ExponentialLR schedulers (util_notebook.py:101-132).  Here the
whole thing is one immutable pytree, so the UnrolledGAN snapshot/restore
(util_notebook.py:393-410) is just keeping a reference to an earlier params
tree — free, instead of a device-wide state_dict copy.

Optimizers: torch Adam(betas=(0.5, 0.999), eps=1e-8) == optax.scale_by_adam(
b1=0.5, b2=0.999, eps=1e-8, eps_root=0); the learning rate (with the
per-epoch gamma**epoch decay) is applied per step so the schedule costs
nothing inside jit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def adam_chain(b1: float = 0.5, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0)


def adam_apply(tx: optax.GradientTransformation, grads, opt_state, params, lr):
    """One Adam step at learning rate ``lr`` (a traced scalar is fine)."""
    updates, new_state = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return new_params, new_state


def freeze_mask(e_params, trainable_keys=("fcmean", "fcvar")):
    """Boolean mask pytree: True = trainable.

    Mirrors the nb05 freeze/melt trick (model.py:465-472 + nb05 cell 22): the
    classifier trunk receives gradients but is never updated because only
    fcmean/fcvar are registered in optE.  Zeroing the frozen leaves' grads is
    exactly equivalent (their Adam moments start at 0 and stay 0).
    """
    def mark(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return top in trainable_keys

    return jax.tree_util.tree_map_with_path(mark, e_params)


def mask_grads(grads, mask):
    # mask leaves are scalar bools; they ride inside the traced state pytree,
    # so use arithmetic masking rather than Python control flow.
    return jax.tree.map(lambda g, m: g * jnp.asarray(m, g.dtype), grads, mask)


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any           # solo: one tree; per-domain: stacked on axis 0
    e_params: Any
    g_opt: Any
    d_opt: Any
    e_opt: Any
    hist_target: Optional[jnp.ndarray] = None
    e_mask: Any = None      # None = all trainable
    # running batch-norm stats for norm_type="batch" (None in instance mode)
    g_stats: Any = None
    e_stats: Any = None
