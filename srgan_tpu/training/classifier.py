"""Encoder-classifier pretraining — the notebook-04 job as a first-class API.

Reference behavior (nb04 cells 15/18/20/22/28):
  - Encoder_classifier (4-way), CrossEntropyLoss, Adam(lr=1e-4, torch-default
    betas 0.9/0.999), ExponentialLR(gamma=0.99) stepped per epoch
  - batch 512, 10k/1k/100 per-class split, validate every 3 epochs, keep the
    best-accuracy params

Replicated quirk: the reference model outputs ``F.softmax`` probabilities and
the loss is ``nn.CrossEntropyLoss`` applied to them — i.e. log_softmax ON TOP
of softmax (model.py:507-508 + nb04 cell 18).  We reproduce that exact
composition so training dynamics match.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srgan_tpu.configs import ClassifierConfig
from srgan_tpu.nn import EncoderClassifier


class ClassifierState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt: Any


class ClassifierTrainer:
    def __init__(self, cfg: ClassifierConfig, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        m = cfg.model
        self.model = EncoderClassifier(
            nch_in=m.nch_in, nch_out=m.ndim, nch=m.e_nch, num_cls=m.e_num_cls,
            num_con=m.n_classes)
        self.tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)
        self.mesh = mesh
        self._jit_train = self._build_train()
        self._jit_eval = self._build_eval()

    def _build_train(self):
        def loss_fn(params, images, labels):
            probs = self.model.apply({"params": params}, images)
            # CrossEntropyLoss over softmax outputs (the double-softmax quirk)
            logp = jax.nn.log_softmax(probs, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(
                logp, labels[:, None], axis=1))
            acc = jnp.mean((jnp.argmax(probs, -1) == labels).astype(jnp.float32))
            return loss, acc

        def train_step(state: ClassifierState, images, labels, lr):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, images, labels)
            updates, opt = self.tx.update(grads, state.opt, state.params)
            params = jax.tree.map(lambda p, u: p - lr * u, state.params,
                                  updates)
            return state.replace(step=state.step + 1, params=params, opt=opt), \
                {"loss": loss, "accuracy": acc}

        kwargs = {}
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            kwargs = dict(in_shardings=(repl, data, data, repl),
                          out_shardings=(repl, repl))
        return jax.jit(train_step, donate_argnums=(0,), **kwargs)

    def _build_eval(self):
        def eval_step(params, images, labels):
            probs = self.model.apply({"params": params}, images)
            preds = jnp.argmax(probs, -1)
            return preds, jnp.mean((preds == labels).astype(jnp.float32))

        return jax.jit(eval_step)

    def init_state(self, rng: jax.Array,
                   image_size: Optional[int] = None) -> ClassifierState:
        hw = image_size or self.cfg.model.image_size
        dummy = jnp.zeros((2, hw, hw, self.cfg.model.nch_in), jnp.float32)
        params = jax.jit(self.model.init)(rng, dummy)["params"]
        state = ClassifierState(step=jnp.zeros((), jnp.int32), params=params,
                                opt=self.tx.init(params))
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    def lr_at(self, epoch: int) -> float:
        return self.cfg.lr * self.cfg.lr_gamma ** epoch

    def step(self, state, images, labels, epoch: int = 0):
        return self._jit_train(state, images, labels,
                               jnp.float32(self.lr_at(epoch)))

    def evaluate(self, state, batches) -> Tuple[np.ndarray, np.ndarray, float]:
        """Full sweep over an iterable of (images, labels); returns
        (labels, preds, accuracy) — the nb04 ``do_test`` equivalent."""
        all_preds, all_labels = [], []
        for images, labels in batches:
            preds, _ = self._jit_eval(state.params, jnp.asarray(images),
                                      jnp.asarray(labels))
            all_preds.append(np.asarray(preds))
            all_labels.append(np.asarray(labels))
        preds = np.concatenate(all_preds)
        labels = np.concatenate(all_labels)
        return labels, preds, float((preds == labels).mean())

    def fit(self, state, train_iter_fn, val_iter_fn=None,
            epochs: Optional[int] = None, log_fn=None):
        """Epoch loop with validate-every-``test_interval`` and
        best-params retention (nb04 cell 22)."""
        best_acc, best_params = -1.0, None
        epochs = epochs if epochs is not None else self.cfg.epochs
        for epoch in range(epochs):
            for images, labels in train_iter_fn():
                state, metrics = self.step(state, jnp.asarray(images),
                                           jnp.asarray(labels), epoch)
            if val_iter_fn is not None and epoch % self.cfg.test_interval == 0:
                _, _, acc = self.evaluate(state, val_iter_fn())
                if log_fn:
                    log_fn({"epoch": epoch, "val_accuracy": acc,
                            **{k: float(v) for k, v in metrics.items()}})
                if acc > best_acc:
                    best_acc, best_params = acc, jax.device_get(state.params)
        return state, best_params, best_acc
