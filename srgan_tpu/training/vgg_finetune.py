"""VGG19-BN fine-tune on the 4 CelebA classes — the missing notebook B's job.

The reference's notebook ``B_Facial_Recognition-VGG_Model.ipynb`` is absent
from the snapshot but its product ships as
``data/parameters/B/facial_recognizer_vgg_lr5e-05_epoch126.pth``
(evaluation.py:58): VGG19-BN with classifier[6] replaced by a 4-way Linear
(evaluation.py:56), fine-tuned at lr 5e-5.  This job reproduces that
capability: Adam(lr=5e-5), cross-entropy, BN stats updating, best-accuracy
retention — producing the "vgg-CelebA" PRDC feature extractor.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from srgan_tpu.evaluation.features import VGG19BN, init_vgg, preprocess_for_vgg


class VGGFinetuneState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt: Any


class VGGFinetuneTrainer:
    def __init__(self, n_classes: int = 4, lr: float = 5e-5):
        self.model = VGG19BN(num_classes=n_classes)
        self.lr = lr
        self.tx = optax.adam(lr)
        self._jit_train = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_eval = jax.jit(self._eval_step)

    def init_state(self, rng, pretrained_variables=None,
                   image_size: int = 224) -> VGGFinetuneState:
        if pretrained_variables is None:
            _, variables = init_vgg(rng, num_classes=self.model.num_classes,
                                    image_size=image_size)
        else:
            variables = pretrained_variables
        return VGGFinetuneState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt=self.tx.init(variables["params"]))

    def _train_step(self, state, images, labels):
        def loss_fn(params):
            logits, updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, output="score", train=True, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(logits)
            loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
            acc = jnp.mean((jnp.argmax(logits, -1) == labels)
                           .astype(jnp.float32))
            return loss, (updates["batch_stats"], acc)

        (loss, (bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = self.tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=bs, opt=opt), \
            {"loss": loss, "accuracy": acc}

    def _eval_step(self, params, batch_stats, images, labels):
        logits = self.model.apply({"params": params,
                                   "batch_stats": batch_stats},
                                  images, output="score")
        preds = jnp.argmax(logits, -1)
        return preds, jnp.mean((preds == labels).astype(jnp.float32))

    def step(self, state, images_pm1, labels, preprocessed: bool = False):
        """images_pm1: (B, 128, 128, 3) in [-1, 1] unless preprocessed."""
        if not preprocessed:
            images_pm1 = preprocess_for_vgg(np.asarray(images_pm1))
        return self._jit_train(state, jnp.asarray(images_pm1),
                               jnp.asarray(labels))

    def evaluate(self, state, batches) -> float:
        accs, ns = [], []
        for images, labels in batches:
            images = preprocess_for_vgg(np.asarray(images))
            _, acc = self._jit_eval(state.params, state.batch_stats,
                                    jnp.asarray(images), jnp.asarray(labels))
            accs.append(float(acc))
            ns.append(len(labels))
        return float(np.average(accs, weights=ns))

    def variables(self, state):
        return {"params": state.params, "batch_stats": state.batch_stats}
