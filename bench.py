"""Throughput benchmark: full-size SRGAN training step on real TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec", "vs_baseline": N}

Config = the flagship notebook-05 arm at full width (nch=64, res 6, solo D
with d_num_cls=4, encoder 4 blocks, ndim=8), 128px, global batch 128,
unrolled k=5 — i.e. one ``train()`` call of the reference per measured step.

The reference publishes no throughput numbers (BASELINE.md): ``vs_baseline``
is measured against the recorded first-round number in ``BENCH_SELF.json``
(self-baseline; 1.0 on the first run), so the ratio tracks our own progress
across rounds.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import dataclasses
    from srgan_tpu.configs import srgan_full
    from srgan_tpu.training import GANTrainer

    cfg = srgan_full()
    # production compute dtype on TPU: bfloat16 convs, fp32 params/stats
    if jax.default_backend() == "tpu":
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, compute_dtype="bfloat16"))
    batch = cfg.train.batch_size           # 128
    hw = cfg.model.image_size              # 128

    trainer = GANTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    src = rng.integers(0, 4, batch)
    host_batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (batch, hw, hw, 3))
                             .astype(np.float32)),
        "source_label": jnp.asarray(src),
        "target_label": jnp.asarray((src + rng.integers(1, 4, batch)) % 4),
    }

    # warmup: compile + flush the tunneled-TPU relay's first-dispatch
    # anomaly (the first post-compile batch of dispatches can stall for
    # minutes; steady state is reached after one chained block)
    warmup = int(os.environ.get("BENCH_WARMUP", "25"))
    for i in range(warmup):
        state, m = trainer.step(state, host_batch, jax.random.PRNGKey(i))
    float(m["errG"])   # NOTE: on the tunneled 'axon' platform
    # jax.block_until_ready can return before execution finishes; fetching
    # the scalar value is the only reliable sync.

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = trainer.step(state, host_batch,
                                    jax.random.PRNGKey(1000 + trial * 100 + i))
        float(m["errG"])   # true sync (see warmup note)
        best = min(best, time.perf_counter() - t0)
    dt = best

    images_per_sec = batch * iters / dt
    self_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_SELF.json")
    if os.path.exists(self_path):
        base = json.load(open(self_path))["images_per_sec"]
    else:
        base = images_per_sec
        with open(self_path, "w") as f:
            json.dump({"images_per_sec": images_per_sec,
                       "note": "round-1 self-baseline (reference publishes "
                               "no throughput, BASELINE.md)"}, f)
    print(json.dumps({
        "metric": "srgan_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / base, 3),
    }))


if __name__ == "__main__":
    main()
