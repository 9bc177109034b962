"""Host-side batching + device prefetch.

The reference drives training with ``torch.utils.data.DataLoader(batch_size=
128, shuffle=True)`` and samples target labels on the host per batch
(nb01 cell 22: ``get_target(...)[:, 0]``).  Here the loader:

  - shuffles per epoch, assembles NHWC float32 batches in worker threads,
  - folds the target-label sampling (``get_target`` column-0 semantics) in,
  - optionally double-buffers batches onto the device/mesh
    (``prefetch_to_device``) so host decode overlaps TPU compute,
  - drops the last partial batch by default (static shapes for XLA; the
    reference kept it — set drop_last=False to match, at the cost of a
    retrace for the remainder shape).
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

from srgan_tpu.data.sampling import get_target


class DataLoader:
    def __init__(self, dataset, batch_size: int = 128, shuffle: bool = True,
                 drop_last: bool = True, classes: Sequence[int] = (0, 1, 2, 3),
                 sample_targets: bool = True, num_workers: int = 8,
                 seed: int = 0, use_native: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.classes = classes
        self.sample_targets = sample_targets
        self.num_workers = num_workers
        self._rng = np.random.default_rng(seed)
        # native C++ decode path: needs a file-backed FaceDataset and the
        # built libsrgan_dataio.so; silently falls back to PIL otherwise
        self.use_native = False
        if use_native and all(hasattr(dataset, a) for a in
                              ("images", "labels", "crop", "image_size",
                               "flip")):
            from srgan_tpu import native
            self.use_native = native.available()

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        limit = len(self) * self.batch_size if self.drop_last else n
        order = order[:limit]

        def fetch(i):
            return self.dataset[int(i)]

        def make_batch(idx):
            if self.use_native:
                from srgan_tpu import native
                ds = self.dataset
                paths = [ds.images[int(i)] for i in idx]
                flips = (self._rng.random(len(idx)) < 0.5).astype(np.uint8) \
                    if ds.flip else np.zeros(len(idx), np.uint8)
                images = native.load_batch(paths, ds.crop, ds.image_size,
                                           flips, self.num_workers)
                labels = np.asarray([ds.labels[int(i)] for i in idx],
                                    np.int32)
            else:
                items = list(pool.map(fetch, idx))
                images = np.stack([im for im, _ in items])
                labels = np.asarray([lb for _, lb in items], np.int32)
            batch = {"image": images, "source_label": labels}
            if self.sample_targets:
                tgt = get_target(labels, self.classes, whole=False,
                                 shuffle=True, rng=self._rng)
                batch["target_label"] = tgt[:, 0].astype(np.int32)
            return batch

        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(order), self.batch_size):
                yield make_batch(order[start:start + self.batch_size])


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Double-buffer host batches onto the device (or sharded onto a mesh).

    The H2D copy of batch N+1 overlaps the TPU step on batch N — the
    DataParallel-scatter equivalent without the per-call replicate cost.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is not None:
        sharding = NamedSharding(mesh, P("data"))
        put = lambda b: jax.tree.map(
            lambda x: jax.device_put(x, sharding), b)
    else:
        put = lambda b: jax.tree.map(jax.device_put, b)

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
