"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
scatter/gather over 4 GPUs (nb01 cell 20; SURVEY.md §2.7).  The TPU-native
equivalent is a 1-D data mesh: batches sharded over the ``data`` axis, params
replicated, XLA/GSPMD inserting gradient all-reduces over ICI.  TP/PP/SP/EP do
not apply to this model family (<50M params, no sequence axis, no experts) —
the mesh is deliberately 1-D, and the batch-global diversification losses are
the one genuinely distributed-aware piece (cross-chip global reductions, which
GSPMD derives from these shardings; explicit shard_map/psum forms live in
``collectives.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
