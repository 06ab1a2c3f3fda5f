"""Device mesh + sharding rules.

The reference's only parallelism is single-host data parallelism (DDP over
``gpu_ids``, SURVEY.md §2.8). TPU-native equivalent: a ``jax.sharding.Mesh``
with a ``data`` axis (optionally times a ``model`` axis for future tensor
parallelism), batch arrays sharded over ``data``, parameters replicated, and
XLA inserting the gradient/metric collectives over ICI automatically under
``jit`` (single-controller global-array style — no hand-written NCCL calls).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch-dim sharding over the data axis, replicated elsewhere."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays, leading batch dim) onto the mesh,
    split over the data axis."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    spec = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), tree)
