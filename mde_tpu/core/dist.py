"""Distributed communication helpers over the JAX data mesh.

TPU-native replacement for the reference's ``utils/dist_utils.py`` (NCCL/Gloo
all-reduce/all-gather through torch.distributed). Under single-controller JAX
there is no process-group plumbing: collectives are XLA ops that ride the ICI
when traced inside a ``shard_map``/``pmap`` body with a named mesh axis.

Two usage modes, mirroring the reference's graceful single-process fallback
(``utils/dist_utils.py:44-45``):

* inside a mapped computation with ``axis_name`` bound -> real collectives
  (``lax.psum`` & friends);
* outside (or axis not bound) -> identity, so all code paths run on one chip.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _axis_bound(axis_name: str) -> bool:
    """True when called under a mapped computation that binds ``axis_name``."""
    try:
        lax.axis_index(axis_name)
        return True
    except NameError:
        return False


def all_reduce_tensor(x: jnp.ndarray, op: str = "sum",
                      axis_name: str = DATA_AXIS) -> jnp.ndarray:
    """Cross-device reduction (reference ``all_reduce_tensor``, dist_utils.py:49-64).

    Supports sum/mean/max/min/product. Identity when no mesh axis is bound.
    """
    if not _axis_bound(axis_name):
        return x
    if op == "sum":
        return lax.psum(x, axis_name)
    if op == "mean":
        return lax.pmean(x, axis_name)
    if op == "max":
        return lax.pmax(x, axis_name)
    if op == "min":
        return lax.pmin(x, axis_name)
    if op == "product":
        # No pprod primitive: reduce in log space is wrong for negatives, so
        # gather and multiply (tiny payloads only — matches reference usage).
        gathered = lax.all_gather(x, axis_name)
        return jnp.prod(gathered, axis=0)
    raise ValueError(f"Unsupported reduce op {op}.")


def all_reduce_scalar(value, op: str = "sum", axis_name: str = DATA_AXIS):
    """Scalar wrapper (reference ``all_reduce_scalar``, dist_utils.py:15-46)."""
    return all_reduce_tensor(jnp.asarray(value), op=op, axis_name=axis_name)


def all_reduce_dict(d: Dict[str, jnp.ndarray], op: str = "mean",
                    axis_name: str = DATA_AXIS) -> Dict[str, jnp.ndarray]:
    """Reduce every value of a (metric) dict (reference dist_utils.py:67-76)."""
    return {k: all_reduce_tensor(v, op=op, axis_name=axis_name) for k, v in d.items()}


def all_gather_tensor(x: jnp.ndarray, axis_name: str = DATA_AXIS,
                      axis: int = 0) -> jnp.ndarray:
    """Concatenate per-device tensors along ``axis``
    (reference ``all_gather_tensor``, dist_utils.py:79-89)."""
    if not _axis_bound(axis_name):
        return x
    gathered = lax.all_gather(x, axis_name)  # (n_dev, ...)
    return jnp.concatenate([gathered[i] for i in range(gathered.shape[0])], axis=axis)


# ---------------------------------------------------------------------------
# Host-level helpers (single-controller: every host sees global arrays)
# ---------------------------------------------------------------------------

def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """Rank-0-style guard for logging/checkpointing
    (reference ``local_rank == 0`` patterns)."""
    return jax.process_index() == 0


def dprint(*args, force: bool = False, **kwargs) -> None:
    """Primary-process-only print (reference ``utils/common_utils.py:55-57``)."""
    if force or is_primary():
        print(*args, **kwargs)


def device_count(platform: Optional[str] = None) -> int:
    return len(jax.devices(platform)) if platform else len(jax.devices())
