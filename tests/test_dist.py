"""Collective helpers over the virtual 8-device CPU mesh.

Semantics pinned against the reference's ``utils/dist_utils.py``:
sum/mean/max/min/product reductions, dict reduction, all-gather
concatenation, and the graceful single-process identity fallback
(``dist_utils.py:44-45``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mde_tpu.core.dist import (
    all_reduce_tensor, all_reduce_scalar, all_reduce_dict, all_gather_tensor)
from mde_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh(n_data=n)


def _shard_mapped(mesh, fn, x, out_spec=P()):
    # check_vma off: collective outputs ARE replicated but the static checker
    # cannot prove it for gather-based reductions
    return jax.shard_map(fn, mesh=mesh, in_specs=(P("data"),),
                         out_specs=out_spec, check_vma=False)(x)


@pytest.mark.parametrize("op,expect", [
    ("sum", lambda v: v.sum()),
    ("mean", lambda v: v.mean()),
    ("max", lambda v: v.max()),
    ("min", lambda v: v.min()),
    ("product", lambda v: np.prod(v)),
])
def test_all_reduce_ops(mesh, op, expect):
    n = len(jax.devices())
    per_dev = np.arange(1, n + 1, dtype=np.float32)  # one value per device

    def body(x):
        # x: (1,) local shard
        return all_reduce_tensor(x[0], op=op)

    out = _shard_mapped(mesh, body, jnp.asarray(per_dev))
    np.testing.assert_allclose(np.asarray(out), expect(per_dev), rtol=1e-6)


def test_all_reduce_dict_mean(mesh):
    n = len(jax.devices())
    vals = np.arange(n, dtype=np.float32)

    def body(x):
        d = all_reduce_dict({"m": x[0]}, op="mean")
        return d["m"]

    out = _shard_mapped(mesh, body, jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(out), vals.mean(), rtol=1e-6)


def test_all_gather_concats(mesh):
    n = len(jax.devices())
    data = np.arange(2 * n, dtype=np.float32).reshape(n, 2)

    def body(x):
        # x: (1, 2) local shard -> gather to (n*1, 2)
        return all_gather_tensor(x, axis=0)

    out = _shard_mapped(mesh, body, jnp.asarray(data))
    # the gather is replicated: every device returns the full (n, 2) concat
    np.testing.assert_allclose(np.asarray(out), data)


def test_identity_fallback_outside_mesh():
    x = jnp.asarray([1.0, 2.0])
    np.testing.assert_allclose(np.asarray(all_reduce_tensor(x, "sum")),
                               np.asarray(x))
    assert float(all_reduce_scalar(3.0, "mean")) == 3.0
    np.testing.assert_allclose(np.asarray(all_gather_tensor(x)),
                               np.asarray(x))
