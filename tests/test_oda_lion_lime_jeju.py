"""ODA Lion / Lime / Jeju decoder tests (tiny dims)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.oda.lion import (
    ODALionModel, lion_reorder_interleave, LionAxialAttention,
)
from mde_tpu.models.oda.lime import ODALimeModel, scaled_sigmoid
from mde_tpu.models.oda.jeju import ODAJejuModel, ReorderUpsample1d

TINY_ENC = dict(embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8))
COMMON = dict(min_depth=0.001, max_depth=80.0, resize_to_multiple=False,
              encoder_kwargs=TINY_ENC)


def test_lion_reorder_matches_reference_layout():
    # group g -> (row g%2, col g//2) (lion_layer.py:137-148)
    x = jnp.arange(8.0).reshape(1, 1, 1, 8)  # groups: [0,1],[2,3],[4,5],[6,7]
    y = np.asarray(lion_reorder_interleave(x))[0]
    np.testing.assert_array_equal(y[0, 0], [0, 1])  # x0 -> (0,0)
    np.testing.assert_array_equal(y[1, 0], [2, 3])  # x1 -> (1,0)
    np.testing.assert_array_equal(y[0, 1], [4, 5])  # x2 -> (0,1)
    np.testing.assert_array_equal(y[1, 1], [6, 7])  # x3 -> (1,1)


def test_lion_axial_attention_shapes():
    m = LionAxialAttention(axis="h")
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 6, 8), jnp.float32)
    vs = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    out, w = jax.jit(lambda v: m.apply(v, x))(vs)
    assert out.shape == x.shape
    assert w.shape == (2, 4, 8, 8)  # per-row channel-channel attention
    # softmax over dim -2 (column-stochastic)
    np.testing.assert_allclose(np.asarray(w).sum(-2), 1.0, rtol=1e-5)


@pytest.mark.heavy
def test_lion_model_forward():
    m = ODALionModel(decoder_channels=32, **COMMON)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)  # 1/2 scale
    assert len(attns) == 8
    assert float(out.min()) >= 0.001 and float(out.max()) <= 80.0


def test_scaled_sigmoid():
    # 1/(1+alpha*exp(-x/beta)) (ODA/layer_utils.py:40-63)
    v = float(scaled_sigmoid(jnp.asarray(0.0), 4.0, 0.5))
    assert v == pytest.approx(0.2)
    assert float(scaled_sigmoid(jnp.asarray(100.0), 4.0, 0.5)) == pytest.approx(1.0)


@pytest.mark.heavy
def test_lime_model_forward():
    m = ODALimeModel(decoder_channels=16, decoder_layers=2, **COMMON)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 16, 16, 1)  # 1/4 scale
    assert len(attns) == 2


def test_jeju_reorder_upsample1d():
    m = ReorderUpsample1d()
    x = jnp.asarray(np.random.RandomState(2).rand(1, 4, 8), jnp.float32)
    vs = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    y = jax.jit(lambda v: m.apply(v, x))(vs)
    assert y.shape == (1, 8, 4)  # tokens x2, dim /2


@pytest.mark.heavy
def test_jeju_model_forward():
    m = ODAJejuModel(decoder_channels=32, num_aux=4, num_heads=8, **COMMON)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, aux, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)  # 1/2 scale after the last upsample
    # aux token count doubles per level (3 upsamples): 4 -> 32, dim 32 -> 4
    assert aux.shape == (1, 32, 4)
    assert len(attns) == 8
