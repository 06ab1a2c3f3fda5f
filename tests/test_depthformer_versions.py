"""Depthformer v2/v3/v4/v5 tests (tiny encoder multipliers)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.depthformer.versions import (
    DepthformerV2, DepthformerV3, DepthformerV4,
)

TINY_ENC = dict(width=0.1, depth=0.25, stem_ch=32, head_ch=256)


def test_v2_forward():
    m = DepthformerV2(version=2, hidden_dim=32, num_heads=4, img_size=(64, 64),
                      min_depth=0.001, max_depth=80.0, encoder_kwargs=TINY_ENC)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, attn = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)
    assert len(attn) == 3  # ViTs only at the 3 coarsest scales
    assert float(out.min()) >= 0.001 and float(out.max()) <= 80.0


@pytest.mark.heavy
def test_v5_forward_uses_conv_head():
    m = DepthformerV2(version=5, hidden_dim=32, num_heads=4,
                      key_query_dim=32, img_size=(64, 64),
                      encoder_kwargs=TINY_ENC)
    x = jnp.ones((1, 64, 64, 3))
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    # tap 12 means conv_head weights exist in the encoder
    assert "conv_head" in vs["params"]["encoder"]
    out, attn = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)


@pytest.mark.heavy
def test_v3_forward_bins():
    m = DepthformerV3(hidden_dim=32, num_heads=4, img_size=(64, 64),
                      num_bins=10, min_depth=0.001, max_depth=80.0,
                      encoder_kwargs=TINY_ENC)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    pred, edges, attn = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert pred.shape == (1, 32, 32, 1)
    assert edges.shape == (1, 11)
    e = np.asarray(edges)[0]
    assert e[0] == pytest.approx(0.001) and (np.diff(e) > 0).all()


def test_v4_forward_cls_token():
    m = DepthformerV4(hidden_dim=32, num_heads=4, img_size=(64, 64),
                      min_depth=0.001, max_depth=80.0, encoder_kwargs=TINY_ENC)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)
    assert len(attns) == 5  # one cls attention per scale
    # hard-sigmoid head keeps output in depth range
    assert float(out.min()) >= 0.001 and float(out.max()) <= 80.0
