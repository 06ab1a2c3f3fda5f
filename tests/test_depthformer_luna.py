"""Depthformer v6/v7/v8 tests (tiny encoder multipliers)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.depthformer.luna_versions import DepthformerLuna

TINY_ENC = dict(width=0.1, depth=0.25, stem_ch=32, head_ch=256)


def _run(version):
    m = DepthformerLuna(version=version, hidden_dim=32, num_heads=4,
                        num_bins=8, num_aux=6, img_size=(64, 64),
                        min_depth=0.001, max_depth=80.0,
                        encoder_kwargs=TINY_ENC)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    return jax.jit(lambda v, a: m.apply(v, a))(vs, x), vs


def test_v6_contract():
    (pred, attns), vs = _run(6)
    assert pred.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(pred)).all()
    # aux bank has the configured size (v6 keeps num_aux free)
    assert vs["params"]["decoder"]["aux_embedding"].shape == (1, 6, 32)
    # v6 returns 9 attn maps: half-block + 4 x (attn1, attn2)
    assert len(attns) == 9


@pytest.mark.heavy
def test_v7_contract():
    (pred, centers, attns), vs = _run(7)
    assert pred.shape == (1, 32, 32, 1)
    # v7 overrides num_aux to the 1/32 token count = 2*2
    assert vs["params"]["decoder"]["aux_embedding"].shape == (1, 4, 32)
    assert centers.shape == (1, 8)


def test_v8_contract():
    (pred, centers, attns), vs = _run(8)
    assert pred.shape == (1, 32, 32, 1)
    assert centers.shape == (1, 8)
    assert vs["params"]["decoder"]["aux_embedding"].shape == (1, 6, 32)
    # v8 widths are ELU(0.1)+0.1-normalized -> strictly positive -> monotone
    c = np.asarray(centers)[0]
    assert (np.diff(c) > 0).all()
    assert len(attns) == 8
