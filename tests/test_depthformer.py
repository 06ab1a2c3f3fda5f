"""Depthformer v1 tests (tiny encoder multipliers)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.depthformer.model import Depthformer
from mde_tpu.ops.luna import LunaBlock, PreNormLunaBlock, LunaHalfBlock

TINY_ENC = dict(width=0.1, depth=0.25, stem_ch=32, head_ch=256)


def test_depthformer_forward_contract():
    m = Depthformer(hidden_dim=16, num_heads=4, img_size=(64, 64),
                    min_depth=0.001, max_depth=80.0,
                    encoder_kwargs=TINY_ENC)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    depth, attn = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    # output at 1/2 input scale, rescaled to [min_depth, max_depth]
    assert depth.shape == (1, 32, 32, 1)
    assert float(depth.min()) >= 0.001 and float(depth.max()) <= 80.0
    # 4 attention maps over the 1/32 token grid (2x2=4 tokens)
    assert len(attn) == 4
    assert attn[0].shape == (1, 4, 4, 4)  # (b, heads, s, s)


def test_depthformer_rejects_wrong_size():
    m = Depthformer(hidden_dim=16, num_heads=4, img_size=(64, 64),
                    encoder_kwargs=TINY_ENC)
    with pytest.raises(ValueError, match="requires input size"):
        m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((1, 32, 64, 3)))


def test_luna_blocks_shapes():
    b, hw, k, d, ad = 2, 12, 4, 16, 8
    hidden = jnp.asarray(np.random.RandomState(0).rand(b, hw, d), jnp.float32)
    aux = jnp.asarray(np.random.RandomState(1).rand(b, k, ad), jnp.float32)

    for cls in (LunaBlock, PreNormLunaBlock):
        m = cls(qk_proj_dim=16, num_heads=4)
        vs = jax.jit(lambda m=m: m.init(jax.random.PRNGKey(0), hidden, aux))()
        out, aux_out, a1, a2 = jax.jit(
            lambda v, m=m: m.apply(v, hidden, aux))(vs)
        assert out.shape == (b, hw, d)
        assert aux_out.shape == (b, k, ad)
        # attn1: aux->pixels (K x HW); attn2: pixels->aux (HW x K)
        assert a1.shape == (b, 4, k, hw)
        assert a2.shape == (b, 4, hw, k)
        # linear-attention invariant: rows of softmax sum to 1
        np.testing.assert_allclose(np.asarray(a1).sum(-1), 1.0, rtol=1e-5)


def test_luna_half_block():
    m = LunaHalfBlock(qk_proj_dim=16, num_heads=4)
    hidden = jnp.ones((2, 4, 3, 16))
    aux = jnp.ones((2, 5, 8))
    vs = jax.jit(lambda: m.init(jax.random.PRNGKey(0), hidden, aux))()
    aux_out, a1 = jax.jit(lambda v: m.apply(v, hidden, aux))(vs)
    assert aux_out.shape == (2, 5, 8)
    assert a1.shape == (2, 4, 5, 12)
