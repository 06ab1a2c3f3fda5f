"""Swin backbone shape/semantics tests (tiny dims)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.swin import SwinTransformer, swin_base, swin_large


@pytest.fixture(scope="module")
def tiny_swin_out():
    m = SwinTransformer(embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                        window_size=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    outs = jax.jit(lambda v, xx: m.apply(v, xx))(vs, x)
    return m, outs


def test_feature_pyramid_shapes(tiny_swin_out):
    m, outs = tiny_swin_out
    assert len(outs) == 4
    # strides 4/8/16/32, channels x2 per stage
    assert outs[0].shape == (2, 16, 24, 16)
    assert outs[1].shape == (2, 8, 12, 32)
    assert outs[2].shape == (2, 4, 6, 64)
    assert outs[3].shape == (2, 2, 3, 128)
    assert m.num_features == (16, 32, 64, 128)


def test_nonmultiple_input_padding():
    """Window-size padding must allow arbitrary (patch-multiple) inputs."""
    m = SwinTransformer(embed_dim=8, depths=(1, 1), num_heads=(1, 2), window_size=4,
                        out_indices=(0, 1))
    x = jnp.ones((1, 36, 44, 3))  # 9x11 patches -> not window multiples
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    outs = jax.jit(lambda v, xx: m.apply(v, xx))(vs, x)
    assert outs[0].shape == (1, 9, 11, 8)
    assert outs[1].shape == (1, 5, 6, 16)


def test_remat_matches_no_remat():
    """use_checkpoint must be numerically identical to the plain path."""
    kwargs = dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2), window_size=4,
                  out_indices=(0, 1))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3), jnp.float32)
    m1 = SwinTransformer(use_checkpoint=False, **kwargs)
    m2 = SwinTransformer(use_checkpoint=True, **kwargs)
    vs = jax.jit(lambda: m1.init({"params": jax.random.PRNGKey(0)}, x))()
    o1 = jax.jit(lambda v, xx: m1.apply(v, xx))(vs, x)
    o2 = jax.jit(lambda v, xx: m2.apply(v, xx))(vs, x)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_named_variants_param_counts():
    """Swin-B/L reference param templates: embed dims & stage structure
    (reference oda2_red_order_swin2.py:36-41)."""
    b = swin_base()
    l = swin_large()
    assert b.embed_dim == 128 and b.num_heads == (4, 8, 16, 32)
    assert l.embed_dim == 192 and l.num_heads == (6, 12, 24, 48)
    assert b.depths == (2, 2, 18, 2) and l.depths == (2, 2, 18, 2)
    assert l.num_features == (192, 384, 768, 1536)
