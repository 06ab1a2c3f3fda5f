"""ODA2 Luna-gating family tests (tiny dims)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.oda2.luna import ODA2LunaModel, ODA2LunaGating

TINY_ENC = dict(embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                window_size=4)
COMMON = dict(decoder_channels=32, min_depth=0.001, max_depth=80.0,
              num_aux=8, aux_dims=16, num_heads=4, encoder_type="custom",
              use_checkpoint=False, resize_to_multiple=False,
              encoder_kwargs=TINY_ENC)


def test_gating_zero_init_passes_convs_through():
    """o_cross2 is zero-initialized -> gate = sigmoid(0) = 0.5 at init."""
    m = ODA2LunaGating(out_channels=8, num_heads=2)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 6), jnp.float32)
    aux = jnp.asarray(np.random.RandomState(1).rand(1, 3, 8), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, aux))()
    np.testing.assert_allclose(
        np.asarray(vs["params"]["luna"]["o_cross2"]["kernel"]), 0.0)
    y, aux_out = jax.jit(lambda v: m.apply(v, x, aux))(vs)
    assert y.shape == (1, 4, 4, 8)
    assert aux_out.shape == aux.shape


def test_oda2_luna_reg_forward():
    m = ODA2LunaModel(cls_head=False, **COMMON)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, second = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 16, 16, 1)  # 1/4 scale
    assert second is None
    assert float(out.min()) >= 0.001 and float(out.max()) <= 80.0


@pytest.mark.heavy
def test_oda2_luna_cls_forward():
    m = ODA2LunaModel(cls_head=True, **COMMON)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, centers = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 16, 16, 1)
    # num_aux doubles as the bin count in the cls variant
    assert centers.shape == (1, 8)
    # ELU+0.1 widths are strictly positive -> monotone centers
    c = np.asarray(centers)[0]
    assert (np.diff(c) > 0).all()
