"""ODA2 red_luna + ksa family tests (tiny dims)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.oda2.red_luna import ODA2RedLunaRegModel, _sin_aux
from mde_tpu.models.oda2.ksa import (
    ODA2KSARegModel, KernelWindowAttention, PatchUnMerging,
)

TINY_ENC = dict(embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                window_size=4)
COMMON = dict(dec_dim=32, min_depth=0.001, max_depth=80.0,
              encoder_type="custom", use_checkpoint=False,
              resize_to_multiple=False, encoder_kwargs=TINY_ENC)


def test_sin_aux_unscaled():
    aux = np.asarray(_sin_aux(8, 4))
    assert aux.shape == (8, 4)
    np.testing.assert_allclose(aux[0], [0, 1, 0, 1], atol=1e-6)


def test_red_luna_forward():
    m = ODA2RedLunaRegModel(num_heads=4, num_layers=2, num_aux=6, **COMMON)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 14, 14, 1)  # 1/4 scale minus 3x3 VALID quirk
    assert len(attns) == 4  # (aux<-x, x<-aux) x num_layers


def test_kernel_window_attention_shapes():
    m = KernelWindowAttention(num_heads=2)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 16, 8), jnp.float32)
    enc = jnp.asarray(np.random.RandomState(1).rand(3, 16, 12), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, enc))()
    y = jax.jit(lambda v: m.apply(v, x, enc))(vs)
    assert y.shape == x.shape


def test_patch_unmerging_layout():
    m = PatchUnMerging()
    x = jnp.arange(8.0).reshape(1, 1, 1, 8)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    # layout check on the interleave itself
    b, h, w, d = x.shape
    g = np.asarray(x).reshape(1, 1, 1, 2, 2, 2).transpose(0, 1, 4, 2, 3, 5)
    y = g.reshape(1, 2, 2, 2)
    np.testing.assert_array_equal(y[0, 0, 0], [0, 1])  # x0 -> (0,0)
    np.testing.assert_array_equal(y[0, 1, 0], [2, 3])  # x1 -> (1,0)
    np.testing.assert_array_equal(y[0, 0, 1], [4, 5])  # x2 -> (0,1)
    np.testing.assert_array_equal(y[0, 1, 1], [6, 7])  # x3 -> (1,1)
    # module runs and halves channels after the 2x upsample
    out = jax.jit(lambda v: m.apply(v, x, False))(vs)
    assert out.shape == (1, 2, 2, 4)


@pytest.mark.heavy
def test_ksa_forward():
    m = ODA2KSARegModel(depths=(1, 1, 1, 1), dec_num_heads=(1, 2, 4, 8),
                        window_size=4, **COMMON)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, _ = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    # 1/4 scale minus the 3x3 VALID quirk
    assert out.shape == (1, 14, 14, 1)
    assert float(out.min()) >= 0.001 and float(out.max()) <= 80.0
