"""ODA2 sibling families: red_order_reg/cls, red_order_swin (gen1), red_reg,
conv (tiny dims)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.oda2.red_order_reg import ODA2OrderedRegModel
from mde_tpu.models.oda2.red_order_swin import ODA2OrderedSwinModel
from mde_tpu.models.oda2.red_reg import ODA2RedRegModel
from mde_tpu.models.oda2.conv import ODA2ConvModel
from mde_tpu.ops.reduction import (
    block_mean, sinusoidal_depth_embedding, PreNormOrderedReductionSA,
)

TINY_ENC = dict(embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                window_size=4)
COMMON = dict(dec_dim=32, min_depth=0.001, max_depth=80.0, num_heads=4,
              encoder_type="custom", use_checkpoint=False,
              resize_to_multiple=False, encoder_kwargs=TINY_ENC)


def test_block_mean():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    m = block_mean(x, 2)
    assert m.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(m)[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)


def test_sinusoidal_embedding_structure():
    emb = np.asarray(sinusoidal_depth_embedding(16, 8, base=2000.0))
    assert emb.shape == (16, 8)
    # row 0: sin(0)=0, cos(0)=1 (scaled by sqrt(1/d))
    s = (1 / 8) ** 0.5
    np.testing.assert_allclose(emb[0, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 1::2], s, rtol=1e-6)


def test_reduction_sa_shapes():
    m = PreNormOrderedReductionSA(num_heads=4, reduction_ratio=4,
                                  return_weights=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    vs = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, None))()
    out, w = jax.jit(lambda v: m.apply(v, x, None))(vs)
    assert out.shape == x.shape
    # attention is (B, nh, HW, HW/r^2)
    assert w.shape == (2, 4, 64, 4)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)


def test_red_order_reg_forward():
    m = ODA2OrderedRegModel(num_repeats=2, num_emb=16, reduction_ratio=4,
                            **COMMON)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, outs, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 16, 16, 1)
    assert len(outs) == 3
    assert float(out.min()) >= 0 and float(out.max()) <= 80.0


@pytest.mark.heavy
def test_red_order_cls_forward():
    m = ODA2OrderedRegModel(num_repeats=1, num_emb=16, reduction_ratio=4,
                            cls_head=True, **COMMON)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, outs, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 16, 16, 1)
    # cls decode: outputs are softmax-weighted learnable bins in (0,1) x max
    assert float(out.min()) >= 0 and float(out.max()) <= 80.0
    # learnable bins exist with log-spaced init ending at 0.999
    bins = np.asarray(vs["params"]["decoder"]["reducer"]["depth_bins"])
    assert bins.shape == (16,)
    assert bins[0] == pytest.approx(0.001) and bins[-1] == pytest.approx(0.999)
    # reference quirk: the prepended 0.001 exceeds exp(-10) so the first
    # step is non-monotone (oda2_red_order_cls_decoder.py:49-53)
    assert (np.diff(bins)[1:] > 0).all()


@pytest.mark.heavy
def test_red_order_swin_gen1_forward():
    m = ODA2OrderedSwinModel(num_repeats=1, num_emb=16, window_size=4,
                             **COMMON)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, outs, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 16, 16, 1)
    # learnable sinusoidal embedding table present
    assert vs["params"]["decoder"]["reducer"]["depth_embedding"].shape \
        == (16, 32)


def test_red_reg_forward():
    m = ODA2RedRegModel(**COMMON)
    # reduction ratios up to 8 at 1/4 scale need H,W multiples of 32
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    # 1/4 scale minus the 3x3 VALID quirk
    assert out.shape == (1, 14, 14, 1)
    assert len(attns) == 4


@pytest.mark.heavy
def test_oda2_conv_forward():
    m = ODA2ConvModel(decoder_channels=32, min_depth=0.001, max_depth=80.0,
                      encoder_type="custom", use_checkpoint=False,
                      resize_to_multiple=False, encoder_kwargs=TINY_ENC)
    x = jnp.asarray(np.random.RandomState(4).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, aux = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)
