"""ODA family tests (tiny encoder)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.oda.encoder import oda_resize_policy
from mde_tpu.models.oda.models import (
    ODAConvModel, ODALunaModel, ODALunaClsModel, ODABinsModel,
)

TINY_ENC = dict(embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8))
COMMON = dict(decoder_channels=32, min_depth=0.001, max_depth=80.0,
              resize_to_multiple=False, encoder_kwargs=TINY_ENC)


def test_oda_resize_policy():
    # reference encoder.py:79-84: round to nearest 384 multiple
    assert oda_resize_policy(352, 1216) == (384, 1152)
    assert oda_resize_policy(352, 704) == (384, 768)
    assert oda_resize_policy(480, 640) == (384, 768)


def test_oda_conv_forward():
    m = ODAConvModel(**COMMON)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, aux = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    # decoder ends at 1/2 scale
    assert out.shape == (1, 32, 32, 1)
    assert aux is None
    assert float(out.min()) >= 0.001 and float(out.max()) <= 80.0


@pytest.mark.parametrize("use_rp", [False, True])
def test_oda_luna_forward(use_rp):
    m = ODALunaModel(num_aux=8, aux_dim=16, num_heads=4, use_rp=use_rp,
                     **COMMON)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, aux, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)
    assert aux.shape == (1, 8, 16)
    assert len(attns) == 8  # (attn1, attn2) x 4 scales


def test_oda_luna_cls_forward():
    m = ODALunaClsModel(num_bins=8, num_aux=8, aux_dim=16, num_heads=4,
                        **COMMON)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, aux, centers, attns = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)
    assert centers.shape == (1, 8)
    # NOTE: the reference's ELU(0.1) bin widths may be negative at init
    # (oda_luna_cls.py:80-81) so centers need not be monotone — only finite
    # and bounded by the cumulative width budget.
    c = np.asarray(centers)[0]
    assert np.isfinite(c).all()
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.heavy
def test_oda_bins_forward():
    m = ODABinsModel(num_bins=8, **COMMON)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, edges = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    assert out.shape == (1, 32, 32, 1)
    assert edges.shape == (1, 9)
