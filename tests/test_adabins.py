"""AdaBins + EfficientNet tests (tiny width/depth multipliers)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.efficientnet import (
    EfficientNetFeatures, round_channels, round_repeats, tf_same_pad,
)
from mde_tpu.models.adabins.model import UnetAdaptiveBins

TINY_ENC = dict(width=0.1, depth=0.25, stem_ch=32, head_ch=256)


def test_b5_scaling_constants():
    """B5 (w1.6/d2.2) channel/repeat arithmetic matches timm."""
    assert round_channels(32, 1.6) == 48    # stem
    assert round_channels(16, 1.6) == 24    # stage0
    assert round_channels(24, 1.6) == 40
    assert round_channels(40, 1.6) == 64
    assert round_channels(80, 1.6) == 128
    assert round_channels(112, 1.6) == 176
    assert round_channels(192, 1.6) == 304
    assert round_channels(320, 1.6) == 512
    assert round_channels(1280, 1.6) == 2048  # head
    assert [round_repeats(r, 2.2) for r in (1, 2, 2, 3, 3, 4, 1)] == \
        [3, 5, 5, 7, 7, 9, 3]


def test_tf_same_pad_matches_torch_tf_padding():
    """TF SAME: extra pad right/bottom; output = ceil(in/stride)."""
    x = jnp.ones((1, 7, 7, 1))
    y = tf_same_pad(x, 3, 2)
    # out=ceil(7/2)=4 -> total pad (4-1)*2+3-7=2 -> (1,1) each side
    assert y.shape == (1, 9, 9, 1)
    x2 = jnp.ones((1, 8, 8, 1))
    y2 = tf_same_pad(x2, 3, 2)
    assert y2.shape == (1, 9, 9, 1)


@pytest.fixture(scope="module")
def tiny_effnet_feats():
    m = EfficientNetFeatures(**TINY_ENC)
    x = jnp.ones((1, 64, 64, 3))
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    feats = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    return feats


def test_features_list_contract(tiny_effnet_feats):
    """The reference indexes this list at 4,5,6,8,11 — shape contract
    (unet_adaptive_bins.py:44-45)."""
    feats = tiny_effnet_feats
    assert len(feats) == 13
    assert feats[0].shape == (1, 64, 64, 3)     # input
    assert feats[1].shape[1] == 32              # stem 1/2
    assert feats[4].shape[1] == 32              # stage0 1/2
    assert feats[5].shape[1] == 16              # stage1 1/4
    assert feats[6].shape[1] == 8               # stage2 1/8
    assert feats[8].shape[1] == 4               # stage4 1/16 (stride stays)
    assert feats[9].shape[1] == 2               # stage5 1/32
    assert feats[11].shape[1] == 2              # conv_head 1/32
    assert feats[11].shape[-1] == round_channels(256, 0.1, 8)


def test_adabins_forward_contract():
    m = UnetAdaptiveBins(n_bins=10, min_val=0.001, max_val=10.0,
                         encoder_kwargs=TINY_ENC)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    pred, bin_edges = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    # prediction at 1/2 input scale (decoder stops at stage-0 tap)
    assert pred.shape == (1, 32, 32, 1)
    assert bin_edges.shape == (1, 11)
    # bin edges start at min_val, monotone increasing, end <= max-ish
    edges = np.asarray(bin_edges)[0]
    assert edges[0] == pytest.approx(0.001)
    assert (np.diff(edges) > 0).all()
    assert edges[-1] <= 10.0 + 1e-4
    # prediction inside bin range
    assert float(pred.min()) >= 0.0
    assert float(pred.max()) <= 10.0


def test_adabins_bin_widths_normalized():
    m = UnetAdaptiveBins(n_bins=8, min_val=0.1, max_val=10.0,
                         encoder_kwargs=TINY_ENC)
    x = jnp.ones((1, 64, 64, 3))
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    pred, bin_edges = jax.jit(lambda v, a: m.apply(v, a))(vs, x)
    # widths sum to (max-min): edges span [min, min + (max-min)]
    edges = np.asarray(bin_edges)[0]
    assert edges[-1] - edges[0] == pytest.approx(9.9, rel=1e-4)
