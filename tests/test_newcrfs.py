"""NewCRFs family tests (tiny dims)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.newcrfs.model import NewCRFDepth
from mde_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

TINY = dict(
    version="custom04",
    encoder_kwargs=dict(
        embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
        in_channels=(8, 16, 32, 64), crf_dims=(8, 16, 32, 64)),
)


def test_pixel_shuffle_matches_torch():
    import torch
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4, 16).astype(np.float32)  # NHWC
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    want = torch.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # unshuffle inverts
    back = np.asarray(pixel_unshuffle(jnp.asarray(got), 2))
    np.testing.assert_array_equal(back, x)


@pytest.fixture(scope="module")
def tiny_newcrfs():
    m = NewCRFDepth(min_depth=0.001, max_depth=10.0, **TINY)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 96, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out = jax.jit(lambda v, xx: m.apply(v, xx))(vs, x)
    return m, x, vs, out


def test_output_full_resolution_and_range(tiny_newcrfs):
    m, x, vs, out = tiny_newcrfs
    # DispHead upsamples x4 from 1/4 scale -> full input resolution
    assert out.shape == (1, 64, 96, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= m.max_depth


def test_train_mode_updates_bn(tiny_newcrfs):
    m, x, vs, _ = tiny_newcrfs
    out, updates = jax.jit(
        lambda v, xx: m.apply(v, xx, train=True, mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(1)}))(vs, x)
    assert "batch_stats" in updates


def test_version_table():
    # reference NewCRFDepth.py:28-42 version parsing
    m = NewCRFDepth(version="large07")
    assert int(m.version[-2:]) == 7


def test_uperhead_fpn_forward():
    """UPerHead (reference uper_crf_head.py:255-314, present-unused there):
    lateral 1x1 -> top-down bilinear adds -> 3x3 smoothing, finest map out."""
    from mde_tpu.models.newcrfs import UPerHead

    feats = [
        jax.random.normal(jax.random.PRNGKey(i), (2, 16 // s, 24 // s, 8 * s))
        for i, s in enumerate((1, 2, 4, 8))
    ]
    head = UPerHead(channels=16)
    params = head.init(jax.random.PRNGKey(9), feats)
    out = head.apply(params, feats)
    assert out.shape == (2, 16, 24, 16)
    assert np.isfinite(np.asarray(out)).all()
    # ReLU output, and the top-down path must mix coarse levels into the
    # finest map: zeroing the coarsest input must change the output
    assert float(jnp.min(out)) >= 0.0
    feats2 = feats[:3] + [jnp.zeros_like(feats[3])]
    out2 = head.apply(params, feats2)
    assert float(jnp.max(jnp.abs(out2 - out))) > 0

    # norm variant: bias-free convs + BN (mmcv ConvModule rule)
    head_bn = UPerHead(channels=16, use_norm=True)
    vars_bn = head_bn.init(jax.random.PRNGKey(10), feats)
    assert "bn" in str(sorted(vars_bn["params"].keys()))
    out_bn = head_bn.apply(vars_bn, feats)
    assert out_bn.shape == (2, 16, 24, 16)


def test_convex_upsample_matches_torch_reference():
    """``convex_upsample_4x`` vs an executable transcription of the reference
    ``NewCRFDepth.upsample_mask`` (NewCRFDepth.py:110-121)."""
    import torch
    import torch.nn.functional as F
    from mde_tpu.models.newcrfs.model import convex_upsample_4x

    rng = np.random.RandomState(3)
    b, h, w = 2, 5, 7
    disp = rng.rand(b, 1, h, w).astype(np.float32)
    mask = rng.randn(b, 16 * 9, h, w).astype(np.float32)

    # reference math, verbatim semantics
    tm = torch.from_numpy(mask).view(b, 1, 9, 4, 4, h, w)
    tm = torch.softmax(tm, dim=2)
    up = F.unfold(torch.from_numpy(disp), kernel_size=3, padding=1)
    up = up.view(b, 1, 9, 1, 1, h, w)
    up = torch.sum(tm * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(b, 1, 4 * h, 4 * w)
    want = up.numpy()[:, 0]

    got = np.asarray(convex_upsample_4x(
        jnp.asarray(disp.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1))))[..., 0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_newcrfs_mask_up_mode_forward():
    m = NewCRFDepth(min_depth=0.001, max_depth=10.0, up_mode="mask", **TINY)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out = jax.jit(lambda v, xx: m.apply(v, xx))(vs, x)
    assert out.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()
    assert "mask_head_conv0" in vs["params"]
