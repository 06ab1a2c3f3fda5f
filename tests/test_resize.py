"""Parity of the matmul-resize ops vs torch interpolation semantics.

torch (CPU build) is available in the image; these tests pin our
align_corners / adaptive-pool math to torch's reference implementation —
resize parity is the #1 hard part for eval parity (SURVEY.md §7.3).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from mde_tpu.ops.resize import (
    resize_bilinear, resize_nearest, adaptive_avg_pool2d, upsample2d,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def _to_nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("in_size,out_size,align", [
    ((14, 28), (112, 224), True),
    ((112, 224), (448, 896), True),
    pytest.param((352, 704), (448, 896), True, marks=pytest.mark.heavy),
    ((13, 17), (29, 37), True),
    ((29, 37), (13, 17), True),
    ((14, 28), (112, 224), False),
    ((29, 37), (13, 17), False),
    ((1, 1), (7, 7), True),
])
def test_bilinear_matches_torch(in_size, out_size, align):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_size, 3).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda a: resize_bilinear(a, out_size, align_corners=align))(jnp.asarray(x)))
    want = _to_nhwc(F.interpolate(_nchw(x), size=out_size, mode="bilinear",
                                  align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize("in_size,out_size", [
    ((14, 28), (28, 56)),
    ((29, 37), (13, 17)),
])
def test_nearest_matches_torch(in_size, out_size):
    rng = np.random.RandomState(1)
    x = rng.randn(1, *in_size, 2).astype(np.float32)
    got = np.asarray(jax.jit(lambda a: resize_nearest(a, out_size))(jnp.asarray(x)))
    want = _to_nhwc(F.interpolate(_nchw(x), size=out_size, mode="nearest"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [
    ((14, 28), (1, 1)),
    ((14, 28), (2, 2)),
    ((15, 23), (3, 6)),
    ((7, 7), (6, 6)),
])
def test_adaptive_avg_pool_matches_torch(in_size, out_size):
    rng = np.random.RandomState(2)
    x = rng.randn(2, *in_size, 4).astype(np.float32)
    got = np.asarray(jax.jit(lambda a: adaptive_avg_pool2d(a, out_size))(jnp.asarray(x)))
    want = _to_nhwc(F.adaptive_avg_pool2d(_nchw(x), out_size))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample2d_is_align_corners_bilinear():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 8, 12, 3).astype(np.float32)
    got = np.asarray(jax.jit(lambda a: upsample2d(a, 2))(jnp.asarray(x)))
    want = _to_nhwc(F.interpolate(_nchw(x), scale_factor=2, mode="bilinear",
                                  align_corners=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
