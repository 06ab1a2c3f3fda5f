"""Resize / pooling ops with exact torch interpolation semantics, as matmuls.

The reference leans on ``F.interpolate(mode='bilinear', align_corners=True)``
and ``nn.UpsamplingBilinear2d`` everywhere (input resize, neck upsampling, PPM
upsampling). jax.image.resize has no ``align_corners`` mode, and gather-based
interpolation maps poorly onto the TPU. Since every shape is static under jit,
we instead build the (out, in) interpolation matrices at trace time as numpy
constants and apply them as two dense matmuls:

    out[b, i, j, c] = sum_{H, W} A_h[i, H] * x[b, H, W, c] * A_w[j, W]

which XLA tiles straight onto the MXU. Separable, exact, differentiable (the
VJP is the transposed matmuls), and fuses with surrounding ops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic 1-D linear interpolation matrix."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        A[:, 0] = 1.0
        return A
    if align_corners:
        if out_size == 1:
            src = np.zeros(1, dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, None)  # torch clamps negative source coords to 0
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (src - i0).astype(np.float32)
    rows = np.arange(out_size)
    A[rows, i0] += 1.0 - frac
    A[rows, i1] += frac
    return A


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """torch 'nearest' (floor) index-selection matrix."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    src = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    src = np.clip(src.astype(np.int64), 0, in_size - 1)
    A[np.arange(out_size), src] = 1.0
    return A


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """torch AdaptiveAvgPool2d region-mean matrix."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        A[i, start:end] = 1.0 / (end - start)
    return A


def _apply_separable(x: jnp.ndarray, A_h: np.ndarray, A_w: np.ndarray) -> jnp.ndarray:
    """Apply per-axis matrices to NHWC ``x``; compute in f32, cast back."""
    orig_dtype = x.dtype
    y = jnp.einsum(
        "iH,bHWc->biWc", jnp.asarray(A_h), x.astype(jnp.float32),
        precision="highest",
    )
    y = jnp.einsum(
        "jW,biWc->bijc", jnp.asarray(A_w), y,
        precision="highest",
    )
    return y.astype(orig_dtype)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int],
                    align_corners: bool = True) -> jnp.ndarray:
    """NHWC bilinear resize matching ``F.interpolate(..., mode='bilinear')``."""
    out_h, out_w = size
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    return _apply_separable(
        x,
        _bilinear_matrix(in_h, out_h, align_corners),
        _bilinear_matrix(in_w, out_w, align_corners),
    )


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    out_h, out_w = size
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    return _apply_separable(x, _nearest_matrix(in_h, out_h), _nearest_matrix(in_w, out_w))


def upsample2d(x: jnp.ndarray, scale: int, align_corners: bool = True) -> jnp.ndarray:
    """``nn.UpsamplingBilinear2d(scale_factor=scale)`` equivalent (align_corners=True)."""
    return resize_bilinear(x, (x.shape[1] * scale, x.shape[2] * scale),
                           align_corners=align_corners)


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC ``nn.AdaptiveAvgPool2d`` equivalent."""
    out_h, out_w = output_size
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    return _apply_separable(
        x, _adaptive_avg_matrix(in_h, out_h), _adaptive_avg_matrix(in_w, out_w)
    )
