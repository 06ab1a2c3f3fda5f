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

The matrices are generated *on device* from iota at trace time (a few fused
VPU ops) rather than embedded as dense HLO constants — a 896x704 f32 literal
per resize made the serialized program too large for remote-compile
endpoints, and constants don't dedupe across call sites pre-optimization.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    """(out_size, in_size) row-stochastic 1-D linear interpolation matrix."""
    if in_size == 1:
        return jnp.ones((out_size, 1), jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = jnp.arange(out_size, dtype=jnp.float32) \
                * (float(in_size - 1) / float(out_size - 1))
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.maximum(src, 0.0)  # torch clamps negative source coords to 0
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    frac = src - i0.astype(jnp.float32)
    cols = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    # i0 == i1 at the right edge: the two terms sum to 1 exactly as the
    # numpy `A[rows, i0] += ...; A[rows, i1] += ...` construction did.
    return ((1.0 - frac)[:, None] * (cols == i0[:, None])
            + frac[:, None] * (cols == i1[:, None])).astype(jnp.float32)


def _nearest_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """torch 'nearest' (floor) index-selection matrix."""
    src = jnp.floor(jnp.arange(out_size, dtype=jnp.float32)
                    * (in_size / out_size))
    src = jnp.clip(src.astype(jnp.int32), 0, in_size - 1)
    cols = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    return (cols == src[:, None]).astype(jnp.float32)


def _adaptive_avg_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d region-mean matrix."""
    i = jnp.arange(out_size, dtype=jnp.int32)
    start = (i * in_size) // out_size
    end = ((i + 1) * in_size + out_size - 1) // out_size  # ceil
    cols = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    inside = (cols >= start[:, None]) & (cols < end[:, None])
    return inside.astype(jnp.float32) / (end - start)[:, None].astype(jnp.float32)


def _apply_separable(x: jnp.ndarray, A_h: jnp.ndarray, A_w: jnp.ndarray) -> jnp.ndarray:
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
