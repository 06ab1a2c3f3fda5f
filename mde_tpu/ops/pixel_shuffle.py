"""Pixel shuffle / unshuffle (NHWC), matching torch channel ordering.

torch ``nn.PixelShuffle(r)``: out[b, c, h*r+i, w*r+j] = in[b, c*r^2 + i*r + j, h, w].
Used by NewCRFs inter-stage upsampling (``NewCRFDepth.py:132-136``) and the
ODA reorder upsamplers. Pure reshape/transpose — free under XLA fusion.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C)."""
    b, h, w, c = x.shape
    assert c % (r * r) == 0
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, i, w, j, co)
    return x.reshape(b, h * r, w * r, co)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r^2) (inverse of pixel_shuffle)."""
    b, hr, wr, c = x.shape
    assert hr % r == 0 and wr % r == 0
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h, w, c, i, j)
    return x.reshape(b, h, w, c * r * r)
