"""Depthwise 2-D convolution as shift–multiply–accumulate.

XLA lowers ``feature_group_count=C`` convolutions poorly (unrolled per-group
kernels: slow compiles on CPU, and no MXU benefit on TPU since depthwise conv
is bandwidth-bound VPU work anyway). A k x k depthwise conv is exactly

    out[h, w, c] = sum_{i,j} w[i, j, c] * x_pad[h+i, w+j, c]

i.e. k^2 statically-shifted elementwise FMAs, which XLA fuses into a single
VPU loop — and whose VJP is the same pattern reversed. Used by the DWConv-GLU
feed-forwards (reference ``oda2_red_order_reg_decoder.py:43-93``).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import flax.linen as nn

from .pad import pad2d
from .init import conv_kernel_normal_init


def depthwise_conv2d(x: jnp.ndarray, w: jnp.ndarray,
                     padding_mode: str = "edge") -> jnp.ndarray:
    """x: (B, H, W, C); w: (kh, kw, C). 'same' output size."""
    kh, kw, c = w.shape
    assert x.shape[-1] == c
    h, wd = x.shape[1], x.shape[2]
    xp = pad2d(x, kh // 2, kh // 2, kw // 2, kw // 2, mode=padding_mode)
    out = jnp.zeros_like(x)
    for i in range(kh):
        for j in range(kw):
            out = out + xp[:, i:i + h, j:j + wd, :] * w[i, j]
    return out


class DepthwiseConv2d(nn.Module):
    """Bias-free depthwise conv module with replicate padding."""

    kernel_size: int = 5
    padding_mode: str = "edge"
    kernel_init: Callable = None  # default: conv_kernel_normal_init
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        init = self.kernel_init or conv_kernel_normal_init(k, k)
        w = self.param("kernel", init, (k, k, x.shape[-1]))
        return depthwise_conv2d(x, w.astype(self.dtype),
                                padding_mode=self.padding_mode)
