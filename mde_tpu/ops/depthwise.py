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

from .init import conv_kernel_normal_init


def depthwise_conv2d(x: jnp.ndarray, w: jnp.ndarray,
                     padding_mode: str = "edge",
                     impl: str = "auto") -> jnp.ndarray:
    """x: (B, H, W, C); w: (kh, kw, C). 'same' output size.

    On TPU this dispatches to the fused Pallas kernel (one HBM read + one
    write; the shift-FMA lowering costs k^2 HBM passes there — 18 ms vs ~1 ms
    at the flagship's (4,112,224,2048) FF shapes). CPU keeps shift-FMA, which
    also avoids XLA:CPU's pathological grouped-conv compiles."""
    kh, kw, c = w.shape
    assert x.shape[-1] == c
    from .pallas import resolve_impl
    from .pallas.depthwise import fused_depthwise_conv2d, xla_depthwise_conv2d
    resolved = resolve_impl(impl)
    if resolved != "xla":
        return fused_depthwise_conv2d(x, w, padding_mode, impl=resolved)
    return xla_depthwise_conv2d(x, w, padding_mode)


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
