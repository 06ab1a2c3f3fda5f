"""Pyramid Pooling Module (NHWC).

Reference: ``model/ODA2/oda2_layer_utils.py:55-109`` (GELU variant with BN) and
the PSP head used by NewCRFs. Adaptive pools are region-mean matmuls
(:mod:`mde_tpu.ops.resize`), so the whole module is conv/matmul work on MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple, Callable

import jax.numpy as jnp
import flax.linen as nn

from . import tnn

from .resize import adaptive_avg_pool2d, resize_bilinear
from .pad import pad2d


class PyramidPoolingModule(nn.Module):
    proj_ch: int
    out_ch: int
    spatial_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    act: Callable = tnn.gelu
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape

        def bn(name):
            return nn.BatchNorm(
                use_running_average=tnn.bn_use_running_average(self, train), momentum=1.0 - self.bn_momentum,
                epsilon=self.bn_eps, dtype=self.dtype, param_dtype=jnp.float32,
                axis_name=self.axis_name, name=name)

        spp = [x]
        for i, size in enumerate(self.spatial_sizes):
            pooled = adaptive_avg_pool2d(x, (size, size))
            red = nn.Conv(self.proj_ch, (1, 1), use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"reduce{i}_conv")(pooled)
            red = bn(f"reduce{i}_bn")(red)
            red = self.act(red)
            spp.append(resize_bilinear(red, (h, w), align_corners=True))

        y = jnp.concatenate(spp, axis=-1)
        y = pad2d(y, 1, 1, 1, 1, mode="edge")
        y = nn.Conv(self.out_ch, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="out_conv")(y)
        y = bn("out_bn")(y)
        y = self.act(y)
        return y


class PyramidPoolingModuleV1(nn.Module):
    """ODA gen-1 PPM (reference ``model/ODA/layer_utils.py:65-107``): per-size
    adaptive pool -> biased 1x1 conv to in_ch/num_pooling (no norm, no act) ->
    align_corners bilinear upsample; concat with x -> bias-free 1x1 conv ->
    BatchNorm (no act). Used by the Luna-RP and Jeju decoders."""

    out_ch: int
    spatial_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = len(self.spatial_sizes)
        assert c % n == 0, "in_ch must divide num_pooling (layer_utils.py:77)"

        spp = [x]
        for i, size in enumerate(self.spatial_sizes):
            pooled = adaptive_avg_pool2d(x, (size, size))
            red = nn.Conv(c // n, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"reduce{i}_conv")(pooled)
            spp.append(resize_bilinear(red, (h, w), align_corners=True))

        y = jnp.concatenate(spp, axis=-1)  # (b, h, w, 2c)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="out_conv")(y)
        y = nn.BatchNorm(
            use_running_average=tnn.bn_use_running_average(self, train),
            momentum=1.0 - self.bn_momentum, epsilon=self.bn_eps,
            dtype=self.dtype, param_dtype=jnp.float32,
            axis_name=self.axis_name, name="out_bn")(y)
        return y
