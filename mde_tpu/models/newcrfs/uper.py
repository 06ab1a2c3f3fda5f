"""UPerHead — FPN decode head (present-but-unused in the reference).

Behavioral reference: ``model/NewCRFs/uper_crf_head.py:255-314`` (UPerNet,
arXiv 1807.10221). The reference file defines it next to the PSP head but
``NewCRFDepth`` only ever instantiates PSP; the upstream UPerHead variant
also has its PSP lateral commented out (``uper_crf_head.py:296``), so this
port is a pure FPN: per-level lateral 1x1 convs, top-down bilinear
(align_corners=False) adds, 3x3 smoothing convs on every level but the
coarsest, returning the finest map.

ConvModule semantics at the reference's defaults (``uper_crf_head.py:99-101``:
``conv_cfg=None, norm_cfg=None, act_cfg=ReLU``): biased conv + ReLU, no norm.
``use_norm=True`` adds the BN that mmcv would insert with a BN ``norm_cfg``
(conv goes bias-free then, mmcv's rule).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn
from ...ops.resize import resize_bilinear


class UPerHead(nn.Module):
    """FPN top-down decode head over 4-level backbone features."""

    channels: int = 512
    align_corners: bool = False
    use_norm: bool = False
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def _conv_module(self, x, features, kernel, name, train):
        y = nn.Conv(features, (kernel, kernel), padding=kernel // 2,
                    use_bias=not self.use_norm, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"{name}_conv")(x)
        if self.use_norm:
            y = nn.BatchNorm(
                use_running_average=tnn.bn_use_running_average(self, train),
                momentum=1.0 - self.bn_momentum, epsilon=self.bn_eps,
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"{name}_bn")(y)
        return nn.relu(y)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        """inputs: per-level NHWC features, finest first (1/4 ... 1/32)."""
        laterals = [
            self._conv_module(x, self.channels, 1, f"lateral{i}", train)
            for i, x in enumerate(inputs)
        ]

        # top-down path (reference ``uper_crf_head.py:299-306``)
        for i in range(len(laterals) - 1, 0, -1):
            prev_hw: Tuple[int, int] = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], prev_hw, align_corners=self.align_corners)

        # 3x3 smoothing on all but the coarsest; the head returns the finest
        # map (reference returns ``fpn_outs[0]``, ``uper_crf_head.py:316``)
        return self._conv_module(laterals[0], self.channels, 3, "fpn0", train)
