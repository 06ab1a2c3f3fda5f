"""Conv + Norm + Act building block (NHWC).

Equivalent of the reference's ``ConvBN`` (``model/ODA2/oda2_layer_utils.py:12-52``
and ``model/ODA/layer_utils.py:7-37``): odd-kernel conv with *replicate*
padding, no conv bias, BatchNorm (or GroupNorm) and GELU. TPU-native choices:

* NHWC layout (XLA's native TPU conv layout — no transposes);
* replicate padding via an explicit edge-pad + VALID conv (XLA folds the pad
  into the convolution's input fetch);
* BatchNorm is flax's, with ``axis_name`` plumbed for SyncBN semantics across
  the data mesh (the reference hints SyncBatchNorm via
  ``utils/common_utils.py:80,86``). Note flax momentum = 1 - torch momentum.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from . import tnn

from .pad import pad2d


class ConvBN(nn.Module):
    out_ch: int
    kernel_size: int = 3
    conv_groups: int = 1
    use_gn: bool = False
    gn_groups: int = 1
    act: Optional[Callable] = tnn.gelu
    bn_momentum: float = 0.1  # torch convention; converted internally
    bn_eps: float = 1e-5
    padding_mode: str = "edge"  # torch 'replicate'
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None  # set to "data" for SyncBN under shard_map

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        assert k % 2 == 1, "reference ConvBN only supports odd kernels"
        pad = k // 2
        x = pad2d(x, pad, pad, pad, pad, mode=self.padding_mode)
        x = nn.Conv(
            features=self.out_ch,
            kernel_size=(k, k),
            strides=(1, 1),
            padding="VALID",
            feature_group_count=self.conv_groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.use_gn:
            x = nn.GroupNorm(
                num_groups=self.gn_groups, epsilon=self.bn_eps,
                dtype=self.dtype, param_dtype=jnp.float32, name="norm",
            )(x)
        else:
            x = nn.BatchNorm(
                use_running_average=tnn.bn_use_running_average(self, train),
                momentum=1.0 - self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.axis_name,
                name="norm",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x
