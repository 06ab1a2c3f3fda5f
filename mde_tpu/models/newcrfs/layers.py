"""NewCRFs decoder layers — neural-window fully-connected CRFs.

Behavioral reference: ``model/NewCRFs/newcrf_layers.py``. The core idea: window
attention where **Q, K come from the image features and V is the previous
(coarser) depth estimate** (qk-only projection ``:102,118-119``, external v
``:143-146``) — attention acts as learned CRF message passing over the
estimate. Blocks alternate W-MSA / SW-MSA like Swin; each NewCRF stage is 2
blocks + output LayerNorm.

TPU-native: NHWC, windows folded into batch via static reshapes, SW mask as a
trace-time constant (same machinery as models/swin.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ...ops.attention import relative_position_index
from ...ops.init import trunc_normal_init
from ...ops.mlp import SwinMLP
from ...ops.window import (
    window_partition, window_reverse, shifted_window_attn_mask,
    cyclic_shift, cyclic_unshift,
)
from ...ops.pad import pad_to_multiple


class CRFWindowAttention(nn.Module):
    """Window attention with qk from x, v external (reference ``:62-149``)."""

    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, v: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None, train: bool = False):
        from ...ops.pallas import resolve_impl, fused_window_attention

        bw, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5

        qk = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=trunc_normal_init(0.02), name="qk")(x)

        rpi = relative_position_index(self.window_size, self.window_size)
        table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * self.window_size - 1) ** 2, nh))
        bias = table[rpi.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)

        v_dim = v.shape[-1]
        assert v_dim == c, "v_dim must equal embed_dim (reference ``:143``)"

        impl = resolve_impl(self.attn_impl)
        use_fused = impl != "xla" and not (train and self.attn_drop_prob > 0)

        if use_fused:
            qk = qk.reshape(bw, n, 2, c)
            out = fused_window_attention(
                qk[:, :, 0], qk[:, :, 1], v, bias,
                None if mask is None else jnp.asarray(mask, jnp.float32),
                nh, scale, impl=impl)
        else:
            qk = qk.reshape(bw, n, 2, nh, hd)
            q, k = qk[:, :, 0], qk[:, :, 1]

            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            attn = attn + bias[None].astype(attn.dtype)

            if mask is not None:
                nw = mask.shape[0]
                m = jnp.asarray(mask, attn.dtype)
                attn = attn.reshape(bw // nw, nw, nh, n, n) + m[None, :, None]
                attn = attn.reshape(bw, nh, n, n)

            attn = nn.softmax(jnp.asarray(attn, jnp.float32),
                              axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(attn)

            vh = v.reshape(bw, n, nh, v_dim // nh)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(bw, n, v_dim)

        out = nn.Dense(v_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init(0.02), name="proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        return out


class CRFBlock(nn.Module):
    """One CRF message-passing block (reference ``CRFBlock``, ``:152-257``)."""

    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, v: jnp.ndarray, train: bool = False):
        b, h, w, c = x.shape
        r = self.window_size

        shortcut = x
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)

        # reference pads x and v with zeros (F.pad default, ``:215-216``)
        x = pad_to_multiple(x, r, mode="constant")
        v = pad_to_multiple(v, r, mode="constant")
        hp, wp = x.shape[1], x.shape[2]

        if self.shift_size > 0:
            x = cyclic_shift(x, self.shift_size)
            v = cyclic_shift(v, self.shift_size)
            mask = shifted_window_attn_mask(hp, wp, r, self.shift_size)
        else:
            mask = None

        xw = window_partition(x, r)
        vw = window_partition(v, r)
        ow = CRFWindowAttention(
            num_heads=self.num_heads, window_size=r, qkv_bias=self.qkv_bias,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="attn")(xw, vw, mask=mask, train=train)
        out = window_reverse(ow, r, hp, wp)

        if self.shift_size > 0:
            out = cyclic_unshift(out, self.shift_size)
        out = out[:, :h, :w, :]

        x = shortcut + out
        y = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = SwinMLP(hidden_features=int(c * self.mlp_ratio),
                    drop_prob=self.drop_prob, dtype=self.dtype, name="mlp")(y, train=train)
        return x + y


class NewCRF(nn.Module):
    """One NewCRF stage: optional 3x3 input/value projections + 2 CRF blocks
    (shift 0 / r//2) + LayerNorm (reference ``NewCRF``, ``:366-433``)."""

    embed_dim: int
    num_heads: int
    window_size: int = 7
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, v: jnp.ndarray, train: bool = False):
        if x.shape[-1] != self.embed_dim:
            x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj_x")(x)
        if v.shape[-1] != self.embed_dim:
            v = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj_v")(v)

        for i in range(self.depth):
            x = CRFBlock(
                num_heads=self.num_heads, window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                dtype=self.dtype, name=f"blocks{i}")(x, v, train=train)
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm_crf")(x)
        return x
