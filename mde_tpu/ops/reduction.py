"""Reduction attention: K/V from r x r mean-pooled tokens — O(HW * HW/r^2).

Behavioral reference: ``model/ODA2/oda2_red_order_reg_decoder.py:96-243`` and
``oda2_red_decoder.py:41-160``. Pre-norm residual SA where the queries see
every pixel but keys/values come from a linear projection + LayerNorm of the
r x r block means of the (optionally rolled) feature map.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from . import tnn

from .init import trunc_normal_init
from .window import cyclic_shift


def block_mean(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, C) mean over r x r blocks."""
    b, h, w, c = x.shape
    assert h % r == 0 and w % r == 0
    return x.reshape(b, h // r, r, w // r, r, c).mean(axis=(2, 4))


def sinusoidal_depth_embedding(num_emb: int, dims: int,
                               base: float = 2000.0) -> jnp.ndarray:
    """Fixed sinusoidal table (num_emb, dims) scaled by sqrt(1/dims)
    (reference ``oda2_red_order_reg_decoder.py:283-295``; cls variant uses
    base=1000, ``oda2_red_order_cls_decoder.py:62-71``)."""
    import numpy as np
    emb = np.zeros((num_emb, dims), np.float32)
    pos = np.arange(num_emb, dtype=np.float32)
    inv_freq = np.exp(np.arange(0.0, dims, 2.0, dtype=np.float32)
                      * (-math.log(base) / dims))
    pos_dot = np.outer(pos, inv_freq)
    emb[:, 0::2] = np.sin(pos_dot)
    emb[:, 1::2] = np.cos(pos_dot)
    emb *= math.sqrt(1.0 / dims)
    return jnp.asarray(emb)


class PreNormOrderedReductionSA(nn.Module):
    """Pre-norm residual reduction SA (``oda2_red_order_reg_decoder.py:96-187``).
    ``de`` (the depth embedding map) is accepted for interface parity; the
    reference's active code path does not mix it into q/k (commented out)."""

    num_heads: int
    reduction_ratio: int = 8
    shift_size: int = 0
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    return_weights: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, de: Optional[jnp.ndarray] = None,
                 train: bool = False):
        b, h, w, d = x.shape
        nh = self.num_heads
        hd = d // nh
        scale = hd ** -0.5
        r = self.reduction_ratio
        assert r % 2 == 0 and h % r == 0 and w % r == 0

        identity = x

        def dense(name, bias=True):
            return nn.Dense(d, use_bias=bias, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        x_norm = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                              name="norm")(x)
        q = dense("q_proj")(x_norm).reshape(b, h * w, nh, hd)

        xs = cyclic_shift(x, self.shift_size) if self.shift_size > 0 else x
        x_red = block_mean(xs, r)
        x_red = dense("mean_proj", bias=False)(x_red)
        x_red = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="mean_norm")(x_red)
        n_red = x_red.shape[1] * x_red.shape[2]
        k = dense("k_proj")(x_red).reshape(b, n_red, nh, hd)
        v = dense("v_proj")(x_red).reshape(b, n_red, nh, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
        weights = attn
        attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
            attn.astype(self.dtype))

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, d)
        out = dense("o_proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        out = out + identity
        return out, (weights if self.return_weights else None)


class PreNormReductionSA(nn.Module):
    """Plain (non-ordered) pre-norm reduction SA used by ``oda2_red_reg``
    (``oda2_red_decoder.py:41-120``). Differs from the ordered variant: the
    whole map is rolled BEFORE the norm (queries see the rolled map and the
    output is rolled back), and K/V come straight from the block means of the
    NORMED map — no mean_proj/mean_norm."""

    num_heads: int
    reduction_ratio: int = 2
    shift_size: int = 0
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    return_weights: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, h, w, d = x.shape
        nh = self.num_heads
        hd = d // nh
        scale = hd ** -0.5
        r = self.reduction_ratio
        assert r % 2 == 0 and h % r == 0 and w % r == 0

        identity = x

        def dense(name):
            return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        if self.shift_size > 0:
            x = cyclic_shift(x, self.shift_size)
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm")(x)
        q = dense("q_proj")(x).reshape(b, h * w, nh, hd)

        x_red = block_mean(x, r)
        n_red = x_red.shape[1] * x_red.shape[2]
        k = dense("k_proj")(x_red).reshape(b, n_red, nh, hd)
        v = dense("v_proj")(x_red).reshape(b, n_red, nh, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
        weights = attn
        attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
            attn.astype(self.dtype))

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, d)
        out = dense("o_proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        if self.shift_size > 0:
            out = cyclic_shift(out, -self.shift_size)
        out = out + identity
        return out, (weights if self.return_weights else None)
