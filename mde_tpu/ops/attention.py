"""Attention primitives: relative-position-bias window attention and plain MHA.

Window attention follows the reference semantics
(``model/ODA2/oda2_swin_transformer.py:95-183``) but is laid out TPU-first:
windows ride in the batch dimension as static shapes, QK^T/PV are batched
einsums on the MXU, the relative-position index is a trace-time numpy constant
and the SW-MSA mask (when present) is built on device from iota (static
shapes, no embedded literal). On TPU the whole attention body runs as the
fused Pallas kernel (``ops/pallas/window_attention.py``).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .init import trunc_normal_init


@functools.lru_cache(maxsize=None)
def relative_position_index(win_h: int, win_w: int) -> np.ndarray:
    """(N, N) lookup into the (2wh-1)*(2ww-1) rel-pos bias table
    (construction mirrors ``oda2_swin_transformer.py:128-139``)."""
    coords_h = np.arange(win_h)
    coords_w = np.arange(win_w)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += win_h - 1
    rel[:, :, 1] += win_w - 1
    rel[:, :, 0] *= 2 * win_w - 1
    return rel.sum(-1)  # (N, N)


class WindowAttention(nn.Module):
    """W-MSA / SW-MSA with relative position bias.

    Input: (B_windows, N, C) where N = win_h * win_w.
    ``mask``: optional (num_windows, N, N) additive mask (0 / -100) for
    shifted windows; B_windows must be a multiple of num_windows.

    ``attn_impl``: 'auto' routes through the fused Pallas kernel on TPU
    (softmax/bias/mask fused in VMEM, no (BW, heads, N, N) HBM tensor) and
    the XLA einsum path elsewhere; attention dropout (train-time, prob>0)
    forces the XLA path since the kernel is deterministic.
    """

    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        from .pallas import resolve_impl, fused_window_attention

        bw, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        assert c % nh == 0
        scale = hd ** -0.5

        qkv = nn.Dense(
            3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(0.02), name="qkv",
        )(x)

        # relative position bias: trace-time constant gather from the table
        rpi = relative_position_index(self.window_size, self.window_size)
        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * self.window_size - 1) ** 2, nh),
        )
        bias = table[rpi.reshape(-1)].reshape(n, n, nh)
        bias = bias.transpose(2, 0, 1)  # (nh, n, n) f32

        impl = resolve_impl(self.attn_impl)
        use_fused = impl != "xla" and not (train and self.attn_drop_prob > 0)

        if use_fused:
            qkv = qkv.reshape(bw, n, 3, c)
            out = fused_window_attention(
                qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias,
                None if mask is None else jnp.asarray(mask, jnp.float32),
                nh, scale, impl=impl)
        else:
            qkv = qkv.reshape(bw, n, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (bw, n, nh, hd)

            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)  # (bw, nh, n, n)
            attn = attn + bias[None].astype(attn.dtype)

            if mask is not None:
                nw = mask.shape[0]
                m = jnp.asarray(mask, dtype=attn.dtype)  # (nw, n, n)
                attn = attn.reshape(bw // nw, nw, nh, n, n) + m[None, :, None]
                attn = attn.reshape(bw, nh, n, n)

            attn = jnp.asarray(attn, jnp.float32)
            attn = nn.softmax(attn, axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(attn)

            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bw, n, c)

        out = nn.Dense(
            c, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(0.02), name="proj",
        )(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        return out


class MultiHeadAttention(nn.Module):
    """Plain MHA with separate q/k/v inputs (used by mViT, Depthformer, Luna
    families). Query/key/value are token tensors (..., N, C)."""

    num_heads: int
    out_dim: Optional[int] = None
    key_query_dim: Optional[int] = None
    qkv_bias: bool = True
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    return_weights: bool = False

    @nn.compact
    def __call__(self, q_in: jnp.ndarray, k_in: jnp.ndarray, v_in: jnp.ndarray,
                 train: bool = False):
        c = q_in.shape[-1]
        out_dim = self.out_dim or c
        kq_dim = self.key_query_dim or c
        nh = self.num_heads
        assert kq_dim % nh == 0 and out_dim % nh == 0
        hd_kq = kq_dim // nh
        hd_v = out_dim // nh
        scale = hd_kq ** -0.5

        def dense(feat, name):
            return nn.Dense(feat, use_bias=self.qkv_bias, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        q = dense(kq_dim, "q_proj")(q_in)
        k = dense(kq_dim, "k_proj")(k_in)
        v = dense(out_dim, "v_proj")(v_in)

        q = q.reshape(*q.shape[:-1], nh, hd_kq)
        k = k.reshape(*k.shape[:-1], nh, hd_kq)
        v = v.reshape(*v.shape[:-1], nh, hd_v)

        attn = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
        attn = jnp.asarray(attn, jnp.float32)
        weights = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
            weights.astype(self.dtype))

        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(*out.shape[:-2], out_dim)
        out = dense(out_dim, "o_proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        if self.return_weights:
            return out, weights
        return out
