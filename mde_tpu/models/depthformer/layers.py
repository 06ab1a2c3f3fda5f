"""Depthformer shared primitives.

Behavioral reference: ``model/Depthformer/{layer_utils,self_attention,
feed_forward,vit_layer}.py``. Pre-norm residual attention/FF blocks with
separate q/k/v projections and a ``key_query_dim`` that may differ from the
hidden dim; ConvBN with replicate padding and optional identity residual;
bilinear upscale-concat-activation.

Note on the reference: ``decoder.py`` (v1) calls ``ViTLayer(hidden, heads,
...)`` while ``vit_layer.py`` was later refactored to take ``(hidden,
key_query_dim, heads, ...)`` — the v1 call site is bitrotten upstream. We keep
``key_query_dim`` optional (None -> hidden_dim) so every version constructs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ...ops.init import trunc_normal_init
from ...ops.pad import pad2d
from ...ops.resize import upsample2d


class ConvBN(nn.Module):
    """ConvBN with optional same-channel residual (reference
    ``layer_utils.py:6-34``; distinct from the ODA2 ConvBN: has residual)."""

    out_ch: int
    kernel_size: int = 3
    act: Optional[Callable] = None
    use_residual: bool = True
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        assert k % 2 == 1
        identity = x
        in_ch = x.shape[-1]
        pad = k // 2
        y = pad2d(x, pad, pad, pad, pad, mode="edge")
        y = nn.Conv(self.out_ch, (k, k), padding="VALID", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(y)
        y = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                         momentum=1.0 - self.bn_momentum, epsilon=self.bn_eps,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.axis_name, name="bn")(y)
        if self.act is not None:
            y = self.act(y)
        if self.use_residual and in_ch == self.out_ch:
            y = y + identity
        return y


class ConvBNBlock(nn.Module):
    """Stack of ConvBN (reference ``layer_utils.py:37-62``)."""

    out_ch: int
    kernel_size: int = 3
    num_layers: int = 2
    act: Callable = tnn.gelu
    use_residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = ConvBN(self.out_ch, self.kernel_size, act=self.act,
                       use_residual=self.use_residual, dtype=self.dtype,
                       name=f"layers{i}")(x, train)
        return x


class ResConvBNBlock(nn.Module):
    """Residual conv block with projection shortcut (``layer_utils.py:65-99``)."""

    out_ch: int
    kernel_size: int = 3
    num_layers: int = 2
    act: Callable = tnn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        in_ch = x.shape[-1]
        y = x
        for i in range(self.num_layers):
            y = ConvBN(self.out_ch, self.kernel_size,
                       act=self.act if i != self.num_layers - 1 else None,
                       use_residual=False, dtype=self.dtype,
                       name=f"layers{i}")(y, train)
        if in_ch != self.out_ch:
            identity = ConvBN(self.out_ch, 1, act=None, use_residual=False,
                              dtype=self.dtype, name="shortcut")(identity, train)
        return y + identity


def upscale_concat_act(x_orig, y_to_upscale, scale: int, act=tnn.gelu):
    """Bilinear x`scale` (align_corners=True) + concat + act
    (reference ``layer_utils.py:102-122``)."""
    y = upsample2d(y_to_upscale, scale)
    out = jnp.concatenate([x_orig, y], axis=-1)
    return act(out) if act is not None else out


class SelfAttentionBlock(nn.Module):
    """Pre-norm residual MHSA with separate kq dim, returns attn weights
    (reference ``self_attention.py:7-88``)."""

    key_query_dim: Optional[int] = None
    num_heads: int = 4
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    post_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d = x.shape[-1]
        kq = self.key_query_dim or d
        nh = self.num_heads
        assert d % nh == 0 and kq % nh == 0
        scale = (kq // nh) ** -0.5

        residual = x
        if not self.post_norm:
            x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm")(x)

        def dense(feat, name):
            return nn.Dense(feat, dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        q = dense(kq, "query_proj")(x).reshape(*x.shape[:-1], nh, kq // nh)
        k = dense(kq, "key_proj")(x).reshape(*x.shape[:-1], nh, kq // nh)
        v = dense(d, "value_proj")(x).reshape(*x.shape[:-1], nh, d // nh)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
        weights = attn
        attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
            attn.astype(self.dtype))

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(*x.shape[:-1], d)
        out = dense(d, "out_proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        out = out + residual
        if self.post_norm:
            out = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                               name="norm")(out)
        return out, weights


class FeedForwardBlock(nn.Module):
    """Pre/post-norm residual FF (reference ``feed_forward.py``)."""

    feedforward_dim: Optional[int] = None
    drop_prob: float = 0.1
    act: Callable = tnn.gelu
    post_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = x.shape[-1]
        hidden = self.feedforward_dim or 4 * d
        identity = x
        if not self.post_norm:
            x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm")(x)
        x = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02), name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        x = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02), name="fc2")(x)
        x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        out = identity + x
        if self.post_norm:
            out = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                               name="norm")(out)
        return out


class ViTLayer(nn.Module):
    """num_repeat x (SA + FF), returns last attn weights
    (reference ``vit_layer.py:9-44``)."""

    key_query_dim: Optional[int] = None
    num_heads: int = 4
    num_repeat: int = 1
    feedforward_dim: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    act: Callable = tnn.gelu  # v7/v8 pass SiLU through act_layer
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        sa = SelfAttentionBlock(
            key_query_dim=self.key_query_dim, num_heads=self.num_heads,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="self_attn")
        ff = FeedForwardBlock(
            feedforward_dim=self.feedforward_dim, drop_prob=self.drop_prob,
            act=self.act, dtype=self.dtype, name="feed_forward")
        weights = None
        for _ in range(self.num_repeat):
            x, weights = sa(x, train=train)
            x = ff(x, train=train)
        return x, weights
