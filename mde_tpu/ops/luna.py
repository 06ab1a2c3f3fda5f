"""Luna — Linear Unified Nested Attention (arXiv 2106.01540).

Behavioral reference: ``model/Depthformer/luna_layer.py``. Two nested
attentions make global attention linear in pixels: K aux tokens attend to the
HW pixels (attn1), then pixels attend to the K *updated* aux tokens (attn2) —
O(K*HW). Variants: post-norm (``LunaBlock``), pre-norm (``PreNormLunaBlock``)
and the aux-update-only ``LunaHalfBlock``. Note the reference's attention
scale uses hidden_dim//num_heads regardless of qk_proj_dim (``:42-43``) —
kept for parity.

Used by Depthformer v6-v8 and the ODA/ODA2 Luna decoders. Both attentions are
plain batched einsums -> MXU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from . import tnn

from .init import trunc_normal_init


def _heads(x, nh):
    b, n, d = x.shape
    return x.reshape(b, n, nh, d // nh)


class _LunaCore(nn.Module):
    """Shared projection machinery for the Luna variants."""

    qk_proj_dim: int
    num_heads: int
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def _dense(self, feat, name):
        return nn.Dense(feat, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=trunc_normal_init(0.02), name=name)

    def _attend(self, q, k, v, scale, train, out_dim):
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
        weights = attn
        attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
            attn.astype(self.dtype))
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return out.reshape(out.shape[0], out.shape[1], out_dim), weights


class LunaBlock(_LunaCore):
    """Post-norm Luna (reference ``LunaBlock``, ``luna_layer.py:10-131``)."""

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, aux: jnp.ndarray,
                 train: bool = False):
        d = hidden.shape[-1]
        nh = self.num_heads
        scale = (d // nh) ** -0.5

        # attn1: aux queries attend over pixels
        q1 = _heads(self._dense(self.qk_proj_dim, "q1_proj")(aux), nh)
        k1 = _heads(self._dense(self.qk_proj_dim, "k1_proj")(hidden), nh)
        v1 = _heads(self._dense(d, "v1_proj")(hidden), nh)
        out1, attn1 = self._attend(q1, k1, v1, scale, train, d)
        out1 = self._dense(aux.shape[-1], "o1_proj")(out1)
        out1 = nn.Dropout(self.drop_prob, deterministic=not train)(out1)
        aux_out = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                               name="aux_norm")(aux + out1)

        # attn2: pixels attend over the UPDATED aux (pre-residual out1)
        q2 = _heads(self._dense(self.qk_proj_dim, "q2_proj")(hidden), nh)
        k2 = _heads(self._dense(self.qk_proj_dim, "k2_proj")(out1), nh)
        v2 = _heads(self._dense(d, "v2_proj")(out1), nh)
        out2, attn2 = self._attend(q2, k2, v2, scale, train, d)
        out2 = self._dense(d, "o2_proj")(out2)
        out2 = nn.Dropout(self.drop_prob, deterministic=not train)(out2)
        out = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                           name="norm")(hidden + out2)

        return out, aux_out, attn1, attn2


class PreNormLunaBlock(_LunaCore):
    """Pre-norm Luna (reference ``PreNormLunaBlock``, ``:134-259``)."""

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, aux: jnp.ndarray,
                 train: bool = False):
        d = hidden.shape[-1]
        nh = self.num_heads
        scale = (d // nh) ** -0.5

        aux_n = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="aux_norm")(aux)
        hidden_n = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                name="norm")(hidden)

        q1 = _heads(self._dense(self.qk_proj_dim, "q1_proj")(aux_n), nh)
        k1 = _heads(self._dense(self.qk_proj_dim, "k1_proj")(hidden_n), nh)
        v1 = _heads(self._dense(d, "v1_proj")(hidden_n), nh)
        out1, attn1 = self._attend(q1, k1, v1, scale, train, d)
        out1 = self._dense(aux.shape[-1], "o1_proj")(out1)
        out1 = nn.Dropout(self.drop_prob, deterministic=not train)(out1)
        aux_out = aux + out1

        out_n = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="inter_norm")(out1)
        q2 = _heads(self._dense(self.qk_proj_dim, "q2_proj")(hidden_n), nh)
        k2 = _heads(self._dense(self.qk_proj_dim, "k2_proj")(out_n), nh)
        v2 = _heads(self._dense(d, "v2_proj")(out_n), nh)
        out2, attn2 = self._attend(q2, k2, v2, scale, train, d)
        out2 = self._dense(d, "o2_proj")(out2)
        out2 = nn.Dropout(self.drop_prob, deterministic=not train)(out2)
        out = hidden + out2

        return out, aux_out, attn1, attn2


class LunaHalfBlock(_LunaCore):
    """Aux-update-only half block (reference ``LunaHalfBlock``, ``:391-474``).
    Takes NHWC hidden; returns only the updated aux tokens."""

    @nn.compact
    def __call__(self, hidden_nhwc: jnp.ndarray, aux: jnp.ndarray,
                 train: bool = False):
        b, h, w, d = hidden_nhwc.shape
        hidden = hidden_nhwc.reshape(b, h * w, d)
        nh = self.num_heads
        scale = (d // nh) ** -0.5

        q1 = _heads(self._dense(self.qk_proj_dim, "q1_proj")(aux), nh)
        k1 = _heads(self._dense(self.qk_proj_dim, "k1_proj")(hidden), nh)
        v1 = _heads(self._dense(d, "v1_proj")(hidden), nh)
        out1, attn1 = self._attend(q1, k1, v1, scale, train, d)
        out1 = self._dense(aux.shape[-1], "o1_proj")(out1)
        out1 = nn.Dropout(self.drop_prob, deterministic=not train)(out1)
        aux_out = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                               name="aux_norm")(aux + out1)
        return aux_out, attn1


class LunaLayer(nn.Module):
    """Luna block + FF over NHWC hidden (reference ``LunaLayer``/
    ``PreNormLunaLayer``, ``:262-345``)."""

    qk_proj_dim: int
    num_heads: int
    pre_norm: bool = False
    feedforward_dim: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    act: Callable = tnn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_nhwc: jnp.ndarray, aux: jnp.ndarray,
                 train: bool = False):
        from ..models.depthformer.layers import FeedForwardBlock
        b, h, w, d = hidden_nhwc.shape
        hidden = hidden_nhwc.reshape(b, h * w, d)

        block_cls = PreNormLunaBlock if self.pre_norm else LunaBlock
        hidden, aux, attn1, attn2 = block_cls(
            qk_proj_dim=self.qk_proj_dim, num_heads=self.num_heads,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="luna_attn")(hidden, aux, train=train)
        hidden = FeedForwardBlock(
            feedforward_dim=self.feedforward_dim, drop_prob=self.drop_prob,
            act=self.act, post_norm=not self.pre_norm, dtype=self.dtype,
            name="feed_forward")(hidden, train=train)

        return hidden.reshape(b, h, w, d), aux, attn1, attn2
