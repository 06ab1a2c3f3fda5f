"""ODA2 ``oda2_red_luna_reg`` — stacked split-Luna over the red neck.

Behavioral reference: ``model/ODA2/{oda2_red_luna_decoder,oda2_red_luna_reg}.py``.
Red-style neck to 1/4 scale; a FIXED sinusoidal aux bank (base 10000, no
sqrt(1/d) scaling); then ``num_layers`` x LunaModule = [S1: aux attends to
pixels (pre-norm, residual on aux) + aux FF; S2: pixels attend to aux
(residual on pixels) + FF]; head = ConvBN + 3x3 VALID conv (2-px shrink
quirk) + sigmoid rescale.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ...ops.conv import ConvBN
from ...ops.mlp import PreNormFF
from ...ops.resize import resize_bilinear
from ...ops.init import trunc_normal_init
from .red_order_swin2 import _resize_policy
from .red_order_reg import _RedNeck
from ..swin import swin_base, swin_large, SwinTransformer


def _sin_aux(num_aux: int, dims: int) -> jnp.ndarray:
    """Unscaled sinusoidal aux bank, base 10000 (reference ``:286-295``)."""
    emb = np.zeros((num_aux, dims), np.float32)
    pos = np.arange(num_aux, dtype=np.float32)
    inv_freq = np.exp(np.arange(0.0, dims, 2.0, dtype=np.float32)
                      * (-math.log(10000.0) / dims))
    dot = np.outer(pos, inv_freq)
    emb[:, 0::2] = np.sin(dot)
    emb[:, 1::2] = np.cos(dot)
    return jnp.asarray(emb)


class _SplitLuna(nn.Module):
    """S1 (aux <- pixels) or S2 (pixels <- aux); both pre-norm with shared
    projection structure (reference ``PreNormLunaS{1,2}``, ``:53-177``)."""

    num_heads: int
    s2: bool = False
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, aux: jnp.ndarray, train: bool = False):
        b, h, w, d = x.shape
        nh = self.num_heads
        hd = d // nh
        scale = hd ** -0.5

        xn = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm")(x).reshape(b, h * w, d)
        an = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="aux_norm")(aux)

        def dense(name):
            return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        if self.s2:
            q_in, kv_in, identity = xn, an, x.reshape(b, h * w, d)
        else:
            q_in, kv_in, identity = an, xn, aux

        q = dense("q_proj")(q_in).reshape(b, -1, nh, hd)
        k = dense("k_proj")(kv_in).reshape(b, -1, nh, hd)
        v = dense("v_proj")(kv_in).reshape(b, -1, nh, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
        weights = attn
        attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
            attn.astype(self.dtype))
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, -1, d)
        out = dense("o_proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        out = out + identity
        if self.s2:
            out = out.reshape(b, h, w, d)
        return out, weights


class StackedLunaModule(nn.Module):
    num_heads: int
    num_layers: int
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, aux: jnp.ndarray, train: bool = False):
        attns = ()
        for i in range(self.num_layers):
            aux, a1 = _SplitLuna(num_heads=self.num_heads, s2=False,
                                 attn_drop_prob=self.attn_drop_prob,
                                 drop_prob=self.drop_prob, dtype=self.dtype,
                                 name=f"layers{i}_luna1")(x, aux, train=train)
            aux = PreNormFF(drop_prob=self.drop_prob, dtype=self.dtype,
                            name=f"layers{i}_ff_aux")(aux, train=train)
            x, a2 = _SplitLuna(num_heads=self.num_heads, s2=True,
                               attn_drop_prob=self.attn_drop_prob,
                               drop_prob=self.drop_prob, dtype=self.dtype,
                               name=f"layers{i}_luna2")(x, aux, train=train)
            x = PreNormFF(drop_prob=self.drop_prob, dtype=self.dtype,
                          name=f"layers{i}_ff")(x, train=train)
            attns += (a1, a2)
        return x, aux, attns


class LunaTransformerRegDecoder(nn.Module):
    """Reference ``LunaTransformerRegDecoder``
    (``oda2_red_luna_decoder.py:239-346``): red neck; a FIXED sinusoidal aux
    bank gated by the mean of the pre-linear neck concat
    (``aux_linear1 -> * sigmoid(enc_to_aux(mean(enc))) -> aux_linear2 ->
    aux_norm``, ``:299-303,330-337``); stacked split-Luna; ConvBN + 3x3 VALID
    conv head + sigmoid."""

    dec_dim: int
    num_aux: int = 256
    num_heads: int = 8
    num_layers: int = 4
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_features, train: bool = False):
        dec, cat = _RedNeck(dec_dim=self.dec_dim,
                            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                            return_concat=True, dtype=self.dtype,
                            name="neck")(enc_features, train=train)
        b = dec.shape[0]
        d = self.dec_dim

        def dense(feat, name, bias=True):
            return nn.Dense(feat, use_bias=bias, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        aux = jnp.broadcast_to(_sin_aux(self.num_aux, d)[None],
                               (b, self.num_aux, d)).astype(self.dtype)
        aux = dense(d, "aux_linear1")(aux)
        enc_mean = jnp.asarray(cat, jnp.float32).mean(axis=(1, 2))  # (b, c)
        aux_weight = dense(d, "enc_to_aux")(enc_mean.astype(self.dtype))
        aux = aux * nn.sigmoid(jnp.asarray(aux_weight, aux.dtype))[:, None, :]
        aux = dense(d, "aux_linear2", bias=False)(aux)
        aux = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="aux_norm")(aux)

        dec, aux, attns = StackedLunaModule(
            num_heads=self.num_heads, num_layers=self.num_layers,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="luna")(dec, aux, train=train)

        out = ConvBN(self.dec_dim // 4, 3, bn_momentum=self.bn_momentum,
                     bn_eps=self.bn_eps, dtype=self.dtype,
                     name="out_conv0")(dec, train)
        out = nn.Conv(1, (3, 3), padding="VALID", dtype=self.dtype,
                      param_dtype=jnp.float32, name="out_conv1")(out)
        out = nn.sigmoid(jnp.asarray(out, jnp.float32))
        return out, aux, attns


class ODA2RedLunaRegModel(nn.Module):
    dec_dim: int
    min_depth: float
    max_depth: float
    num_heads: int = 8
    num_layers: int = 4
    num_aux: int = 256
    encoder_type: str = "large"
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    use_checkpoint: bool = True
    path_drop_prob: float = 0.2
    dtype: jnp.dtype = jnp.float32
    resize_to_multiple: bool = True
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, h, w, _ = x.shape
        if self.resize_to_multiple:
            x = resize_bilinear(x, _resize_policy(h, w, self.max_depth),
                                align_corners=True)

        kwargs = dict(window_size=7, path_drop_prob=self.path_drop_prob,
                      use_checkpoint=self.use_checkpoint, dtype=self.dtype,
                      name="encoder")
        kwargs.update(self.encoder_kwargs or {})
        if self.encoder_type in ("base", "B"):
            enc = swin_base(**kwargs)
        elif self.encoder_type in ("large", "L"):
            enc = swin_large(**kwargs)
        else:
            enc = SwinTransformer(**kwargs)
        feats = enc(x, train=train)

        out, aux, attns = LunaTransformerRegDecoder(
            dec_dim=self.dec_dim, num_aux=self.num_aux,
            num_heads=self.num_heads, num_layers=self.num_layers,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            dtype=self.dtype, name="decoder")(feats, train=train)
        out = out * (self.max_depth - self.min_depth) + self.min_depth
        return out, attns

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            dec_dim=opt["dec_dim"], num_heads=opt.get("num_heads", 8),
            num_layers=opt.get("num_layers", 4),
            num_aux=opt.get("num_aux", 256),
            min_depth=min_depth, max_depth=max_depth,
            encoder_type=opt.get("encoder_type", "large"),
            drop_prob=opt.get("drop_prob", 0.0),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            bn_momentum=opt.get("bn_momentum", 0.1),
            bn_eps=opt.get("bn_eps", 1e-5))
        kwargs.update(overrides)
        return cls(**kwargs)
