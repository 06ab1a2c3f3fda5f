"""Depthformer v6/v7/v8 — Luna decoders with AdaBins-style global bins.

Behavioral reference: ``model/Depthformer/{decoder_v6,decoder_v7,decoder_v8,
depthformer_v6,depthformer_v7,depthformer_v8}.py``. Shared skeleton: top-down
pyramid with ResConvBN blocks; a Luna layer per scale carries a learned aux
token bank across scales; per-scale 1x1 "shoot" projections (d/8 ch) are
upsampled to 1/2 and concatenated; a conv bin-classifier head softmaxes over
num_bins; the mean aux token regresses normalized bin widths; prediction =
sum(softmax x centers) (AdaBins-style global bins from aux tokens).

Version deltas (kept faithful):
* v6: post-norm Luna, GELU; final aux update via LunaHalfBlock; bin widths
  ReLU (+0.1 after) normalization; internal dims (d/4,d/2,d/2,d,d).
* v7: PreNorm Luna, SiLU; num_aux OVERRIDDEN to the 1/32 token count
  (``decoder_v7.py:42``); EfficientNet tap 12 (2048-ch conv_head);
  internal dims (d/8,d/8,d/4,d/2,d); a learned position embedding added to
  the 1/32 map (``decoder_v7.py:46-49,121-122``; torch *initializes* it by
  copying the aux bank — here it is an independent param with the same
  init distribution, equal only through converted checkpoints); encoder
  dropout on every input scale; FIVE aux ViT layers (one after each Luna +
  one at the end) + final aux LayerNorm; NO shoot layers — bin logits come
  from a ConvBN+1x1 head on the 1/2-scale map (``decoder_v7.py:93-96,158``);
  ReLU bin widths; returns centers for the chamfer loss.
* v8: PreNorm Luna, SiLU; num_aux free again; tap 10 (512 ch); internal dims
  (d/4,d/4,d/2,d/2,d); single aux ViT after the last Luna; ELU(0.1)+0.1
  bin-width normalization ("log-domain bin estimation",
  ``depthformer_v8.py:61``); returns centers.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ..efficientnet import efficientnet_b5
from .layers import ConvBN, ResConvBNBlock, ViTLayer, upscale_concat_act
from ...ops.luna import LunaLayer, LunaHalfBlock
from ...ops.resize import resize_bilinear
from ...ops.init import trunc_normal_init


def _aux_init(hidden_dim: int):
    def init(key, shape, dtype=jnp.float32):
        return (jax.random.normal(key, shape, jnp.float32)
                * math.sqrt(1.0 / hidden_dim)).astype(dtype)
    return init


class DepthFormerLunaDecoder(nn.Module):
    """Parameterized v6/v7/v8 decoder."""

    version: int  # 6, 7, 8
    hidden_dim: int
    num_heads: int
    num_bins: int
    num_aux: int
    img_size: Tuple[int, int]
    feedforward_dim: Optional[int] = None
    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x0, x1, x2, x3, x4 = features  # strides 2..32, NHWC
        d = self.hidden_dim
        nh = self.num_heads
        act = tnn.gelu if self.version == 6 else nn.silu
        pre_norm = self.version >= 7

        if self.version == 6:
            idims = [d // 4, d // 2, d // 2, d, d]
            iheads = [nh // 4, nh // 2, nh // 2, nh, nh]
        elif self.version == 7:
            idims = [d // 8, d // 8, d // 4, d // 2, d]
            iheads = [max(nh // 8, 1), max(nh // 8, 1), nh // 4, nh // 2, nh]
        else:
            idims = [d // 4, d // 4, d // 2, d // 2, d]
            iheads = [nh // 4, nh // 4, nh // 2, nh // 2, nh]
        iheads = [max(h, 1) for h in iheads]

        num_aux = self.num_aux
        if self.version == 7:  # overridden to the 1/32 token count
            num_aux = (self.img_size[0] // 32) * (self.img_size[1] // 32)

        aux0 = self.param("aux_embedding", _aux_init(d), (1, num_aux, d))
        b = x0.shape[0]
        aux = jnp.broadcast_to(aux0, (b, num_aux, d)).astype(self.dtype)
        if self.version == 6:  # v6 scales the aux bank (decoder_v6.py:129)
            aux = aux * math.sqrt(1.0 / d)
        if self.version == 7:
            # v7 drops out every encoder input (decoder_v7.py:106-110)
            enc_drop = nn.Dropout(self.drop_prob, deterministic=not train)
            x0, x1, x2, x3, x4 = (enc_drop(x) for x in (x0, x1, x2, x3, x4))

        def post_conv(i, x, out_ch):
            n = 2 if self.version == 6 else 1
            for j in range(n):
                x = ResConvBNBlock(out_ch, 3, num_layers=2, act=act,
                                   dtype=self.dtype,
                                   name=f"post_conv{i}_{j}")(x, train)
            return x

        def shoot(i, x):
            return ConvBN(d // 8, 1, act=act, use_residual=False,
                          dtype=self.dtype, name=f"shoot{i}")(x, train)

        def aux_vit(name, aux):
            out, _ = ViTLayer(num_heads=nh, feedforward_dim=self.feedforward_dim,
                              attn_drop_prob=self.attn_drop_prob,
                              drop_prob=self.drop_prob, act=act,
                              dtype=self.dtype, name=name)(aux, train=train)
            return out

        def luna(i, x, aux):
            x, aux, a1, a2 = LunaLayer(
                qk_proj_dim=idims[i + 1], num_heads=iheads[i + 1],
                pre_norm=pre_norm, feedforward_dim=self.feedforward_dim,
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                act=act, dtype=self.dtype, name=f"luna{i}")(x, aux, train=train)
            if self.version == 7:
                # reference applies aux_layers[i+1] after luna_layers[i]
                # (decoder_v7.py:123,131,139,147)
                aux = aux_vit(f"aux_vit{i + 1}", aux)
            return x, aux, (a1, a2)

        attns = ()
        c4 = post_conv(4, x4, idims[4])
        if self.version == 7:
            # learned 1/32 position embedding (decoder_v7.py:121-122)
            pe = self.param("position_embedding", _aux_init(d),
                            (1, c4.shape[1], c4.shape[2], d))
            c4 = c4 + pe.astype(c4.dtype)
        if self.version == 8:
            out4 = shoot(4, c4)
        c4, aux, a4 = luna(3, c4, aux)
        if self.version in (6,):
            out4 = shoot(4, c4)
        attns = a4 + attns

        def stage(i, skip, c, aux, attns):
            c = upscale_concat_act(skip, c, 2, act=act)
            c = post_conv(i, c, idims[i])
            out = shoot(i, c) if self.version == 8 else None
            if i > 0:
                c, aux, a = luna(i - 1, c, aux)
                attns = a + attns
            if self.version == 6:
                out = shoot(i, c)
            return c, aux, out, attns

        c3, aux, out3, attns = stage(3, x3, c4, aux, attns)
        c2, aux, out2, attns = stage(2, x2, c3, aux, attns)
        c1, aux, out1, attns = stage(1, x1, c2, aux, attns)
        if self.version == 8:
            aux = aux_vit("aux_layer", aux)
        c0, aux_unused, out0, attns2 = stage(0, x0, c1, aux, ())
        if self.version == 6:
            # v6's final aux update is a LunaHalfBlock on the 1/2-scale map
            aux, a0 = LunaHalfBlock(
                qk_proj_dim=idims[0], num_heads=iheads[0],
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                dtype=self.dtype, name="luna_final")(c0, aux, train=train)
            attns = (a0,) + attns
        if self.version == 7:
            # final aux ViT + LayerNorm (decoder_v7.py:154-155)
            aux = aux_vit("aux_vit0", aux)
            aux = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                name="aux_lst_ln")(aux)

        # bin classifier
        if self.version == 7:
            # v7 predicts bins from the 1/2-scale map directly
            # (decoder_v7.py:93-96,158)
            y = ConvBN(idims[0], 3, act=act, use_residual=False,
                       dtype=self.dtype, name="bin_pred0")(c0, train)
            y = nn.Conv(self.num_bins, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="bin_pred_out")(y)
        else:
            out_hw = (x0.shape[1], x0.shape[2])
            outs = [out0]
            for o in (out1, out2, out3, out4):
                outs.append(resize_bilinear(o, out_hw, align_corners=True))
            out = jnp.concatenate(outs, axis=-1)  # (b, h/2, w/2, 5d/8)
            if self.version == 6:
                y = ResConvBNBlock(d // 2, 3, num_layers=2, act=act,
                                   dtype=self.dtype, name="bin_pred0")(out, train)
                y = nn.Conv(self.num_bins, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32, name="bin_pred_out")(y)
            else:
                y = ConvBN(d, 3, act=act, use_residual=False, dtype=self.dtype,
                           name="bin_pred0")(out, train)
                y = ConvBN(d, 3, act=act, use_residual=False, dtype=self.dtype,
                           name="bin_pred1")(y, train)
                y = nn.Conv(self.num_bins, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32, name="bin_pred_out")(y)
        bin_cls = nn.softmax(jnp.asarray(y, jnp.float32), axis=-1)

        # bin width regressor from mean aux token
        cls_tok = jnp.asarray(aux, jnp.float32).mean(axis=1)
        w = cls_tok
        for i in range(2):
            w = nn.Dense(d, param_dtype=jnp.float32,
                         kernel_init=trunc_normal_init(0.02),
                         name=f"bin_regressor{i}")(w)
            if self.version == 8:  # only v8 has regressor dropout
                w = nn.Dropout(self.drop_prob, deterministic=not train)(w)
            w = act(w)
        w = nn.Dense(self.num_bins, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02),
                     name="bin_regressor_out")(w)
        if self.version == 8:
            # "log-domain bin estimation" (decoder_v8.py:166)
            w = jnp.where(w > 0, w, 0.1 * (jnp.exp(jnp.minimum(w, 0.0)) - 1.0)) + 0.1
        else:
            w = nn.relu(w) + 0.1
        bin_width = w / w.sum(axis=1, keepdims=True)

        return bin_width, bin_cls, attns


class DepthformerLuna(nn.Module):
    """v6/v7/v8 model wrapper (reference ``depthformer_v{6,7,8}.py``)."""

    version: int
    hidden_dim: int
    num_heads: int
    num_bins: int
    num_aux: int
    img_size: Tuple[int, int]
    min_depth: float = 0.001
    max_depth: float = 80.0
    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        enc_kwargs = dict(self.encoder_kwargs or {})
        # v7 keeps conv_head (tap 12, 2048 ch); v6/v8 drop it (tap 10)
        enc_kwargs.setdefault("with_head", self.version == 7)
        feats = efficientnet_b5(dtype=self.dtype, name="encoder",
                                **enc_kwargs)(x, train=train)
        top = feats[12] if self.version == 7 else feats[10]
        decoder_input = (feats[4], feats[5], feats[6], feats[8], top)

        bin_width, bin_cls, attns = DepthFormerLunaDecoder(
            version=self.version, hidden_dim=self.hidden_dim,
            num_heads=self.num_heads, num_bins=self.num_bins,
            num_aux=self.num_aux, img_size=tuple(self.img_size),
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="decoder")(decoder_input, train=train)

        bin_width = (self.max_depth - self.min_depth) * bin_width
        bin_width = jnp.pad(bin_width, ((0, 0), (1, 0)),
                            constant_values=self.min_depth)
        bin_edges = jnp.cumsum(bin_width, axis=1)
        centers = 0.5 * (bin_edges[:, :-1] + bin_edges[:, 1:])

        pred = jnp.sum(bin_cls * centers[:, None, None, :], axis=-1,
                       keepdims=True)
        if self.version >= 7:
            return pred, centers, attns  # centers feed the chamfer loss
        return pred, attns

    @classmethod
    def build(cls, version, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            version=version,
            hidden_dim=opt["hidden_dim"], num_heads=opt["num_heads"],
            num_bins=opt["num_bins"], num_aux=opt["num_aux"],
            img_size=tuple(opt["img_size"]),
            min_depth=min_depth, max_depth=max_depth,
            attn_drop_prob=opt.get("attn_drop_prob", 0.1),
            drop_prob=opt.get("drop_prob", 0.1))
        kwargs.update(overrides)
        return cls(**kwargs)
