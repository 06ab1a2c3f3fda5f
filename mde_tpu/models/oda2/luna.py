"""ODA2 Luna-gating models: ``oda2_luna_reg`` / ``oda2_luna_cls``.

Behavioral reference: ``model/ODA2/{oda2_luna_reg_decoder,oda2_luna_cls_decoder,
oda2_luna_reg,oda2_luna_cls}.py``. The decoder is a lateral-fusion pyramid
where each fusion is GATED by a Luna-style module (``ODA2LunaGating``):

    x -> 1x1 conv ;  aux tokens -> [self-attn, cross-attn(aux<-x), FF,
    cross-attn(x<-aux)] -> per-pixel gate weights (o_cross2 zero-init) ;
    y = conv(x) * sigmoid(weights) -> 1x1 conv + BN + act.

reg: 1/4-scale sigmoid regression map. cls: the final conv emits ``num_aux``
bin-probability channels; per-aux-token Linear chain regresses bin widths
(ELU(0.1)+0.1 normalized); expected-value decode in the model wrapper.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ...ops.conv import ConvBN
from ...ops.ppm import PyramidPoolingModule
from ...ops.resize import resize_bilinear, upsample2d
from ...ops.init import trunc_normal_init
from .red_order_swin2 import _resize_policy
from ..swin import swin_base, swin_large, SwinTransformer


class ODA2LunaLayer(nn.Module):
    """(reference ``ODA2LunaLayer``, ``oda2_luna_reg_decoder.py:10-133``)."""

    out_dims: int
    num_heads: int
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_nhwc: jnp.ndarray, aux: jnp.ndarray,
                 train: bool = False):
        b, h, w, c = x_nhwc.shape
        _, s, d = aux.shape
        nh = self.num_heads
        hd = d // nh
        scale = hd ** -0.5
        x = x_nhwc.reshape(b, h * w, c)

        def dense(feat, name, zero_init=False):
            return nn.Dense(
                feat, dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=(nn.initializers.zeros if zero_init
                             else trunc_normal_init(0.02)),
                bias_init=nn.initializers.zeros, name=name)

        def mha(q, k, v, prefix, out_feat):
            qh = q.reshape(b, -1, nh, q.shape[-1] // nh)
            kh = k.reshape(b, -1, nh, k.shape[-1] // nh)
            vh = v.reshape(b, -1, nh, v.shape[-1] // nh)
            attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
            attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
            attn = nn.Dropout(self.attn_drop_prob,
                              deterministic=not train)(attn.astype(self.dtype))
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
            return out.reshape(b, -1, out_feat)

        ln = lambda name: tnn.LayerNorm(dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        drop = nn.Dropout(self.drop_prob, deterministic=not train)

        # aux self-attention
        y = mha(dense(d, "q_self")(aux), dense(d, "k_self")(aux),
                dense(d, "v_self")(aux), "self", d)
        y = drop(dense(d, "o_self")(y))
        aux = ln("norm_self")(aux + y)

        # cross 1: aux <- pixels
        y = mha(dense(d, "q_cross1")(aux), dense(d, "k_cross1")(x),
                dense(d, "v_cross1")(x), "c1", d)
        y = drop(dense(d, "o_cross1")(y))
        aux = ln("norm_cross1")(aux + y)

        # FF
        y = dense(d * 4, "ff0")(aux)
        y = tnn.gelu(y)
        y = drop(y)
        y = dense(d, "ff1")(y)
        y = drop(y)
        aux = ln("norm_ff")(aux + y)

        # cross 2: pixels <- aux -> gate weights (zero-init output proj)
        wgt = mha(dense(d, "q_cross2")(x), dense(d, "k_cross2")(aux),
                  dense(self.out_dims, "v_cross2")(aux), "c2", self.out_dims)
        wgt = dense(self.out_dims, "o_cross2", zero_init=True)(wgt)
        wgt = wgt.reshape(b, h, w, self.out_dims)
        return aux, wgt


class ODA2LunaGating(nn.Module):
    """(reference ``ODA2LunaGating``, ``oda2_luna_reg_decoder.py:135-166``)."""

    out_channels: int
    num_heads: int
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, aux: jnp.ndarray, train: bool = False):
        x_conv = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="conv")(x)
        aux, wgt = ODA2LunaLayer(
            out_dims=self.out_channels, num_heads=self.num_heads,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="luna")(x, aux, train=train)
        y = x_conv * nn.sigmoid(jnp.asarray(wgt, x_conv.dtype))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_out")(y)
        y = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                         momentum=1.0 - self.bn_momentum, epsilon=self.bn_eps,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm_out")(y)
        return tnn.gelu(y), aux


class ODA2LunaDecoder(nn.Module):
    """Shared reg/cls decoder body (reference decoders)."""

    channels: int
    num_aux: int
    aux_dims: int
    num_heads: int
    cls_head: bool = False
    ppm_proj: int = 512  # fixed upstream (oda2_luna_reg_decoder.py:191-194)
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        f0, f1, f2, f3 = features
        c = self.channels
        oc = [c // 8, c // 4, c // 2, c]
        ck = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                  dtype=self.dtype)
        gk = dict(num_heads=self.num_heads,
                  attn_drop_prob=self.attn_drop_prob,
                  drop_prob=self.drop_prob, bn_momentum=self.bn_momentum,
                  bn_eps=self.bn_eps, dtype=self.dtype)

        aux0 = self.param(
            "aux", trunc_normal_init(math.sqrt(1.0 / self.aux_dims)),
            (1, self.num_aux, self.aux_dims))
        b = f0.shape[0]
        aux = (jnp.broadcast_to(aux0, (b,) + aux0.shape[1:])
               * math.sqrt(1.0 / self.aux_dims)).astype(self.dtype)

        x = PyramidPoolingModule(proj_ch=self.ppm_proj,
                                 out_ch=c, bn_momentum=self.bn_momentum,
                                 bn_eps=self.bn_eps, dtype=self.dtype,
                                 name="ppm")(f3, train=train)
        x = ConvBN(oc[3], 3, name="block32_0", **ck)(x, train)
        x = ConvBN(oc[3], 3, name="block32_1", **ck)(x, train)
        x = upsample2d(x, 2)

        for level, (skip, out_ch) in (("16", (f2, oc[2])), ("8", (f1, oc[1]))):
            # lateral conv outputs the same width as the incoming upsampled map
            # (reference block{16,8}_lateral: in_ch -> oc[3]/oc[2])
            lat = ConvBN(x.shape[-1], 3,
                         name=f"block{level}_lateral", **ck)(skip, train)
            y = jnp.concatenate([x, lat], axis=-1)
            y, aux = ODA2LunaGating(out_channels=out_ch,
                                    name=f"block{level}_gate", **gk)(
                y, aux, train=train)
            y = ConvBN(out_ch, 3, name=f"block{level}_0", **ck)(y, train)
            y = ConvBN(out_ch, 3, name=f"block{level}_1", **ck)(y, train)
            x = upsample2d(y, 2)

        lat = ConvBN(x.shape[-1], 3, name="block4_lateral", **ck)(f0, train)
        y = jnp.concatenate([x, lat], axis=-1)
        y, aux = ODA2LunaGating(out_channels=oc[0], name="block4_gate",
                                **gk)(y, aux, train=train)

        out_ch = self.num_aux if self.cls_head else 1
        y = ConvBN(oc[0], 3, name="block4_0", **ck)(y, train)
        from ...ops.pad import pad2d
        y = pad2d(y, 1, 1, 1, 1, mode="edge")
        out = nn.Conv(out_ch, (3, 3), padding="VALID", dtype=self.dtype,
                      param_dtype=jnp.float32, name="block4_out")(y)

        if not self.cls_head:
            return nn.sigmoid(jnp.asarray(out, jnp.float32)), None

        bin_probs = nn.softmax(jnp.asarray(out, jnp.float32), axis=-1)
        # bins head: Linear -> ReLU -> Linear(1) (oda2_luna_cls_decoder.py:243-249)
        wdt = jnp.asarray(aux, jnp.float32)
        wdt = nn.Dense(self.aux_dims, param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init(0.02), name="bins0")(wdt)
        wdt = nn.relu(wdt)
        wdt = nn.Dense(1, param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init(0.02), name="bins1")(wdt)
        wdt = wdt[..., 0]  # (b, num_aux)
        wdt = jnp.where(wdt > 0, wdt,
                        0.1 * (jnp.exp(jnp.minimum(wdt, 0.0)) - 1.0)) + 0.1
        wdt = wdt / wdt.sum(axis=-1, keepdims=True)
        return bin_probs, wdt


class ODA2LunaModel(nn.Module):
    decoder_channels: int
    min_depth: float
    max_depth: float
    num_aux: int = 256
    aux_dims: int = 256
    num_heads: int = 8
    cls_head: bool = False
    encoder_type: str = "large"
    drop_prob: float = 0.1
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

        out, second = ODA2LunaDecoder(
            channels=self.decoder_channels, num_aux=self.num_aux,
            aux_dims=self.aux_dims, num_heads=self.num_heads,
            cls_head=self.cls_head, attn_drop_prob=self.attn_drop_prob,
            drop_prob=self.drop_prob, bn_momentum=self.bn_momentum,
            bn_eps=self.bn_eps, dtype=self.dtype,
            name="decoder")(feats, train=train)

        if not self.cls_head:
            pred = out * (self.max_depth - self.min_depth) + self.min_depth
            return pred, None

        widths = (self.max_depth - self.min_depth) * second
        widths = jnp.pad(widths, ((0, 0), (1, 0)),
                         constant_values=self.min_depth)
        edges = jnp.cumsum(widths, axis=-1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
        pred = jnp.sum(out * centers[:, None, None, :], axis=-1, keepdims=True)
        return pred, centers

    @classmethod
    def build(cls, opt, min_depth, max_depth, cls_head: bool = False,
              **overrides):
        kwargs = dict(
            decoder_channels=opt.get("decoder_channels", opt.get("dec_dim", 1024)),
            min_depth=min_depth, max_depth=max_depth,
            num_aux=opt.get("num_aux", 256),
            aux_dims=opt.get("aux_dim", opt.get("aux_dims", 256)),
            num_heads=opt.get("num_heads", 8), cls_head=cls_head,
            encoder_type=opt.get("encoder_type", "large"),
            drop_prob=opt.get("drop_prob", 0.1),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            bn_momentum=opt.get("bn_momentum", 0.1),
            bn_eps=opt.get("bn_eps", 1e-5))
        kwargs.update(overrides)
        return cls(**kwargs)
