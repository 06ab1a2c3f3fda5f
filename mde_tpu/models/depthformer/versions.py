"""Depthformer v2 / v3 / v4 / v5 decoders.

Behavioral reference: ``model/Depthformer/{decoder_v2,decoder_v3,decoder_v4,
decoder_v5,depthformer_v2..v5}.py``. Several of these upstream files are
bitrotten (v3's model forward references an undefined variable; the v1 call
into the refactored ViTLayer cannot construct) — the implementations here
realize the evident intent and note divergences.

* v2: per-scale ViT over FULL token grids at 1/32, 1/16, 1/8 with per-scale
  learned position embeddings; channel schedule (d/16, d/4, d); 3x3
  ConvBNBlocks; sigmoid 1x1 head at 1/2.
* v3: v2 skeleton whose final 1x1 emits the 128-ch range-attention map; a
  GAP + 3-layer regressor produces normalized bin widths; AdaBins-style
  expected-value decode (upstream's broken forward reconstructed).
* v4: cls-token decoder — a single depth cls token attends to each scale
  (per-head dot-product with 1x1-conv K/V maps), updates via Linear+LN, and
  gates V maps through a sigmoid FF ("like GLU"); Hardsigmoid head.
* v5: v2 with EfficientNet tap 12 (2048 ch), per-scale ``key_query_dims``
  (kq/16, kq/4, kq) and channel schedule (d/4, d/2, d).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ..efficientnet import efficientnet_b5
from .layers import (
    ConvBN, ConvBNBlock, ResConvBNBlock, ViTLayer, upscale_concat_act,
)
from ...ops.init import trunc_normal_init


class DepthFormerDecoderV2(nn.Module):
    """Also the v3/v5 skeleton via fields (reference ``decoder_v2.py``)."""

    hidden_dim: int
    num_heads: int
    img_size: Tuple[int, int]
    key_query_dim: Optional[int] = None  # v5
    v5_dims: bool = False
    num_repeat: int = 1
    feedforward_dim: Optional[int] = None
    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    final_head: str = "sigmoid"  # v3: "range_map"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x0, x1, x2, x3, x4 = features
        d = self.hidden_dim
        nh = self.num_heads
        if self.v5_dims:
            vit_dims = [d // 4, d // 2, d]
            kq = self.key_query_dim or d
            kq_dims = [kq // 16, kq // 4, kq]
            # v5's post-conv channel schedule is finer than its vit dims
            # (decoder_v5.py:39 out_channel_dims)
            out_dims = [d // 16, d // 8, d // 4, d // 2, d]
        else:
            vit_dims = [d // 16, d // 4, d]
            kq_dims = [None, None, None]
            out_dims = [vit_dims[0], vit_dims[0], vit_dims[0], vit_dims[1], d]
        vit_heads = [max(nh // 4, 1), max(nh // 2, 1), nh]

        def post_conv(i, x, out_ch):
            return ConvBNBlock(out_ch, kernel_size=3, num_layers=2,
                               dtype=self.dtype, name=f"post_conv{i}")(x, train)

        def run_vit(i, x):
            b, h, w, c = x.shape
            pe = self.param(f"position_embeddings{i}",
                            nn.initializers.xavier_normal(), (h * w, c))
            t = x.reshape(b, h * w, c) + pe[None].astype(x.dtype)
            t, attn = ViTLayer(key_query_dim=kq_dims[i],
                               num_heads=vit_heads[i],
                               num_repeat=self.num_repeat,
                               feedforward_dim=self.feedforward_dim,
                               attn_drop_prob=self.attn_drop_prob,
                               drop_prob=self.drop_prob, dtype=self.dtype,
                               name=f"vit{i}")(t, train=train)
            t = t.reshape(b, h, w, c)
            t = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train), momentum=0.9,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"vit_bn{i}")(t)
            return t, attn

        c4 = post_conv(4, x4, out_dims[4])
        feat4, attn4 = run_vit(2, c4)

        c3 = upscale_concat_act(x3, feat4, 2, act=None)
        c3 = post_conv(3, c3, out_dims[3])
        feat3, attn3 = run_vit(1, c3)

        c2 = upscale_concat_act(x2, feat3, 2, act=None)
        c2 = post_conv(2, c2, out_dims[2])
        feat2, attn2 = run_vit(0, c2)

        c1 = upscale_concat_act(x1, feat2, 2, act=None)
        c1 = post_conv(1, c1, out_dims[1])

        c0 = upscale_concat_act(x0, c1, 2, act=None)
        c0 = post_conv(0, c0, out_dims[0])

        if self.final_head == "sigmoid":
            out = nn.Conv(1, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name="final_out")(c0)
            out = nn.sigmoid(jnp.asarray(out, jnp.float32))
            return out, (attn2, attn3, attn4)

        # v3: 128-ch range map + GAP-regressed normalized bin widths
        range_map = nn.Conv(128, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32, name="final_out")(c0)
        range_map = nn.relu(range_map)
        cls = jnp.asarray(feat4, jnp.float32).mean(axis=(1, 2))  # GAP at 1/32
        y = cls
        for i, feat in enumerate((256, 256, 256)):
            y = nn.Dense(feat, param_dtype=jnp.float32,
                         kernel_init=trunc_normal_init(0.02),
                         name=f"regressor{i}")(y)
            if i < 2:
                y = nn.leaky_relu(y, 0.01)
        widths = nn.relu(y) + 0.1
        widths = widths / widths.sum(axis=1, keepdims=True)
        return (range_map, widths), (attn2, attn3, attn4)


class DepthformerV2(nn.Module):
    """v2 and v5 wrapper (reference ``depthformer_v2.py``/``_v5.py``)."""

    hidden_dim: int
    num_heads: int
    img_size: Tuple[int, int]
    version: int = 2
    key_query_dim: Optional[int] = None
    min_depth: float = 0.001
    max_depth: float = 80.0
    num_repeat: int = 1
    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        enc_kwargs = dict(self.encoder_kwargs or {})
        enc_kwargs.setdefault("with_head", self.version == 5)
        feats = efficientnet_b5(dtype=self.dtype, name="encoder",
                                **enc_kwargs)(x, train=train)
        top = feats[12] if self.version == 5 else feats[10]
        decoder_input = (feats[4], feats[5], feats[6], feats[8], top)

        out, attn = DepthFormerDecoderV2(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            img_size=tuple(self.img_size),
            key_query_dim=self.key_query_dim, v5_dims=self.version == 5,
            num_repeat=self.num_repeat, attn_drop_prob=self.attn_drop_prob,
            drop_prob=self.drop_prob, dtype=self.dtype,
            name="decoder")(decoder_input, train=train)
        depth = (self.max_depth - self.min_depth) * out + self.min_depth
        return depth, attn

    @classmethod
    def build(cls, version, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            version=version,
            hidden_dim=opt["hidden_dim"], num_heads=opt["num_heads"],
            img_size=tuple(opt["img_size"]),
            key_query_dim=opt.get("key_query_dim"),
            min_depth=min_depth, max_depth=max_depth,
            num_repeat=opt.get("num_repeat", 1),
            attn_drop_prob=opt.get("attn_drop_prob", 0.1),
            drop_prob=opt.get("drop_prob", 0.1))
        kwargs.update(overrides)
        return cls(**kwargs)


class DepthformerV3(nn.Module):
    """v3 wrapper — AdaBins-style decode over the v2 skeleton (upstream
    forward is broken; reconstructed per SURVEY.md §2.4)."""

    hidden_dim: int
    num_heads: int
    img_size: Tuple[int, int]
    num_bins: int = 100
    min_depth: float = 0.001
    max_depth: float = 80.0
    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        enc_kwargs = dict(self.encoder_kwargs or {})
        enc_kwargs.setdefault("with_head", False)
        feats = efficientnet_b5(dtype=self.dtype, name="encoder",
                                **enc_kwargs)(x, train=train)
        decoder_input = (feats[4], feats[5], feats[6], feats[8], feats[10])

        (range_map, widths), attn = DepthFormerDecoderV2(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            img_size=tuple(self.img_size), final_head="range_map",
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="decoder")(decoder_input, train=train)

        out = nn.Conv(self.num_bins, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv_out")(range_map)
        out = nn.softmax(jnp.asarray(out, jnp.float32), axis=-1)

        widths = widths[:, :self.num_bins] if widths.shape[1] >= self.num_bins \
            else jnp.pad(widths, ((0, 0), (0, self.num_bins - widths.shape[1])),
                         constant_values=1e-3)
        widths = (self.max_depth - self.min_depth) * widths
        widths = jnp.pad(widths, ((0, 0), (1, 0)),
                         constant_values=self.min_depth)
        edges = jnp.cumsum(widths, axis=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
        pred = jnp.sum(out * centers[:, None, None, :], axis=-1, keepdims=True)
        return pred, edges, attn

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            hidden_dim=opt["hidden_dim"], num_heads=opt["num_heads"],
            img_size=tuple(opt["img_size"]),
            num_bins=opt.get("num_bins", 100),
            min_depth=min_depth, max_depth=max_depth,
            attn_drop_prob=opt.get("attn_drop_prob", 0.1),
            drop_prob=opt.get("drop_prob", 0.1))
        kwargs.update(overrides)
        return cls(**kwargs)


class DepthFormerDecoderV4(nn.Module):
    """cls-token decoder (reference ``decoder_v4.py``)."""

    hidden_dim: int
    num_heads: int
    feedforward_dim: Optional[int] = None
    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x0, x1, x2, x3, x4 = features
        d = self.hidden_dim
        nh = self.num_heads
        hd = d // nh
        ff = self.feedforward_dim or d * 2
        b = x0.shape[0]

        cls0 = self.param("depth_cls",
                          nn.initializers.normal(math.sqrt(1.0 / d)), (1, d))
        cls = jnp.broadcast_to(cls0[None], (b, 1, d)).astype(self.dtype)
        cls = cls * math.sqrt(1.0 / d)

        def dense(feat, name):
            return nn.Dense(feat, dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        attns = []

        def scale_step(i, c, train):
            # cls attends over the scale's K map; V gated by cls FF weights
            q = dense(d, f"q_proj{i}")(cls_box[0]).reshape(b, nh, hd)
            k = nn.Conv(d, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"k_proj{i}")(c)
            v = nn.Conv(d, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"v_proj{i}")(c)
            hh, ww = c.shape[1], c.shape[2]
            ks = k.reshape(b, hh * ww, nh, hd)
            vs = v.reshape(b, hh * ww, nh, hd)

            pre = jnp.einsum("bnhd,bhd->bhn", ks, q) * math.sqrt(1.0 / hd)
            attn = nn.softmax(jnp.asarray(pre, jnp.float32), axis=-1)
            attns.append(attn)
            up = jnp.einsum("bhn,bnhd->bhd",
                            attn.astype(self.dtype), vs).reshape(b, 1, d)
            new_cls = cls_box[0] + dense(d, f"post_cls{i}")(up)
            new_cls = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                   name=f"post_cls_ln{i}")(new_cls)
            cls_box[0] = new_cls

            w = dense(ff, f"cls_to_weight{i}_0")(new_cls)
            w = nn.Dropout(self.drop_prob, deterministic=not train)(w)
            w = tnn.gelu(w)
            w = dense(d, f"cls_to_weight{i}_1")(w)
            vg = v * nn.sigmoid(jnp.asarray(w, v.dtype))[:, None]
            vg = ConvBN(d, 1, act=None, use_residual=False, dtype=self.dtype,
                        name=f"post_weight{i}")(vg, train)
            return c + vg

        cls_box = [cls]
        c4 = ResConvBNBlock(d, 3, num_layers=2, dtype=self.dtype,
                            name="post_conv4")(x4, train)
        v4 = scale_step(4, c4, train)

        def fuse(i, skip, v):
            c = upscale_concat_act(skip, v, 2)
            c = ResConvBNBlock(d, 3, num_layers=2, dtype=self.dtype,
                               name=f"post_conv{i}")(c, train)
            return scale_step(i, c, train)

        v3 = fuse(3, x3, v4)
        v2 = fuse(2, x2, v3)
        v1 = fuse(1, x1, v2)
        v0 = fuse(0, x0, v1)

        y = tnn.gelu(v0)
        y = ResConvBNBlock(d, 3, num_layers=2, dtype=self.dtype,
                           name="final_res")(y, train)
        y = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="final_out")(y)
        out = nn.hard_sigmoid(jnp.asarray(y, jnp.float32))
        return out, tuple(attns)


class DepthformerV4(nn.Module):
    hidden_dim: int
    num_heads: int
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
        enc_kwargs.setdefault("with_head", False)
        feats = efficientnet_b5(dtype=self.dtype, name="encoder",
                                **enc_kwargs)(x, train=train)
        decoder_input = (feats[4], feats[5], feats[6], feats[8], feats[10])
        out, attn = DepthFormerDecoderV4(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="decoder")(decoder_input, train=train)
        depth = (self.max_depth - self.min_depth) * out + self.min_depth
        return depth, attn

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            hidden_dim=opt["hidden_dim"], num_heads=opt["num_heads"],
            img_size=tuple(opt["img_size"]),
            min_depth=min_depth, max_depth=max_depth,
            attn_drop_prob=opt.get("attn_drop_prob", 0.1),
            drop_prob=opt.get("drop_prob", 0.1))
        kwargs.update(overrides)
        return cls(**kwargs)
