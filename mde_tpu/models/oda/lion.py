"""ODA Lion — axial (per-row / per-column) channel attention decoder.

Behavioral reference: ``model/ODA/{lion_layer,decoder_lion,oda_lion}.py``.
Each LionLayer runs, per spatial row (DimH) then per column (DimW):
pre-norm channel attention (attn = q^T k over channels, softmax over the
FIRST channel index, out = v @ attn — O(HW * d^2) instead of O((HW)^2 d)),
a cross variant with K/V from the encoder stage, and a conv feed-forward
(1x1 -> 5x5 replicate -> SE -> 1x1) — then a "reorder" upsample (channel
quarters interleaved into 2x2 pixels + 3x3 conv). The decoder stacks 4 such
layers over a PPMv2 bottleneck with a learned 1/32 position embedding.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from .encoder import ODASwinEncoder
from ...ops.conv import ConvBN
from ...ops.pad import pad2d
from ...ops.resize import adaptive_avg_pool2d, resize_bilinear
from ...ops.init import trunc_normal_init


def _dense(feat, dtype, name, bias=True):
    return nn.Dense(feat, use_bias=bias, dtype=dtype, param_dtype=jnp.float32,
                    kernel_init=trunc_normal_init(0.02), name=name)


class LionAxialAttention(nn.Module):
    """Self or cross channel-attention along H (axis='h') or W (axis='w').
    (reference ``LionSelfAttentionDim{H,W}`` ``:153-247`` and
    ``LionCrossAttentionDim{H,W}`` ``:250-352``)."""

    axis: str = "h"
    cross: bool = False
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, enc: Optional[jnp.ndarray] = None,
                 train: bool = False):
        b, h, w, d = hidden.shape
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(hidden)
        if self.cross:
            src = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                               name="enc_norm")(enc)
        else:
            src = x

        if self.axis == "w":
            x = x.transpose(0, 2, 1, 3)      # (b, w, h, d)
            src = src.transpose(0, 2, 1, 3)

        q = _dense(d, self.dtype, "q_proj")(x)
        k = _dense(d, self.dtype, "k_proj")(src)
        v = _dense(d, self.dtype, "v_proj")(src)

        head_dim = x.shape[2]  # sequence length along the attended axis
        # channel-channel attention per row/col: (b, L, d, d)
        attn = jnp.einsum("blnd,blne->blde", q, k) * math.sqrt(1.0 / head_dim)
        attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-2)
        weights = attn
        attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
            attn.astype(self.dtype))

        out = jnp.einsum("blnd,blde->blne", v, attn)
        out = _dense(d, self.dtype, "o_proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        if self.axis == "w":
            out = out.transpose(0, 2, 1, 3)
        return out + hidden, weights


class LionFeedForwardConv(nn.Module):
    """(reference ``LionFeedForwardConv``; 1x1+BN+act -> 5x5 replicate
    +BN+act -> SE -> 1x1+drop, pre-norm residual)."""

    feedforward_dim: Optional[int] = None
    drop_prob: float = 0.1
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d = x.shape[-1]
        ff = self.feedforward_dim or 4 * d
        identity = x

        def bn(name):
            return nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                                momentum=1.0 - self.bn_momentum,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name)

        y = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        y = nn.Conv(ff, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(y)
        y = tnn.gelu(bn("bn1")(y))

        y = pad2d(y, 2, 2, 2, 2, mode="edge")
        y = nn.Conv(ff, (5, 5), padding="VALID", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = tnn.gelu(bn("bn2")(y))

        s = y.mean(axis=(1, 2))
        s = _dense(ff // 4, self.dtype, "se0")(s)
        s = tnn.gelu(s)
        s = _dense(ff, self.dtype, "se1")(s)
        y = y * nn.sigmoid(s)[:, None, None, :]

        y = nn.Conv(d, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(y)
        y = nn.Dropout(self.drop_prob, deterministic=not train)(y)
        return y + identity


def lion_reorder_interleave(x: jnp.ndarray) -> jnp.ndarray:
    """Channel quarters -> 2x2 interleaved pixels (reference ``LionReorder``,
    ``lion_layer.py:124-151``: x0->(0,0), x1->(1,0), x2->(0,1), x3->(1,1))."""
    b, h, w, d = x.shape
    assert d % 4 == 0
    d4 = d // 4
    g = x.reshape(b, h, w, 4, d4)
    # group index g -> (row_off, col_off) = (g % 2, g // 2)
    g = g.reshape(b, h, w, 2, 2, d4)      # (..., col_off, row_off, c)
    g = g.transpose(0, 1, 4, 2, 3, 5)     # (b, h, row_off, w, col_off, c)
    return g.reshape(b, 2 * h, 2 * w, d4)


class LionReorder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        y = lion_reorder_interleave(x)
        y = pad2d(y, 1, 1, 1, 1, mode="edge")
        return nn.Conv(d // 2, (3, 3), padding="VALID", use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(y)


class LionLayer(nn.Module):
    """(reference ``LionLayer``, ``lion_layer.py:354-417``)."""

    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    last_block: bool = False
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, enc: jnp.ndarray,
                 train: bool = False):
        ak = dict(attn_drop_prob=self.attn_drop_prob,
                  drop_prob=self.drop_prob, dtype=self.dtype)
        hidden, attn = LionAxialAttention(axis="h", name="attn_h", **ak)(
            hidden, train=train)
        hidden, cross = LionAxialAttention(axis="h", cross=True,
                                           name="cross_attn_h", **ak)(
            hidden, enc, train=train)
        hidden = LionFeedForwardConv(feedforward_dim=hidden.shape[-1],
                                     drop_prob=self.drop_prob,
                                     bn_momentum=self.bn_momentum,
                                     dtype=self.dtype,
                                     name="feed_forward_h")(hidden, train=train)

        hidden, attn = LionAxialAttention(axis="w", name="attn_w", **ak)(
            hidden, train=train)
        hidden, cross = LionAxialAttention(axis="w", cross=True,
                                           name="cross_attn_w", **ak)(
            hidden, enc, train=train)
        hidden = LionFeedForwardConv(feedforward_dim=hidden.shape[-1],
                                     drop_prob=self.drop_prob,
                                     bn_momentum=self.bn_momentum,
                                     dtype=self.dtype,
                                     name="feed_forward_w")(hidden, train=train)

        hidden = LionReorder(dtype=self.dtype, name="upscale")(hidden)
        if not self.last_block:
            hidden = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                  name="out_norm")(hidden)
        else:
            hidden = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                                  momentum=1.0 - self.bn_momentum,
                                  dtype=self.dtype, param_dtype=jnp.float32,
                                  name="out_bn")(hidden)
            hidden = tnn.gelu(hidden)
        return hidden, attn, cross


class PPMv2(nn.Module):
    """(reference ``PyramidPoolingModuleV2``, ``ODA/layer_utils.py:110-156``):
    bias-free 1x1 reduces per scale, concat -> BN -> GELU -> 3x3 conv."""

    proj_ch: int
    out_ch: int
    spatial_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, h, w, c = x.shape
        spp = [x]
        for i, size in enumerate(self.spatial_sizes):
            y = adaptive_avg_pool2d(x, (size, size))
            y = nn.Conv(self.proj_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"reduce{i}")(y)
            spp.append(resize_bilinear(y, (h, w), align_corners=True))
        y = jnp.concatenate(spp, axis=-1)
        y = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                         momentum=1.0 - self.bn_momentum, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(y)
        y = tnn.gelu(y)
        y = pad2d(y, 1, 1, 1, 1, mode="edge")
        return nn.Conv(self.out_ch, (3, 3), padding="VALID", use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(y)


def apply_out_func(out: jnp.ndarray, out_func: str,
                   min_depth: float, max_depth: float) -> jnp.ndarray:
    """ODA model output heads (reference ``oda_lion.py:46-55,76-83``):
    sigmoid-family outputs scale to (min, max); relu scales by max."""
    from .lime import scaled_sigmoid
    out = jnp.asarray(out, jnp.float32)
    if out_func == "sigmoid":
        out = nn.sigmoid(out)
    elif out_func == "scaled_sigmoid":
        out = scaled_sigmoid(out, 4.0, 0.5)
    elif out_func == "inv_scaled_sigmoid":
        out = scaled_sigmoid(out, 0.25, 0.5)
    elif out_func == "relu":
        return nn.relu(out) * max_depth + min_depth
    else:
        raise ValueError(f"Unsupported out_func {out_func}.")
    return out * (max_depth - min_depth) + min_depth


class ODALionDecoder(nn.Module):
    """(reference ``ODALionDecoder``, ``decoder_lion.py:11-141``). Returns raw
    (pre-out_func) logits + attention maps."""

    channels: int = 2048
    ppm_proj: int = 512  # fixed upstream (decoder_lion.py:48-53)
    drop_prob: float = 0.1
    attn_drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        f0, f1, f2, f3 = features
        c = self.channels
        hd = [c // 8, c // 4, c // 2, c]

        hidden = PPMv2(proj_ch=self.ppm_proj, out_ch=c, dtype=self.dtype,
                       name="ppm")(f3, train=train)
        pe = self.param("pe", trunc_normal_init(math.sqrt(1.0 / c)),
                        hidden.shape[1:])
        hidden = hidden + nn.Dropout(
            self.drop_prob, deterministic=not train)(
            pe[None].astype(hidden.dtype))

        attns = ()
        for i, (enc, last) in enumerate(((f3, False), (f2, False),
                                         (f1, False), (f0, True))):
            hidden, a, ca = LionLayer(
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                last_block=last, dtype=self.dtype,
                name=f"lion{32 >> i}")(hidden, enc, train=train)
            attns += (a, ca)

        out = ConvBN(hd[0] // 2, 3, dtype=self.dtype,
                     name="out_conv0")(hidden, train)
        out = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="out_conv1")(out)
        return out, attns


class ODALionModel(nn.Module):
    """(reference ``ODALionModel`` + ``ODALionDecoder``)."""

    decoder_channels: int = 2048
    min_depth: float = 0.001
    max_depth: float = 80.0
    drop_prob: float = 0.1
    attn_drop_prob: float = 0.0
    out_func: str = "sigmoid"
    resize_to_multiple: bool = True
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = ODASwinEncoder(
            resize_to_multiple=self.resize_to_multiple, dtype=self.dtype,
            encoder_kwargs=self.encoder_kwargs, name="encoder")(x, train=train)
        out, attns = ODALionDecoder(
            channels=self.decoder_channels, drop_prob=self.drop_prob,
            attn_drop_prob=self.attn_drop_prob, dtype=self.dtype,
            ppm_proj=min(512, self.decoder_channels // 4),
            name="decoder")(feats, train=train)
        out = apply_out_func(out, self.out_func, self.min_depth, self.max_depth)
        return out, attns

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            decoder_channels=opt.get("decoder_channels", 2048),
            min_depth=min_depth, max_depth=max_depth,
            drop_prob=opt.get("drop_prob", 0.1),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            out_func=opt.get("out_func", "sigmoid"))
        kwargs.update(overrides)
        return cls(**kwargs)
