"""ODA Lime — lightweight conv decoder with global channel cross-attention.

Behavioral reference: ``model/ODA/{lime_layer,decoder_lime,oda_lime}.py``.
The decoder ignores the feature pyramid's spatial structure: all 4 stages are
nearest-upsampled to 1/4 scale, concatenated and projected to a 2048-dim
"encoder memory" (divided by num_layers); a conv stem maps the RAW IMAGE to a
1/4-scale hidden map; then ``num_layers`` x [LimeConvBlock (1x1-3x3-1x1
residual) + channel cross-attention (attn = k^T q over channels, softmax over
the first channel index)]. Output head: 2x ConvBN + 1x1 at 1/4 scale with a
selectable sigmoid family (incl. the reference's ScaledSigmoid
``1/(1+alpha*exp(-x/beta))``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from .encoder import ODASwinEncoder, oda_resize_policy
from ...ops.conv import ConvBN
from ...ops.pad import pad2d
from ...ops.resize import resize_nearest, resize_bilinear
from ...ops.init import trunc_normal_init


def scaled_sigmoid(x, alpha: float, beta: float):
    """(reference ``ScaledSigmoid``, ``ODA/layer_utils.py:40-63``)."""
    return 1.0 / (1.0 + alpha * jnp.exp(-x / beta))


class LimeConvBlock(nn.Module):
    mid_ch: int
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        in_ch = x.shape[-1]
        identity = x

        def bn(name):
            return nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                                momentum=1.0 - self.bn_momentum,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name)

        y = nn.Conv(self.mid_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = tnn.gelu(bn("bn1")(y))
        y = pad2d(y, 1, 1, 1, 1, mode="edge")
        y = nn.Conv(self.mid_ch, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = tnn.gelu(bn("bn2")(y))
        y = nn.Conv(in_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(y)
        y = bn("bn3")(y)
        return y + identity


class LimeCrossAttention(nn.Module):
    """Channel cross-attention over the full token set
    (reference ``:57-102``)."""

    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, enc: jnp.ndarray,
                 train: bool = False):
        b, s, d = hidden.shape
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(hidden)
        e = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="enc_norm")(enc)

        def dense(feat, name):
            return nn.Dense(feat, dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        q = dense(d, "q_proj")(x)
        k = dense(d, "k_proj")(e)
        v = dense(d, "v_proj")(e)

        attn = jnp.einsum("bsd,bse->bde", k, q) * math.sqrt(1.0 / s)
        attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-2)
        weights = attn
        attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
            attn.astype(self.dtype))

        out = jnp.einsum("bsd,bde->bse", v, attn)
        out = dense(d, "o_proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        return out + hidden, weights


class ODALimeDecoder(nn.Module):
    """(reference ``ODALimeDecoder``, ``decoder_lime.py:11-131``). Takes the
    raw image + the 4 NHWC encoder stages; returns raw logits + attns."""

    channels: int = 256
    num_layers: int = 16
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, features, train: bool = False):
        f0, f1, f2, f3 = features
        c = self.channels
        q4 = (f0.shape[1], f0.shape[2])

        # encoder memory: all stages to 1/4 nearest, concat, LN + Linear
        enc = jnp.concatenate([
            f0,
            resize_nearest(f1, q4),
            resize_nearest(f2, q4),
            resize_nearest(f3, q4),
        ], axis=-1)
        b = enc.shape[0]
        enc = enc.reshape(b, -1, enc.shape[-1])
        enc = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                           name="stem_enc_norm")(enc)
        enc = nn.Dense(2048, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init(0.02),
                       name="stem_enc_linear")(enc)
        enc = enc / self.num_layers

        # image stem: two stride-2 4x4 convs -> 1/4 scale hidden
        def bn(name):
            return nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                                momentum=1.0 - self.bn_momentum,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name)

        h = nn.Conv(c // 2, (4, 4), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv0")(img)
        h = tnn.gelu(bn("stem_bn0")(h))
        h = nn.Conv(c, (4, 4), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv1")(h)
        h = bn("stem_bn1")(h)
        if (h.shape[1], h.shape[2]) != q4:
            h = resize_bilinear(h, q4, align_corners=True)

        attns = []
        for i in range(self.num_layers):
            h = LimeConvBlock(mid_ch=c, bn_momentum=self.bn_momentum,
                              dtype=self.dtype, name=f"layers{i}_conv")(h, train)
            hh = h.reshape(b, -1, c)
            hh, a = LimeCrossAttention(
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                dtype=self.dtype, name=f"layers{i}_attn")(hh, enc, train=train)
            h = hh.reshape(h.shape)
            attns.append(a)

        out = ConvBN(c, 3, bn_momentum=self.bn_momentum, dtype=self.dtype,
                     name="out_conv0")(h, train)
        out = ConvBN(c, 3, bn_momentum=self.bn_momentum, dtype=self.dtype,
                     name="out_conv1")(out, train)
        out = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="out_conv2")(out)
        return out, tuple(attns)


class ODALimeModel(nn.Module):
    decoder_channels: int = 256
    decoder_layers: int = 16
    min_depth: float = 0.001
    max_depth: float = 80.0
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    out_func: str = "sigmoid"
    bn_momentum: float = 0.1
    resize_to_multiple: bool = True
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.resize_to_multiple:
            x = resize_bilinear(x, oda_resize_policy(x.shape[1], x.shape[2]),
                                align_corners=True)
        feats = ODASwinEncoder(
            resize_to_multiple=False, dtype=self.dtype,
            encoder_kwargs=self.encoder_kwargs, name="encoder")(x, train=train)

        out, attns = ODALimeDecoder(
            channels=self.decoder_channels, num_layers=self.decoder_layers,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="decoder")(x, feats, train=train)

        from .lion import apply_out_func
        out = apply_out_func(out, self.out_func, self.min_depth, self.max_depth)
        return out, attns

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            decoder_channels=opt.get("decoder_channels", 256),
            decoder_layers=opt.get("decoder_layers", 16),
            min_depth=min_depth, max_depth=max_depth,
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            drop_prob=opt.get("drop_prob", 0.1),
            out_func=opt.get("out_func", "sigmoid"))
        kwargs.update(overrides)
        return cls(**kwargs)
