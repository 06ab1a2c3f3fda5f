"""ODA Jeju — Luna-style decoder with [hidden || encoder] keys/values and
token-space reorder upsampling.

Behavioral reference: ``model/ODA/{jeju_layer,decoder_jeju,oda_jeju}.py``.
Per scale: a JejuBlock (Luna variant whose FIRST attention keys/values come
from the concat of the hidden map and that scale's encoder features,
``jeju_layer.py:103-105``) + a JejuFeedForward (1x1+BN+act -> grouped 5x5
replicate conv+BN+act -> SE(1/16) -> 1x1+BN, spatial residual). Between
scales: ``SpatialUpsample2d`` halves channels (bilinear x2 + 3x3 conv + LN)
and ``ReorderUpsample1d`` doubles aux tokens while halving aux dim.

The reference decoder mixes token and NCHW layouts (``JejuFeedForward``
returns NCHW, ``SpatialUpsample2d`` converts back to tokens); here the
dataflow is NHWC end-to-end. Executed activation parity:
``tests/test_family_parity.py::test_oda_jeju_decoder_parity``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from .encoder import ODASwinEncoder
from .lion import PPMv2
from ...ops.conv import ConvBN
from ...ops.pad import pad2d
from ...ops.resize import upsample2d
from ...ops.init import trunc_normal_init


def _dense(feat, dtype, name):
    return nn.Dense(feat, dtype=dtype, param_dtype=jnp.float32,
                    kernel_init=trunc_normal_init(0.02), name=name)


class JejuBlock(nn.Module):
    """(reference ``JejuBlock``, ``jeju_layer.py:78-209``)."""

    aux_dim: int
    num_heads: int
    qk_proj_dim: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, enc: jnp.ndarray,
                 aux: jnp.ndarray, train: bool = False):
        b, s, d = hidden.shape
        qk = self.qk_proj_dim or self.aux_dim
        nh = self.num_heads
        scale = (qk // nh) ** -0.5

        def heads(x):
            return x.reshape(b, -1, nh, x.shape[-1] // nh)

        def attend(q, k, v, out_dim):
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
            w = attn
            attn = nn.Dropout(self.attn_drop_prob,
                              deterministic=not train)(attn.astype(self.dtype))
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
            return out.reshape(b, -1, out_dim), w

        # attn1: aux <- [hidden || enc]
        he = jnp.concatenate([hidden, enc], axis=-1)
        q1 = heads(_dense(qk, self.dtype, "q1_proj")(aux))
        k1 = heads(_dense(qk, self.dtype, "k1_proj")(he))
        v1 = heads(_dense(self.aux_dim, self.dtype, "v1_proj")(he))
        out1, attn1 = attend(q1, k1, v1, self.aux_dim)
        out1 = _dense(self.aux_dim, self.dtype, "o1_proj")(out1)
        aux_out = aux + out1

        # attn2: hidden <- updated aux
        q2 = heads(_dense(qk, self.dtype, "q2_proj")(hidden))
        k2 = heads(_dense(qk, self.dtype, "k2_proj")(aux_out))
        v2 = heads(_dense(d, self.dtype, "v2_proj")(aux_out))
        out2, attn2 = attend(q2, k2, v2, d)
        out2 = _dense(d, self.dtype, "o2_proj")(out2)
        out2 = nn.Dropout(self.drop_prob, deterministic=not train)(out2)
        out = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                           name="norm")(hidden + out2)
        return out, aux_out, attn1, attn2


class JejuFeedForward(nn.Module):
    """(reference ``JejuFeedForward``; spatial residual, no trailing norm)."""

    num_groups: int = 1
    feedforward_dim: Optional[int] = None
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_nhwc: jnp.ndarray, train: bool = False):
        d = x_nhwc.shape[-1]
        ff = self.feedforward_dim or 4 * d
        identity = x_nhwc

        def bn(name):
            return nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                                momentum=1.0 - self.bn_momentum,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name)

        y = nn.Conv(ff, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x_nhwc)
        y = tnn.gelu(bn("bn1")(y))
        y = pad2d(y, 2, 2, 2, 2, mode="edge")
        # grouped 5x5 with groups=num_heads, exactly as upstream
        # (jeju_layer.py:34-39)
        y = nn.Conv(ff, (5, 5), padding="VALID", use_bias=False,
                    feature_group_count=self.num_groups,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = tnn.gelu(bn("bn2")(y))

        s = y.mean(axis=(1, 2))
        s = _dense(max(ff // 16, 1), self.dtype, "se0")(s)
        s = tnn.gelu(s)
        s = _dense(ff, self.dtype, "se1")(s)
        y = y * nn.sigmoid(s)[:, None, None, :]

        y = nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(y)
        y = bn("bn3")(y)
        return y + identity


class ReorderUpsample1d(nn.Module):
    """Token-space upsample: (b, s, d) -> (b, 2s, d/2) + Linear + LN
    (reference ``decoder_jeju.py:11-25``)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, d = x.shape
        x = x.reshape(b, 2 * s, d // 2)
        x = _dense(d // 2, self.dtype, "fc")(x)
        return tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="norm")(x)


class SpatialUpsample2d(nn.Module):
    """Bilinear x2 + 3x3 replicate conv to d/2 + LN (or BN+GELU at the last
    stage) (reference ``decoder_jeju.py:58-95``)."""

    out_bn: bool = False
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_nhwc: jnp.ndarray, train: bool = False):
        d = x_nhwc.shape[-1]
        y = upsample2d(x_nhwc, 2)
        y = pad2d(y, 1, 1, 1, 1, mode="edge")
        y = nn.Conv(d // 2, (3, 3), padding="VALID",
                    use_bias=not self.out_bn, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(y)
        if self.out_bn:
            y = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                             momentum=1.0 - self.bn_momentum,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="bn")(y)
            y = tnn.gelu(y)
        else:
            y = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm")(y)
        return y


class ODAJejuDecoder(nn.Module):
    """(reference ``ODAJejuDecoder``, ``decoder_jeju.py:97-306``). Returns raw
    (pre-sigmoid) logits, the final aux bank and attention maps."""

    channels: int = 2048
    num_aux: int = 128
    num_heads: int = 64
    ppm_proj: int = 512  # fixed upstream (decoder_jeju.py:146-151)
    drop_prob: float = 0.1
    attn_drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        f0, f1, f2, f3 = [
            tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"norm_f{i}")(f)
            for i, f in enumerate(features)]
        c = self.channels
        hd = [c // 8, c // 4, c // 2, c]
        heads = [max(self.num_heads // 8, 1), max(self.num_heads // 4, 1),
                 self.num_heads // 2, self.num_heads]
        b = f0.shape[0]

        hidden = PPMv2(proj_ch=self.ppm_proj, out_ch=c, dtype=self.dtype,
                       name="ppm")(f3, train=train)
        hidden_tok = hidden.reshape(b, -1, c)
        hidden_tok = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                  name="norm_ppm")(hidden_tok)
        hidden = hidden_tok.reshape(hidden.shape)

        aux0 = self.param("aux", trunc_normal_init(math.sqrt(1.0 / c)),
                          (1, self.num_aux, c))
        aux = jnp.broadcast_to(aux0, (b,) + aux0.shape[1:]).astype(self.dtype)
        aux = nn.Dropout(self.drop_prob, deterministic=not train)(aux)
        aux = aux * math.sqrt(1.0 / c)

        attns = ()
        encs = [f3, f2, f1, f0]
        for i in range(4):
            h, w, d = hidden.shape[1], hidden.shape[2], hidden.shape[3]
            enc_tok = encs[i].reshape(b, h * w, -1)
            hid_tok = hidden.reshape(b, h * w, d)
            hid_tok, aux, a1, a2 = JejuBlock(
                aux_dim=aux.shape[-1], num_heads=heads[3 - i],
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                dtype=self.dtype, name=f"jeju{32 >> i}")(
                hid_tok, enc_tok, aux, train=train)
            hidden = JejuFeedForward(
                num_groups=heads[3 - i], bn_momentum=0.1, dtype=self.dtype,
                name=f"jeju{32 >> i}_ff")(hid_tok.reshape(b, h, w, d),
                                          train=train)
            attns += (a1, a2)
            last = i == 3
            hidden = SpatialUpsample2d(out_bn=last, dtype=self.dtype,
                                       name=f"up{32 >> i}")(hidden, train=train)
            if not last:
                aux = ReorderUpsample1d(dtype=self.dtype,
                                        name=f"aux_up{32 >> i}")(aux)

        fc = hd[0] // 2
        out = ConvBN(fc, 3, dtype=self.dtype, name="out_conv0")(hidden, train)
        out = ConvBN(fc, 1, dtype=self.dtype, name="out_conv1")(out, train)
        out = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="out_conv2")(out)
        return out, aux, attns


class ODAJejuModel(nn.Module):
    """(reference ``ODAJejuModel`` + ``ODAJejuDecoder``)."""

    decoder_channels: int = 2048
    num_aux: int = 128
    num_heads: int = 64
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
        out, aux, attns = ODAJejuDecoder(
            channels=self.decoder_channels, num_aux=self.num_aux,
            num_heads=self.num_heads,
            ppm_proj=min(512, self.decoder_channels // 4),
            drop_prob=self.drop_prob, attn_drop_prob=self.attn_drop_prob,
            dtype=self.dtype, name="decoder")(feats, train=train)
        from .lion import apply_out_func
        out = apply_out_func(out, self.out_func, self.min_depth, self.max_depth)
        return out, aux, attns

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            decoder_channels=opt.get("decoder_channels", 2048),
            num_aux=opt.get("num_aux", 128),
            num_heads=opt.get("num_heads", 64),
            min_depth=min_depth, max_depth=max_depth,
            drop_prob=opt.get("drop_prob", 0.1),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            out_func=opt.get("out_func", "sigmoid"))
        kwargs.update(overrides)
        return cls(**kwargs)
