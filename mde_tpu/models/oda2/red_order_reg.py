"""ODA2 ordered-reduction models: ``oda2_red_order_reg`` / ``oda2_red_order_cls``.

Behavioral reference: ``model/ODA2/{oda2_red_order_reg_decoder,
oda2_red_order_reg,oda2_red_order_cls_decoder,oda2_red_order_cls}.py``.
Ordered-depth iterative refinement with *reduction* attention (K/V from
r x r-pooled tokens):

* reg head: per round, conv head -> 1ch logit -> sigmoid out_i; quantize
  log-sigmoid(logit)/10 + 1 into num_emb indices (no grad); look up a FIXED
  sinusoidal depth embedding; the OrderedReductionBlock feeds the embedding
  through an FF + LayerNorm(init scale 0.1), ADDS it to the features and runs
  2 x (reduction SA + DWConv-GLU FF).
* cls head: conv head emits num_emb logits; softmax(logit/T) mixes LEARNABLE
  log-spaced depth_bins (init exp(linspace(-10,0))) for the output map, and
  mixes a LEARNABLE sinusoidal depth embedding for the feature update.

Neck: per-scale 2x ConvBN chains to (2d, d, d/2, d/4) channels, upsampled to
1/4 scale, concatenated, Linear+LN.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ...ops.conv import ConvBN
from ...ops.mlp import PreNormDWConvFF
from ...ops.reduction import (
    PreNormOrderedReductionSA, sinusoidal_depth_embedding,
)
from ...ops.resize import resize_bilinear, upsample2d
from ...ops.init import trunc_normal_init
from .red_order_swin2 import _resize_policy
from ..swin import swin_base, swin_large, SwinTransformer


class OrderedReductionBlock(nn.Module):
    """(reference ``OrderedReductionBlock``, ``oda2_red_order_reg_decoder.py:190-243``)."""

    num_heads: int
    reduction_ratio: int = 8
    feedforward_dims: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, de: jnp.ndarray, train: bool = False):
        d = x.shape[-1]
        # depth-embedding FF with LayerNorm scale initialized to 0.1
        y = nn.Dense(d * 4, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02), name="de_ff0")(de)
        y = nn.Dropout(self.drop_prob, deterministic=not train)(y)
        y = tnn.gelu(y)
        y = nn.Dense(d, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02), name="de_ff1")(y)
        y = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         scale_init=nn.initializers.constant(0.1),
                         name="de_norm")(y)
        x = x + y

        sa_kwargs = dict(num_heads=self.num_heads,
                         reduction_ratio=self.reduction_ratio,
                         attn_drop_prob=self.attn_drop_prob,
                         drop_prob=self.drop_prob, dtype=self.dtype)
        ff_kwargs = dict(feedforward_dims=self.feedforward_dims,
                         drop_prob=self.drop_prob,
                         bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                         dtype=self.dtype)

        # reference uses shift 0 on BOTH SAs (``:224`` — shifted variant
        # commented out upstream)
        x, attn1 = PreNormOrderedReductionSA(shift_size=0, name="sa1",
                                             **sa_kwargs)(x, y, train=train)
        x = PreNormDWConvFF(name="ff1", **ff_kwargs)(x, train=train)
        x, attn2 = PreNormOrderedReductionSA(shift_size=0, name="sa2",
                                             **sa_kwargs)(x, y, train=train)
        x = PreNormDWConvFF(name="ff2", **ff_kwargs)(x, train=train)
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        return x, (attn1, attn2)


class _RedNeck(nn.Module):
    """Per-scale conv chains to (2d, d, d/2, d/4) + upsample + concat + Linear/LN
    (reference ``OrderedReductionRegDecoder`` neck, ``:355-384``)."""

    dec_dim: int
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    return_concat: bool = False  # red_luna needs the pre-linear concat too
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_features, train: bool = False):
        e4, e8, e16, e32 = enc_features
        d = self.dec_dim
        ck = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                  dtype=self.dtype)

        def chain(x, out_ch, scale, name):
            x = ConvBN(x.shape[-1], 3, name=f"{name}_0", **ck)(x, train)
            x = ConvBN(out_ch, 3, name=f"{name}_1", **ck)(x, train)
            if scale > 1:
                x = upsample2d(x, scale)
            return x

        e32 = chain(e32, d // 4, 8, "enc_conv32")
        e16 = chain(e16, d // 2, 4, "enc_conv16")
        e8 = chain(e8, d, 2, "enc_conv8")
        e4 = chain(e4, d * 2, 1, "enc_conv4")

        cat = jnp.concatenate([e4, e8, e16, e32], axis=-1)
        dec = nn.Dense(d, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init(0.02), name="dec_linear")(cat)
        dec = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                           name="dec_norm")(dec)
        if self.return_concat:
            return dec, cat
        return dec


class OrderedReductionRegHead(nn.Module):
    """(reference ``OrderedReductionRegHead``, ``:246-332``)."""

    num_heads: int
    num_repeats: int
    num_emb: int = 128
    reduction_ratio: int = 8
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def _conv_head(self, in_dims, i, x, train):
        ck = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                  dtype=self.dtype)
        x = ConvBN(in_dims // 4, 3, name=f"conv{i}_0", **ck)(x, train)
        x = ConvBN(in_dims // 4, 3, name=f"conv{i}_1", **ck)(x, train)
        return nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name=f"conv{i}_out")(x)

    def _logit_to_indices(self, logit):
        """log-sigmoid quantization (reference ``:297-305``)."""
        ls = jax.nn.log_sigmoid(jax.lax.stop_gradient(logit))
        idx = jnp.clip(ls / 10.0 + 1.0, 0.0, 1.0)
        idx = jnp.floor(idx * self.num_emb - 1e-3)
        return jnp.clip(idx, 0, self.num_emb - 1).astype(jnp.int32)[..., 0]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d = x.shape[-1]
        table = sinusoidal_depth_embedding(self.num_emb, d, base=2000.0)

        outs = []
        attns = ()
        for i in range(self.num_repeats):
            logit = self._conv_head(d, i, x, train)
            outs.append(jax.nn.sigmoid(logit))

            idx = self._logit_to_indices(logit)
            de = jnp.take(table, idx, axis=0).astype(self.dtype)  # (b,h,w,d)

            x, aws = OrderedReductionBlock(
                num_heads=self.num_heads,
                reduction_ratio=self.reduction_ratio,
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                dtype=self.dtype, name=f"attn{i}")(x, de, train=train)
            attns += aws

        logit = self._conv_head(d, self.num_repeats, x, train)
        outs.append(jax.nn.sigmoid(logit))
        return tuple(outs), attns


class OrderedReductionClsHead(nn.Module):
    """(reference ``OrderedReductionClsHead``,
    ``oda2_red_order_cls_decoder.py:12-106``)."""

    num_heads: int
    num_repeats: int
    num_emb: int = 128
    reduction_ratio: int = 8
    temperature: float = 1.0
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def _conv_head(self, in_dims, i, x, train):
        ck = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                  dtype=self.dtype)
        x = ConvBN(in_dims // 4, 3, name=f"conv{i}_0", **ck)(x, train)
        x = ConvBN(in_dims // 4, 3, name=f"conv{i}_1", **ck)(x, train)
        return nn.Conv(self.num_emb, (1, 1), use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name=f"conv{i}_out")(x)

    @staticmethod
    def _bins_init(num_emb: int):
        def init(key, shape, dtype=jnp.float32):
            bins = np.linspace(-10.0, 0.0, num_emb - 1)[:-1]
            bins = np.exp(bins).tolist()
            bins = [0.001] + bins + [0.999]
            return jnp.asarray(bins, dtype).reshape(shape)
        return init

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d = x.shape[-1]
        depth_bins = self.param("depth_bins", self._bins_init(self.num_emb),
                                (self.num_emb,))
        emb_init = sinusoidal_depth_embedding(self.num_emb, d, base=1000.0)
        depth_embedding = self.param(
            "depth_embedding", lambda key, shape: emb_init, (self.num_emb, d))

        def decode(logit):
            prob = nn.softmax(jnp.asarray(logit, jnp.float32) / self.temperature,
                              axis=-1)
            out = jnp.sum(prob * depth_bins[None, None, None, :], axis=-1,
                          keepdims=True)
            return prob, out

        outs = []
        attns = ()
        for i in range(self.num_repeats):
            logit = self._conv_head(d, i, x, train)
            prob, out = decode(logit)
            outs.append(out)

            de = jnp.einsum("bhwc,cd->bhwd", prob,
                            depth_embedding.astype(jnp.float32))
            x, aws = OrderedReductionBlock(
                num_heads=self.num_heads,
                reduction_ratio=self.reduction_ratio,
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                dtype=self.dtype, name=f"attn{i}")(
                x, de.astype(self.dtype), train=train)
            attns += aws

        logit = self._conv_head(d, self.num_repeats, x, train)
        _, out = decode(logit)
        outs.append(out)
        return tuple(outs), attns


class OrderedReductionDecoder(nn.Module):
    """Reference ``OrderedReductionRegDecoder`` / ``OrderedReductionClsDecoder``
    (``oda2_red_order_reg_decoder.py:335-426``,
    ``oda2_red_order_cls_decoder.py:107-292``): red neck + ordered reduction
    head. Returns the raw per-repeat sigmoid/expected-value maps."""

    dec_dim: int
    num_heads: int
    num_repeats: int
    num_emb: int = 128
    reduction_ratio: int = 8
    temperature: float = 1.0
    cls_head: bool = False
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_features, train: bool = False):
        dec = _RedNeck(dec_dim=self.dec_dim, bn_momentum=self.bn_momentum,
                       bn_eps=self.bn_eps, dtype=self.dtype,
                       name="neck")(enc_features, train=train)

        head_kwargs = dict(
            num_heads=self.num_heads, num_repeats=self.num_repeats,
            num_emb=self.num_emb, reduction_ratio=self.reduction_ratio,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            dtype=self.dtype, name="reducer")
        if self.cls_head:
            return OrderedReductionClsHead(temperature=self.temperature,
                                           **head_kwargs)(dec, train=train)
        return OrderedReductionRegHead(**head_kwargs)(dec, train=train)


class ODA2OrderedRegModel(nn.Module):
    """Model wrapper for reg ('oda2_red_order_reg') and cls
    ('oda2_red_order_cls') variants (reference ``oda2_red_order_reg.py`` /
    ``oda2_red_order_cls.py`` — same resize policy as the swin2 flagship)."""

    dec_dim: int
    min_depth: float
    max_depth: float
    num_heads: int
    num_repeats: int
    num_emb: int
    reduction_ratio: int = 8
    cls_head: bool = False
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
        features = enc(x, train=train)

        outs, attns = OrderedReductionDecoder(
            dec_dim=self.dec_dim, num_heads=self.num_heads,
            num_repeats=self.num_repeats, num_emb=self.num_emb,
            reduction_ratio=self.reduction_ratio, cls_head=self.cls_head,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            dtype=self.dtype, name="decoder")(features, train=train)

        outs = tuple(jnp.asarray(o, jnp.float32) * self.max_depth for o in outs)
        return outs[-1], outs, attns

    @classmethod
    def build(cls, opt, min_depth: float, max_depth: float,
              cls_head: bool = False, **overrides):
        kwargs = dict(
            dec_dim=opt["dec_dim"], num_heads=opt["num_heads"],
            num_repeats=opt["num_repeats"], num_emb=opt["num_emb"],
            reduction_ratio=opt.get("reduction_ratio", 8),
            min_depth=min_depth, max_depth=max_depth, cls_head=cls_head,
            encoder_type=opt.get("encoder_type", "large"),
            drop_prob=opt.get("drop_prob", 0.0),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            bn_momentum=opt.get("bn_momentum", 0.1),
            bn_eps=opt.get("bn_eps", 1e-5))
        kwargs.update(overrides)
        return cls(**kwargs)
