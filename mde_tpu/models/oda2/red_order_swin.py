"""ODA2 ``oda2_red_order_swin`` — gen-1 ordered windowed refinement.

Behavioral reference: ``model/ODA2/oda2_red_order_swin_decoder.py`` +
``oda2_red_order_swin.py``. Differences vs the swin2 flagship:

* NO relative-depth bias table: the quantized depth map is embedded via a
  LEARNABLE sinusoidal-initialized table (base 2000) and ADDED to the
  features through a Linear + LayerNorm at the top of each block
  (``:128-153``);
* plain pre-norm windowed SA (no bias) with FF BEFORE each SA
  (ff1 -> sa1(shift 0) -> ff2 -> sa2(shift r/2) -> Linear -> LN);
* quantization uses log-sigmoid/10 + 1 (like red_order_reg);
* neck: the red-style per-scale chains of the reduction decoder.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ...ops.conv import ConvBN
from ...ops.mlp import PreNormFF
from ...ops.ordered_attention import PreNormOrderedSwinSA
from ...ops.reduction import sinusoidal_depth_embedding
from ...ops.resize import resize_bilinear
from ...ops.init import trunc_normal_init
from .red_order_swin2 import _resize_policy
from .red_order_reg import _RedNeck
from ..swin import swin_base, swin_large, SwinTransformer


class Gen1OrderedSwinBlock(nn.Module):
    num_heads: int
    window_size: int = 8
    feedforward_dims: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, de: jnp.ndarray, train: bool = False):
        d = x.shape[-1]
        de = nn.Dense(d, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=trunc_normal_init(0.02), name="de_proj")(de)
        de = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="de_norm")(de)
        x = x + de

        # gen-1 uses plain windowed SA: reuse the ordered SA with bias "none"
        sa_kwargs = dict(num_heads=self.num_heads, num_emb=1,
                         window_size=self.window_size, bias_type="none",
                         attn_drop_prob=self.attn_drop_prob,
                         drop_prob=self.drop_prob, dtype=self.dtype)
        ff_kwargs = dict(feedforward_dims=self.feedforward_dims,
                         drop_prob=self.drop_prob, dtype=self.dtype)
        dummy_idx = jnp.zeros(x.shape[:3], jnp.int32)

        x = PreNormFF(name="ff1", **ff_kwargs)(x, train=train)
        x, attn1 = PreNormOrderedSwinSA(shift_size=0, name="sa1",
                                        **sa_kwargs)(x, dummy_idx, train=train)
        x = PreNormFF(name="ff2", **ff_kwargs)(x, train=train)
        x, attn2 = PreNormOrderedSwinSA(shift_size=self.window_size // 2,
                                        name="sa2", **sa_kwargs)(
            x, dummy_idx, train=train)

        x = nn.Dense(d, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02), name="linear")(x)
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        return x, (attn1, attn2)


class _Gen1Neck(nn.Module):
    """Gen-1 neck (``oda2_red_order_swin_decoder.py:238-275``): per scale
    THREE ConvBN (in->in, in->d/4, d/4->d/4) + upsample; concat (channels =
    dec_dim); bias-free Linear + LN."""

    dec_dim: int
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_features, train: bool = False):
        from ...ops.resize import upsample2d
        e4, e8, e16, e32 = enc_features
        d = self.dec_dim
        ck = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                  dtype=self.dtype)

        def chain(x, scale, name):
            x = ConvBN(x.shape[-1], 3, name=f"{name}_0", **ck)(x, train)
            x = ConvBN(d // 4, 3, name=f"{name}_1", **ck)(x, train)
            x = ConvBN(d // 4, 3, name=f"{name}_2", **ck)(x, train)
            if scale > 1:
                x = upsample2d(x, scale)
            return x

        e32 = chain(e32, 8, "enc_conv32")
        e16 = chain(e16, 4, "enc_conv16")
        e8 = chain(e8, 2, "enc_conv8")
        e4 = chain(e4, 1, "enc_conv4")

        dec = jnp.concatenate([e4, e8, e16, e32], axis=-1)
        dec = nn.Dense(d, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init(0.02),
                       name="dec_linear")(dec)
        dec = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="dec_norm")(dec)
        return dec


class Gen1OrderedSwinHead(nn.Module):
    num_heads: int
    num_repeats: int
    num_emb: int = 128
    window_size: int = 8
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
        ls = jax.nn.log_sigmoid(jax.lax.stop_gradient(logit))
        idx = jnp.clip(ls / 10.0 + 1.0, 0.0, 1.0)
        idx = jnp.floor(idx * self.num_emb - 1e-3)
        return jnp.clip(idx, 0, self.num_emb - 1).astype(jnp.int32)[..., 0]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        import math
        d = x.shape[-1]
        # gen-1 stores the LEARNABLE table UNSCALED and applies
        # de_scale=sqrt(1/d) at lookup (oda2_red_order_swin_decoder.py:175-185,
        # 208-210) — unlike red_order_reg's fixed pre-scaled buffer
        emb_init = (sinusoidal_depth_embedding(self.num_emb, d, base=2000.0)
                    * math.sqrt(float(d)))
        table = self.param("depth_embedding", lambda key, shape: emb_init,
                           (self.num_emb, d))
        de_scale = math.sqrt(1.0 / d)

        outs = []
        attns = ()
        for i in range(self.num_repeats):
            logit = self._conv_head(d, i, x, train)
            outs.append(jax.nn.sigmoid(logit))
            idx = self._logit_to_indices(logit)
            de = (jnp.take(table, idx, axis=0) * de_scale).astype(self.dtype)
            x, aws = Gen1OrderedSwinBlock(
                num_heads=self.num_heads, window_size=self.window_size,
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                dtype=self.dtype, name=f"attn{i}")(x, de, train=train)
            attns += aws

        logit = self._conv_head(d, self.num_repeats, x, train)
        outs.append(jax.nn.sigmoid(logit))
        return tuple(outs), attns


class Gen1OrderedSwinDecoder(nn.Module):
    """Reference ``OrderedSwinRegDecoder``
    (``oda2_red_order_swin_decoder.py:222-300``): gen-1 neck + ordered swin
    head. Returns the raw per-repeat sigmoid maps."""

    dec_dim: int
    num_heads: int
    num_repeats: int
    num_emb: int = 128
    window_size: int = 8
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_features, train: bool = False):
        dec = _Gen1Neck(dec_dim=self.dec_dim, bn_momentum=self.bn_momentum,
                        bn_eps=self.bn_eps, dtype=self.dtype,
                        name="neck")(enc_features, train=train)
        return Gen1OrderedSwinHead(
            num_heads=self.num_heads, num_repeats=self.num_repeats,
            num_emb=self.num_emb, window_size=self.window_size,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            dtype=self.dtype, name="reducer")(dec, train=train)


class ODA2OrderedSwinModel(nn.Module):
    dec_dim: int
    min_depth: float
    max_depth: float
    num_heads: int
    num_repeats: int
    num_emb: int
    window_size: int = 8
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

        outs, attns = Gen1OrderedSwinDecoder(
            dec_dim=self.dec_dim, num_heads=self.num_heads,
            num_repeats=self.num_repeats, num_emb=self.num_emb,
            window_size=self.window_size,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            dtype=self.dtype, name="decoder")(features, train=train)

        outs = tuple(jnp.asarray(o, jnp.float32) * self.max_depth for o in outs)
        return outs[-1], outs, attns

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            dec_dim=opt["dec_dim"], num_heads=opt["num_heads"],
            num_repeats=opt["num_repeats"], num_emb=opt["num_emb"],
            window_size=opt.get("window_size", 8),
            min_depth=min_depth, max_depth=max_depth,
            encoder_type=opt.get("encoder_type", "large"),
            drop_prob=opt.get("drop_prob", 0.0),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            bn_momentum=opt.get("bn_momentum", 0.1),
            bn_eps=opt.get("bn_eps", 1e-5))
        kwargs.update(overrides)
        return cls(**kwargs)
