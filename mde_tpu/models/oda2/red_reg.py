"""ODA2 ``oda2_red_reg`` — incremental reduction transformer, regression.

Behavioral reference: ``model/ODA2/{oda2_red_decoder,oda2_red_reg}.py``.
Red-style neck to a 1/4-scale map, then 4 x (reduction SA + FF) with
decreasing reduction ratio (8,8,4,4; shifts 0,4,0,2), then ConvBN + a 3x3
VALID conv head (the reference's padding=0 quirk shrinks the map by 2 px)
with sigmoid rescale.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops.conv import ConvBN
from ...ops.mlp import PreNormFF
from ...ops.reduction import PreNormReductionSA
from ...ops.resize import resize_bilinear
from .red_order_swin2 import _resize_policy
from .red_order_reg import _RedNeck
from ..swin import swin_base, swin_large, SwinTransformer


class IncrementalReductionModule(nn.Module):
    num_heads: int
    feedforward_dims: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        attns = ()
        for name, ratio, shift in (("8_1", 8, 0), ("8_2", 8, 4),
                                   ("4_1", 4, 0), ("4_2", 4, 2)):
            x, a = PreNormReductionSA(
                num_heads=self.num_heads, reduction_ratio=ratio,
                shift_size=shift, attn_drop_prob=self.attn_drop_prob,
                drop_prob=self.drop_prob, dtype=self.dtype,
                name=f"sa{name}")(x, train=train)
            x = PreNormFF(feedforward_dims=self.feedforward_dims,
                          drop_prob=self.drop_prob, dtype=self.dtype,
                          name=f"ff{name}")(x, train=train)
            attns += (a,)
        return x, attns


class ReductionTransformerRegDecoder(nn.Module):
    """Reference ``ReductionTransformerRegDecoder``
    (``oda2_red_decoder.py:162-230``): red neck -> incremental reduction
    transformer -> ConvBN + 3x3 VALID conv head (the reference's padding=0
    quirk shrinks the map by 2 px). Returns raw sigmoid output in [0, 1]."""

    dec_dim: int
    num_heads: int = 16
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

        dec, attns = IncrementalReductionModule(
            num_heads=self.num_heads, attn_drop_prob=self.attn_drop_prob,
            drop_prob=self.drop_prob, dtype=self.dtype,
            name="reducer")(dec, train=train)

        out = ConvBN(self.dec_dim // 4, 3, bn_momentum=self.bn_momentum,
                     bn_eps=self.bn_eps, dtype=self.dtype,
                     name="out_conv0")(dec, train)
        out = nn.Conv(1, (3, 3), padding="VALID", dtype=self.dtype,
                      param_dtype=jnp.float32, name="out_conv1")(out)
        out = nn.sigmoid(jnp.asarray(out, jnp.float32))
        return out, attns


class ODA2RedRegModel(nn.Module):
    dec_dim: int
    min_depth: float
    max_depth: float
    num_heads: int = 16
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

        out, attns = ReductionTransformerRegDecoder(
            dec_dim=self.dec_dim, num_heads=self.num_heads,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            dtype=self.dtype, name="decoder")(feats, train=train)
        out = out * (self.max_depth - self.min_depth) + self.min_depth
        return out, attns

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            dec_dim=opt["dec_dim"], num_heads=opt.get("num_heads", 16),
            min_depth=min_depth, max_depth=max_depth,
            encoder_type=opt.get("encoder_type", "large"),
            drop_prob=opt.get("drop_prob", 0.0),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            bn_momentum=opt.get("bn_momentum", 0.1),
            bn_eps=opt.get("bn_eps", 1e-5))
        kwargs.update(overrides)
        return cls(**kwargs)
