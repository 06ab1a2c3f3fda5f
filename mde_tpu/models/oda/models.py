"""ODA model wrappers: conv / luna (reg & cls) / bins.

Behavioral reference: ``model/ODA/{oda_conv,oda_luna,oda_luna_cls,
oda_adabins}.py``. Shared Swin-L/384/w12 encoder; decoder variants; regression
heads apply sigmoid then rescale to (min,max); the cls variant mixes a
softmax bin classification with aux-token-regressed bin widths
(ELU(alpha=0.1)-normalized); the bins variant reuses the AdaBins mViT head.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from .encoder import ODASwinEncoder
from .decoders import ODAConvDecoder, ODALunaDecoder
from ..adabins.model import mViT
from ...ops.init import trunc_normal_init


class _ODABase(nn.Module):
    decoder_channels: int = 1024
    min_depth: float = 0.001
    max_depth: float = 80.0
    drop_prob: float = 0.1
    attn_drop_prob: float = 0.0
    use_gn: bool = False
    num_groups: int = 1
    resize_to_multiple: bool = True
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: Optional[dict] = None

    def _encoder(self):
        return ODASwinEncoder(
            resize_to_multiple=self.resize_to_multiple, dtype=self.dtype,
            encoder_kwargs=self.encoder_kwargs, name="encoder")

    def _rescale(self, out):
        out = nn.sigmoid(jnp.asarray(out, jnp.float32))
        return out * (self.max_depth - self.min_depth) + self.min_depth


class ODAConvModel(_ODABase):
    """Reference ``ODAConvModel`` (``oda_conv.py:9-53``)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = self._encoder()(x, train=train)
        out = ODAConvDecoder(
            channels=self.decoder_channels, use_gn=self.use_gn,
            num_groups=self.num_groups, dtype=self.dtype,
            name="decoder")(feats, train=train)
        return self._rescale(out), None

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(decoder_channels=opt["decoder_channels"],
                      min_depth=min_depth, max_depth=max_depth)
        kwargs.update(overrides)
        return cls(**kwargs)


class ODALunaModel(_ODABase):
    """Reference ``ODALunaModel`` (``oda_luna.py:10-94``)."""

    num_aux: int = 256
    aux_dim: int = 256
    num_heads: int = 8
    use_rp: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = self._encoder()(x, train=train)
        out, aux, attns = ODALunaDecoder(
            channels=self.decoder_channels, num_aux=self.num_aux,
            aux_dim=self.aux_dim, num_heads=self.num_heads,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            output_channel=1, use_gn=self.use_gn, num_groups=self.num_groups,
            use_rp=self.use_rp, dtype=self.dtype, name="decoder")(feats, train=train)
        return self._rescale(out), aux, attns

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            decoder_channels=opt["decoder_channels"],
            min_depth=min_depth, max_depth=max_depth,
            num_aux=opt["num_aux"], aux_dim=opt["aux_dim"],
            num_heads=opt["num_heads"],
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            drop_prob=opt.get("drop_prob", 0.1),
            use_gn=opt.get("use_gn", False),
            num_groups=opt.get("num_groups", 1),
            use_rp=opt.get("use_rp", False))
        kwargs.update(overrides)
        return cls(**kwargs)


class ODALunaClsModel(_ODABase):
    """Reference ``ODALunaClsModel`` (``oda_luna_cls.py:11-117``): decoder
    emits num_bins logits; aux-mean -> 3-layer bin-width regressor with
    ELU(0.1) normalization; expected-value decode over softmax."""

    num_bins: int = 256
    num_aux: int = 256
    aux_dim: int = 256
    num_heads: int = 8
    use_rp: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = self._encoder()(x, train=train)
        out, aux, attns = ODALunaDecoder(
            channels=self.decoder_channels, num_aux=self.num_aux,
            aux_dim=self.aux_dim, num_heads=self.num_heads,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            output_channel=self.num_bins, use_gn=self.use_gn,
            num_groups=self.num_groups, use_rp=self.use_rp, dtype=self.dtype,
            name="decoder")(feats, train=train)

        bin_cls = nn.softmax(jnp.asarray(out, jnp.float32), axis=-1)

        cls_tok = jnp.asarray(aux, jnp.float32).mean(axis=1)  # (b, aux_dim)
        y = cls_tok
        for i, feat in enumerate((self.aux_dim, self.aux_dim, self.num_bins)):
            y = nn.Dense(feat, param_dtype=jnp.float32,
                         kernel_init=trunc_normal_init(0.02),
                         name=f"bin_regressor{i}")(y)
            if i < 2:
                y = tnn.gelu(y)
        # torch F.elu(x, alpha=0.1): x>0 -> x ; else alpha*(exp(x)-1)
        widths = jnp.where(y > 0, y, 0.1 * (jnp.exp(jnp.minimum(y, 0.0)) - 1.0))
        widths = widths / widths.sum(axis=-1, keepdims=True)
        widths = (self.max_depth - self.min_depth) * widths
        widths = jnp.pad(widths, ((0, 0), (1, 0)), constant_values=self.min_depth)
        edges = jnp.cumsum(widths, axis=-1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])  # (b, n_bins)

        pred = jnp.sum(bin_cls * centers[:, None, None, :], axis=-1,
                       keepdims=True)
        return pred, aux, centers, attns

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            decoder_channels=opt["decoder_channels"],
            min_depth=min_depth, max_depth=max_depth,
            num_bins=opt["num_bins"], num_aux=opt["num_aux"],
            aux_dim=opt["aux_dim"], num_heads=opt["num_heads"],
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            drop_prob=opt.get("drop_prob", 0.1),
            use_gn=opt.get("use_gn", False),
            num_groups=opt.get("num_groups", 1),
            use_rp=opt.get("use_rp", False))
        kwargs.update(overrides)
        return cls(**kwargs)


class ODABinsModel(_ODABase):
    """Reference ``ODABinsModel`` (``oda_adabins.py:10-83``): conv decoder to
    channels//8 map + AdaBins mViT adaptive-bin head."""

    num_bins: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = self._encoder()(x, train=train)
        unet_out = ODAConvDecoder(
            channels=self.decoder_channels,
            output_channel=self.decoder_channels // 8,
            use_gn=self.use_gn, num_groups=self.num_groups, dtype=self.dtype,
            name="decoder")(feats, train=train)

        # embedding_dim follows the decoder width (oda_adabins.py:26-33),
        # unlike AdaBins' fixed 128
        widths_normed, range_maps = mViT(
            n_query_channels=128, patch_size=16, dim_out=self.num_bins,
            embedding_dim=self.decoder_channels // 8, num_heads=4,
            dtype=self.dtype,
            name="adaptive_bins_layer")(unet_out, train=train)

        out = nn.Conv(self.num_bins, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv_out")(range_maps)
        out = nn.softmax(jnp.asarray(out, jnp.float32), axis=-1)

        widths = (self.max_depth - self.min_depth) * widths_normed
        widths = jnp.pad(widths, ((0, 0), (1, 0)), constant_values=self.min_depth)
        edges = jnp.cumsum(widths, axis=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
        pred = jnp.sum(out * centers[:, None, None, :], axis=-1, keepdims=True)
        return pred, edges

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            decoder_channels=opt["decoder_channels"],
            min_depth=min_depth, max_depth=max_depth,
            num_bins=opt["num_bins"])
        kwargs.update(overrides)
        return cls(**kwargs)
