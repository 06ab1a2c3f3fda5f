"""ODA2 conv baseline (``oda2_conv``).

Behavioral reference: ``model/ODA2/{oda2_conv,oda2_conv_decoder}.py``: Swin
encoder -> PPM at 1/32 -> conv top-down pyramid to a 1/2-scale regression map
-> sigmoid x max_depth (same resize policy as the other ODA2 models).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops.conv import ConvBN
from ...ops.ppm import PyramidPoolingModule
from ...ops.resize import resize_bilinear, upsample2d
from .red_order_swin2 import _resize_policy
from ..swin import swin_base, swin_large, SwinTransformer


class ODA2ConvDecoder(nn.Module):
    channels: int
    output_channel: int = 1
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

        x = PyramidPoolingModule(proj_ch=c // 2, out_ch=c,
                                 bn_momentum=self.bn_momentum,
                                 bn_eps=self.bn_eps, dtype=self.dtype,
                                 name="ppm")(f3, train=train)

        def block(x, out_mid, out_next, name, last=False):
            x = ConvBN(out_mid, 3, name=f"{name}_0", **ck)(x, train)
            x = ConvBN(out_mid, 3, name=f"{name}_1", **ck)(x, train)
            x = upsample2d(x, 2)
            if not last:
                x = ConvBN(out_next, 1, act=None, name=f"{name}_2", **ck)(x, train)
            return x

        x = block(x, oc[3], oc[2], "block32")
        x = block(jnp.concatenate([x, f2], -1), oc[2], oc[1], "block16")
        x = block(jnp.concatenate([x, f1], -1), oc[1], oc[0], "block8")
        x = block(jnp.concatenate([x, f0], -1), oc[0], None, "block4", last=True)

        x = ConvBN(oc[0], 3, name="block2_0", **ck)(x, train)
        x = nn.Conv(self.output_channel, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="block2_out")(x)
        return x


class ODA2ConvModel(nn.Module):
    decoder_channels: int
    min_depth: float
    max_depth: float
    encoder_type: str = "large"
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

        out = ODA2ConvDecoder(channels=self.decoder_channels,
                              bn_momentum=self.bn_momentum,
                              bn_eps=self.bn_eps, dtype=self.dtype,
                              name="decoder")(feats, train=train)
        out = nn.sigmoid(jnp.asarray(out, jnp.float32))
        out = out * (self.max_depth - self.min_depth) + self.min_depth
        return out, None

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            decoder_channels=opt.get("decoder_channels", opt.get("dec_dim", 1024)),
            min_depth=min_depth, max_depth=max_depth,
            encoder_type=opt.get("encoder_type", "large"),
            bn_momentum=opt.get("bn_momentum", 0.1),
            bn_eps=opt.get("bn_eps", 1e-5))
        kwargs.update(overrides)
        return cls(**kwargs)
