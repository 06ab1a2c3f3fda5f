"""ODA decoders: conv baseline, Luna (bilinear / reorder-pixel-shuffle).

Behavioral reference: ``model/ODA/{decoder_conv,decoder_luna,
decoder_luna_rp}.py``. Top-down pyramid over the 4 Swin-L stages:
per scale [concat skip ->] ConvBN(3x3) [-> PreNorm Luna layer with a shared
learned aux token bank] -> x2 upsample (bilinear align_corners=True, or
PixelShuffle in the RP variant) -> 1x1 ConvBN; final 3x3 ConvBN + 1x1 conv
head at 1/2 scale. Channel schedule: (max(c/8, aux_dim), c/4, c/2, c); Luna
head counts (max(num_aux/8,1), nh/4, nh/2, nh) — both formulas kept verbatim
(``decoder_luna.py:33-38``, quirks included).
"""

from __future__ import annotations

import math
import jax.numpy as jnp
import flax.linen as nn

from ...ops.conv import ConvBN
from ...ops.resize import upsample2d
from ...ops.pixel_shuffle import pixel_shuffle
from ...ops.luna import LunaLayer
from ...ops.ppm import PyramidPoolingModuleV1


def _aux_init(aux_dim: int):
    def init(key, shape, dtype=jnp.float32):
        import jax
        return (jax.random.normal(key, shape, jnp.float32)
                * math.sqrt(1.0 / aux_dim)).astype(dtype)
    return init


class ODAConvDecoder(nn.Module):
    """Plain conv top-down decoder (reference ``decoder_conv.py:8-96``)."""

    channels: int
    output_channel: int = 1
    use_gn: bool = False
    num_groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        f0, f1, f2, f3 = features  # NHWC, strides 4/8/16/32
        c = self.channels
        oc = [c // 8, c // 4, c // 2, c]
        ck = dict(use_gn=self.use_gn, gn_groups=self.num_groups,
                  dtype=self.dtype)

        def block(x, out_mid, out_next, name, last=False):
            x = ConvBN(out_mid, 3, name=f"{name}_0", **ck)(x, train)
            x = ConvBN(out_mid, 3, name=f"{name}_1", **ck)(x, train)
            x = upsample2d(x, 2)
            if not last:
                x = ConvBN(out_next, 1, act=None, name=f"{name}_2", **ck)(x, train)
            return x

        x = block(f3, oc[3], oc[2], "block32")
        x = block(jnp.concatenate([x, f2], -1), oc[2], oc[1], "block16")
        x = block(jnp.concatenate([x, f1], -1), oc[1], oc[0], "block8")
        x = block(jnp.concatenate([x, f0], -1), oc[0], None, "block4", last=True)

        x = ConvBN(oc[0], 3, name="block2_0", **ck)(x, train)
        x = nn.Conv(self.output_channel, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="block2_out")(x)
        return x


class ODALunaDecoder(nn.Module):
    """Luna decoder (reference ``decoder_luna.py:11-135``; ``use_rp`` selects
    the PixelShuffle upsampling variant of ``decoder_luna_rp.py``)."""

    channels: int
    num_aux: int
    aux_dim: int
    num_heads: int
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.1
    output_channel: int = 1
    use_gn: bool = False
    num_groups: int = 1
    use_rp: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        f0, f1, f2, f3 = features
        c = self.channels
        oc = [max(c // 8, self.aux_dim), c // 4, c // 2, c]
        heads = [max(self.num_aux // 8, 1), self.num_heads // 4,
                 self.num_heads // 2, self.num_heads]
        ck = dict(use_gn=self.use_gn, gn_groups=self.num_groups,
                  dtype=self.dtype)

        aux = self.param("aux", _aux_init(self.aux_dim),
                         (1, self.num_aux, self.aux_dim))
        aux = jnp.broadcast_to(aux, (f0.shape[0],) + aux.shape[1:]).astype(self.dtype)

        if self.use_rp:
            # RP variant bottlenecks the 1/32 features through a gen-1 PPM
            # (decoder_luna_rp.py:44,112)
            f3 = PyramidPoolingModuleV1(out_ch=f3.shape[-1], dtype=self.dtype,
                                        name="ppm")(f3, train=train)

        attns = ()

        def stage(x, level, out_mid, out_next, nh, aux):
            x = ConvBN(out_mid, 3, name=f"block{level}_pre", **ck)(x, train)
            x, aux, a1, a2 = LunaLayer(
                qk_proj_dim=min(out_mid, self.aux_dim), num_heads=nh,
                pre_norm=True, attn_drop_prob=self.attn_drop_prob,
                drop_prob=self.drop_prob, dtype=self.dtype,
                name=f"block{level}_luna")(x, aux, train=train)
            if self.use_rp:
                x = pixel_shuffle(x, 2)
            else:
                x = upsample2d(x, 2)
            if out_next is not None:
                x = ConvBN(out_next, 1, act=None,
                           name=f"block{level}_post", **ck)(x, train)
            return x, aux, (a1, a2)

        x, aux, a32 = stage(f3, 32, oc[3], oc[2], heads[3], aux)
        x, aux, a16 = stage(jnp.concatenate([x, f2], -1), 16, oc[2], oc[1],
                            heads[2], aux)
        x, aux, a8 = stage(jnp.concatenate([x, f1], -1), 8, oc[1], oc[0],
                           heads[1], aux)
        x, aux, a4 = stage(jnp.concatenate([x, f0], -1), 4, oc[0], None,
                           heads[0], aux)

        # block2 outputs `final_channels = oc[0]` in both variants
        # (decoder_luna.py:86-90, decoder_luna_rp.py:86-90)
        x = ConvBN(oc[0], 3, name="block2_0", **ck)(x, train)
        x = nn.Conv(self.output_channel, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="block2_out")(x)

        attns = a4 + a8 + a16 + a32
        return x, aux, attns
