"""Depthformer v1 — EfficientNet-B5 + multi-scale patchify-ViT decoder.

Behavioral reference: ``model/Depthformer/{depthformer,decoder}.py``. Encoder:
EfficientNet-B5 *without* conv_head (deleted, ``depthformer.py:80-85``), taps
4,5,6,8,10 -> channels (24,40,64,176,512) at strides 2/4/8/16/32. Decoder:
top-down FPN-ish; each scale gets a ConvBNBlock (kernel 9/7/5/3/1), is
patchified to the 1/32 token grid, gets a shared learned position embedding,
runs a pre-norm ViT layer, is upsampled (align_corners=True) and concatenated
into the next finer scale. Final sigmoid head at 1/2 resolution; output
rescaled to (min,max) depth.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ..efficientnet import efficientnet_b5
from .layers import ConvBN, ConvBNBlock, ViTLayer, upscale_concat_act


class DepthFormerDecoder(nn.Module):
    """Reference ``DepthFormerDecoder`` (``decoder.py:9-153``)."""

    hidden_dim: int
    num_heads: int
    img_size: Tuple[int, int]
    num_repeat: int = 1
    feedforward_dim: Optional[int] = None
    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x0, x1, x2, x3, x4 = features  # strides 2,4,8,16,32
        d = self.hidden_dim
        n_tokens = (self.img_size[0] // 32) * (self.img_size[1] // 32)
        pos = self.param("position_embedding",
                         nn.initializers.xavier_normal(), (n_tokens, d))

        def post_conv(i, x):
            # kernel 9/7/5/3/1 for scales 0..4 (reference ``:45-53``)
            return ConvBNBlock(d, kernel_size=2 * (5 - i) - 1, num_layers=2,
                               dtype=self.dtype,
                               name=f"post_conv{i}")(x, train)

        def run_vit(i, x, patch: int):
            # patchify to the 1/32 grid, add shared pos emb, ViT layer, BN
            if patch > 1:
                x = nn.Conv(d, (patch, patch), strides=(patch, patch),
                            padding="VALID", dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"patchify{i}")(x)
            else:
                x = nn.Conv(d, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"patchify{i}")(x)
            b, h, w, _ = x.shape
            t = x.reshape(b, h * w, d) + pos[None].astype(x.dtype)
            t, attn = ViTLayer(num_heads=self.num_heads,
                               num_repeat=self.num_repeat,
                               feedforward_dim=self.feedforward_dim,
                               attn_drop_prob=self.attn_drop_prob,
                               drop_prob=self.drop_prob, dtype=self.dtype,
                               name=f"vit{i}")(t, train=train)
            t = t.reshape(b, h, w, d)
            t = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train), momentum=0.9,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"vit_bn{i}")(t)
            return t, attn

        c4 = post_conv(4, x4)
        feat4, attn4 = run_vit(3, c4, 1)

        c3 = upscale_concat_act(x3, feat4, 2)
        c3 = post_conv(3, c3)
        feat3, attn3 = run_vit(2, c3, 2)

        c2 = upscale_concat_act(x2, feat3, 4)
        c2 = post_conv(2, c2)
        feat2, attn2 = run_vit(1, c2, 4)

        c1 = upscale_concat_act(x1, feat2, 8)
        c1 = post_conv(1, c1)
        feat1, attn1 = run_vit(0, c1, 8)

        c0 = upscale_concat_act(x0, feat1, 16)
        c0 = post_conv(0, c0)

        y = ConvBN(d // 2, 3, act=tnn.gelu, use_residual=True,
                   dtype=self.dtype, name="final0")(c0, train)
        y = ConvBN(d // 4, 3, act=tnn.gelu, use_residual=True,
                   dtype=self.dtype, name="final1")(y, train)
        y = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="final_out")(y)
        out = nn.sigmoid(jnp.asarray(y, jnp.float32))
        return out, (attn1, attn2, attn3, attn4)


class Depthformer(nn.Module):
    """Reference ``Depthformer`` (``depthformer.py:25-89``)."""

    hidden_dim: int
    num_heads: int
    img_size: Tuple[int, int]
    min_depth: float = 0.001
    max_depth: float = 80.0
    num_repeat: int = 1
    attn_drop_prob: float = 0.1
    drop_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if x.shape[1:3] != tuple(self.img_size):
            raise ValueError(
                f"Depthformer requires input size {self.img_size}, got {x.shape[1:3]}")

        enc_kwargs = dict(self.encoder_kwargs or {})
        enc_kwargs.setdefault("with_head", False)  # conv_head deleted upstream
        feats = efficientnet_b5(dtype=self.dtype, name="encoder",
                                **enc_kwargs)(x, train=train)

        decoder_input = (feats[4], feats[5], feats[6], feats[8], feats[10])
        out, attn = DepthFormerDecoder(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            img_size=tuple(self.img_size), num_repeat=self.num_repeat,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="decoder")(decoder_input, train=train)

        depth = (self.max_depth - self.min_depth) * out + self.min_depth
        return depth, attn

    @classmethod
    def build(cls, opt, min_depth: float, max_depth: float, **overrides):
        kwargs = dict(
            hidden_dim=opt["hidden_dim"],
            num_heads=opt["num_heads"],
            img_size=tuple(opt["img_size"]),
            min_depth=min_depth, max_depth=max_depth,
            num_repeat=opt.get("num_repeat", 1),
            attn_drop_prob=opt.get("attn_drop_prob", 0.1),
            drop_prob=opt.get("drop_prob", 0.1),
        )
        kwargs.update(overrides)
        return cls(**kwargs)
