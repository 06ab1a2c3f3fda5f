"""AdaBins — EfficientNet-B5 U-Net + mViT adaptive-bin head.

Behavioral reference: ``model/Adabins/{unet_adaptive_bins,miniViT,layers}.py``
("Checkpoint ver." layer naming — parity with the released AdaBins weights).
Pipeline: EfficientNet-B5 features (taps 4,5,6,8,11) -> DecoderBN U-Net with
LeakyReLU/BN double-conv upsample blocks -> 128-ch map at 1/2 ->
mViT (16x16 patch embed + 4-layer post-norm transformer; token 0 regresses
normalized bin widths via ReLU+0.1; tokens 1..128 are query vectors whose
pixel-wise dot products give range-attention maps) -> 1x1 conv + softmax over
n_bins -> prediction = sum(softmax * bin centers); returns (pred, bin_edges).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ..efficientnet import efficientnet_b5
from ...ops.resize import resize_bilinear


class TorchTransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer matching
    ``nn.TransformerEncoderLayer`` defaults (relu FF, post-norm, drop 0.1)."""

    num_heads: int = 4
    ff_dim: int = 1024
    drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, S, E)
        e = x.shape[-1]
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, param_dtype=jnp.float32,
            dropout_rate=self.drop, deterministic=not train, name="self_attn",
        )(x, x)
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x + nn.Dropout(
                             self.drop, deterministic=not train)(attn_out))
        y = nn.Dense(self.ff_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        y = nn.Dense(e, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear2")(y)
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x + nn.Dropout(
                             self.drop, deterministic=not train)(y))
        return x


class PatchTransformerEncoder(nn.Module):
    """16x16 patch conv embed + learned positional encodings + 4 layers
    (reference ``layers.py:5-31``)."""

    embedding_dim: int = 128
    patch_size: int = 16
    num_heads: int = 4
    num_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.patch_size
        emb = nn.Conv(self.embedding_dim, (p, p), strides=(p, p),
                      padding="VALID", dtype=self.dtype,
                      param_dtype=jnp.float32, name="embedding_encoder")(x)
        b, hp, wp, e = emb.shape
        emb = emb.reshape(b, hp * wp, e)

        pos = self.param("positional_encodings",
                         nn.initializers.uniform(scale=1.0),
                         (500, self.embedding_dim))
        emb = emb + pos[None, :emb.shape[1], :].astype(emb.dtype)

        for i in range(self.num_layers):
            emb = TorchTransformerEncoderLayer(
                num_heads=self.num_heads, dtype=self.dtype,
                name=f"layer{i}")(emb, train=train)
        return emb  # (B, S, E)


class mViT(nn.Module):
    """Adaptive-bin head (reference ``miniViT.py:7-48``)."""

    n_query_channels: int = 128
    patch_size: int = 16
    dim_out: int = 256
    embedding_dim: int = 128
    num_heads: int = 4
    norm: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        tgt = PatchTransformerEncoder(
            embedding_dim=self.embedding_dim, patch_size=self.patch_size,
            num_heads=self.num_heads, dtype=self.dtype,
            name="patch_transformer")(x, train=train)  # (B, S, E)

        xe = nn.Conv(self.embedding_dim, (3, 3), padding=1, dtype=self.dtype,
                     param_dtype=jnp.float32, name="embedding_conv")(x)

        regression_head = tgt[:, 0]                       # (B, E)
        queries = tgt[:, 1:self.n_query_channels + 1]     # (B, Q, E)

        # PixelWiseDotProduct: attention maps = <feature(pixel), query>
        range_attention_maps = jnp.einsum("bhwc,bqc->bhwq", xe, queries)

        y = regression_head
        for i, feat in enumerate((256, 256, self.dim_out)):
            y = nn.Dense(feat, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"regressor{i}")(y)
            if i < 2:
                y = nn.leaky_relu(y, 0.01)
        y = jnp.asarray(y, jnp.float32)
        if self.norm == "linear":
            y = nn.relu(y) + 0.1
        elif self.norm == "softmax":
            return nn.softmax(y, axis=1), range_attention_maps
        else:
            y = nn.sigmoid(y)
        y = y / y.sum(axis=1, keepdims=True)
        return y, range_attention_maps


class UpSampleBN(nn.Module):
    """Bilinear-up + skip-concat + double conv-BN-LeakyReLU
    (reference ``unet_adaptive_bins.py:8-24``)."""

    output_features: int
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = resize_bilinear(x, (skip.shape[1], skip.shape[2]),
                            align_corners=True)
        x = jnp.concatenate([x, skip], axis=-1)
        for i in range(2):
            x = nn.Conv(self.output_features, (3, 3), padding=1,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                             momentum=1.0 - self.bn_momentum,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"bn{i}")(x)
            x = nn.leaky_relu(x, 0.01)
        return x


class DecoderBN(nn.Module):
    """U-Net decoder over taps 4,5,6,8,11 (reference ``:27-57``)."""

    num_features: int = 2048
    num_classes: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        b0, b1, b2, b3, b4 = (features[4], features[5], features[6],
                              features[8], features[11])
        f = self.num_features
        # NOTE: the reference's conv2 is a 1x1 conv with padding=1 (sic) —
        # output grows by 2 px, then the first upsample resizes onto the skip
        # so the quirk is benign; we replicate it for checkpoint parity.
        x = jnp.pad(b4, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.Conv(f, (1, 1), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(x)

        x = UpSampleBN(f // 2, dtype=self.dtype, name="up1")(x, b3, train)
        x = UpSampleBN(f // 4, dtype=self.dtype, name="up2")(x, b2, train)
        x = UpSampleBN(f // 8, dtype=self.dtype, name="up3")(x, b1, train)
        x = UpSampleBN(f // 16, dtype=self.dtype, name="up4")(x, b0, train)
        x = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(x)
        return x


class UnetAdaptiveBins(nn.Module):
    """Reference ``UnetAdaptiveBins`` (``unet_adaptive_bins.py:76-139``)."""

    n_bins: int = 100
    min_val: float = 0.1
    max_val: float = 10.0
    norm: str = "linear"
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: dict = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        enc = efficientnet_b5(dtype=self.dtype, name="encoder",
                              **(self.encoder_kwargs or {}))
        features = enc(x, train=train)

        num_feat = features[11].shape[-1]
        unet_out = DecoderBN(num_features=num_feat, num_classes=128,
                             dtype=self.dtype, name="decoder")(features, train)

        bin_widths_normed, range_attention_maps = mViT(
            n_query_channels=128, patch_size=16, dim_out=self.n_bins,
            embedding_dim=128, norm=self.norm, dtype=self.dtype,
            name="adaptive_bins_layer")(unet_out, train=train)

        out = nn.Conv(self.n_bins, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv_out")(
            range_attention_maps)
        out = nn.softmax(jnp.asarray(out, jnp.float32), axis=-1)

        bin_widths = (self.max_val - self.min_val) * bin_widths_normed
        bin_widths = jnp.pad(bin_widths, ((0, 0), (1, 0)),
                             constant_values=self.min_val)
        bin_edges = jnp.cumsum(bin_widths, axis=1)
        centers = 0.5 * (bin_edges[:, :-1] + bin_edges[:, 1:])  # (B, n_bins)

        pred = jnp.sum(out * centers[:, None, None, :], axis=-1, keepdims=True)
        return pred, bin_edges

    @classmethod
    def build(cls, opt, min_depth: float, max_depth: float, **overrides):
        kwargs = dict(n_bins=opt.get("num_bins", 256), min_val=min_depth,
                      max_val=max_depth)
        kwargs.update(overrides)
        return cls(**kwargs)
