"""NewCRFDepth — neural window FC-CRFs depth network.

Behavioral reference: ``model/NewCRFs/NewCRFDepth.py``. Swin backbone
(tiny/base/large by ``version`` string, window size from the last two chars,
drop_path 0.3) -> PSP pyramid-pooling bottleneck at 1/32 -> 4 cascaded NewCRF
stages with PixelShuffle(2) upsampling between -> sigmoid DispHead, x4
bilinear upsample (align_corners=False), x max_depth.

PSP detail parity (``uper_crf_head.py:33-45``): pool scales (1,2,3,6),
conv+norm+ReLU per scale with GroupNorm for scale 1 (batch-size-1 BN
workaround) and BatchNorm otherwise; align_corners=False upsampling; 3x3
bottleneck to 512.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ..swin import SwinTransformer
from .layers import NewCRF
from ...ops.resize import resize_bilinear, adaptive_avg_pool2d
from ...ops.pixel_shuffle import pixel_shuffle

_VERSIONS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                 in_channels=(96, 192, 384, 768)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                 in_channels=(128, 256, 512, 1024)),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
                  in_channels=(192, 384, 768, 1536)),
}


class PSP(nn.Module):
    """Pyramid pooling bottleneck (PSPNet head without the seg classifier)."""

    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    align_corners: bool = False
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        outs = [x]
        for i, scale in enumerate(self.pool_scales):
            y = adaptive_avg_pool2d(x, (scale, scale))
            y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"pool{i}_conv")(y)
            if scale == 1:
                # mmcv norm switch for batch-size-1 pooling (reference ``:35``)
                y = nn.GroupNorm(num_groups=min(256, self.channels),
                                 epsilon=self.bn_eps, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"pool{i}_gn")(y)
            else:
                y = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                                 momentum=1.0 - self.bn_momentum,
                                 epsilon=self.bn_eps, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"pool{i}_bn")(y)
            y = nn.relu(y)
            outs.append(resize_bilinear(y, (h, w), align_corners=self.align_corners))

        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="bottleneck_conv")(y)
        y = nn.BatchNorm(use_running_average=tnn.bn_use_running_average(self, train),
                         momentum=1.0 - self.bn_momentum, epsilon=self.bn_eps,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="bottleneck_bn")(y)
        return nn.relu(y)


def convex_upsample_4x(disp: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """RAFT-style convex-combination 4x upsample of a 1-channel map.

    Port of ``NewCRFDepth.upsample_mask`` (``NewCRFDepth.py:110-121``; dead
    code upstream — ``up_mode='bilinear'`` at ``:81`` — ported for
    completeness). ``disp``: (B, H, W, 1); ``mask``: (B, H, W, 144) raw conv
    logits whose channel c indexes (tap=c//16, sy=(c%16)//4, sx=c%4), matching
    torch's ``view(N, 1, 9, 4, 4, H, W)`` on an NCHW conv output. Each of the
    4x4 subpixels is a softmax-weighted convex combination of the 3x3
    neighborhood (F.unfold tap order: row-major (dy, dx))."""
    b, h, w, _ = disp.shape
    m = mask.reshape(b, h, w, 9, 16)
    m = nn.softmax(jnp.asarray(m, jnp.float32), axis=3).reshape(b, h, w, 9, 4, 4)

    dpad = jnp.pad(jnp.asarray(disp, jnp.float32),
                   ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack([dpad[:, dy:dy + h, dx:dx + w, 0]
                      for dy in range(3) for dx in range(3)], axis=-1)
    up = (m * taps[..., :, None, None]).sum(axis=3)       # (b, h, w, 4, 4)
    up = up.transpose(0, 1, 3, 2, 4).reshape(b, 4 * h, 4 * w, 1)
    return up


class NewCRFDepth(nn.Module):
    """Reference ``NewCRFDepth`` (``NewCRFDepth.py:11-148``)."""

    version: str = "large07"
    min_depth: float = 0.001
    max_depth: float = 10.0
    frozen_stages: int = -1
    up_mode: str = "bilinear"  # 'bilinear' (reference :81) | 'mask' (:110-121)
    dtype: jnp.dtype = jnp.float32
    use_checkpoint: bool = False
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        window_size = int(self.version[-2:])
        if self.version[:-2] == "custom":
            cfg = dict(self.encoder_kwargs or {})
            in_channels = tuple(cfg.pop("in_channels"))
            crf_dims = tuple(cfg.pop("crf_dims"))
            backbone_args = cfg
        else:
            v = _VERSIONS[self.version[:-2]]
            in_channels = v["in_channels"]
            # fixed decoder widths for every version (reference ``:71``)
            crf_dims = (128, 256, 512, 1024)
            backbone_args = dict(embed_dim=v["embed_dim"], depths=v["depths"],
                                 num_heads=v["num_heads"])

        feats = SwinTransformer(
            window_size=window_size, path_drop_prob=0.3, patch_norm=True,
            frozen_stages=self.frozen_stages, use_checkpoint=self.use_checkpoint,
            # the NewCRFs Swin variant zero-pads to window/patch multiples
            # (torch F.pad default, ``model/NewCRFs/swin_transformer.py:209``),
            # unlike the ODA/ODA2 variants' replicate padding — matters at
            # non-window-multiple shapes (executed-parity-tested r4)
            padding_mode="zeros",
            dtype=self.dtype, name="backbone", **backbone_args,
        )(x, train=train)

        # PSP channels = half the coarsest crf dim so that after the crf3
        # pixel-shuffle the value-channel chain lines up (reference: 512)
        psp_channels = crf_dims[3] // 2
        ppm_out = PSP(channels=psp_channels, dtype=self.dtype,
                      name="decoder")(feats[3], train=train)

        num_heads = [4, 8, 16, 32]

        e3 = NewCRF(embed_dim=crf_dims[3], num_heads=num_heads[3],
                    window_size=7, dtype=self.dtype, name="crf3")(
            feats[3], ppm_out, train=train)
        e3 = pixel_shuffle(e3, 2)
        e2 = NewCRF(embed_dim=crf_dims[2], num_heads=num_heads[2],
                    window_size=7, dtype=self.dtype, name="crf2")(
            feats[2], e3, train=train)
        e2 = pixel_shuffle(e2, 2)
        e1 = NewCRF(embed_dim=crf_dims[1], num_heads=num_heads[1],
                    window_size=7, dtype=self.dtype, name="crf1")(
            feats[1], e2, train=train)
        e1 = pixel_shuffle(e1, 2)
        e0 = NewCRF(embed_dim=crf_dims[0], num_heads=num_heads[0],
                    window_size=7, dtype=self.dtype, name="crf0")(
            feats[0], e1, train=train)

        # DispHead: 3x3 conv -> sigmoid -> x4 bilinear (align_corners=False)
        d = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="disp_head1_conv")(e0)
        d = nn.sigmoid(jnp.asarray(d, jnp.float32))
        if self.up_mode == "mask":
            # convex-combination upsample (``NewCRFDepth.py:83-87,110-121``)
            m = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name="mask_head_conv0")(e0)
            m = nn.relu(m)
            m = nn.Conv(16 * 9, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="mask_head_conv1")(m)
            d = convex_upsample_4x(d, m)
        else:
            d = resize_bilinear(d, (d.shape[1] * 4, d.shape[2] * 4),
                                align_corners=False)
        return d * self.max_depth

    @classmethod
    def build(cls, opt, min_depth: float, max_depth: float, **overrides):
        kwargs = dict(
            version=opt.get("version", "large07"),
            min_depth=min_depth, max_depth=max_depth,
            frozen_stages=opt.get("frozen_stages", -1),
            up_mode=opt.get("up_mode", "bilinear"),
        )
        kwargs.update(overrides)
        return cls(**kwargs)
