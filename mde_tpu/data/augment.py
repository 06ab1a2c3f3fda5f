"""Device-fused training augmentation — one jitted kernel per batch.

The reference runs rotate / crop / flip / photometric / normalize / masking
per-image in CPU dataloader workers (``dataset/depth_dataset.py:209-284,
314-386`` — its hot loop, SURVEY.md §3.1). Here the host only decodes and
KB-crops; everything else is a single vmapped, jitted computation that XLA
fuses into a handful of TPU kernels, overlapping with the train step.

Semantics match the reference per-op:
* rotation: uniform angle in [-degree, +degree] about the image center,
  bilinear for image / nearest for depth, zero fill (PIL ``rotate`` behavior);
* random crop to (h, w); 50% LR flip;
* gamma U(0.9,1.1); brightness U(0.75,1.25) NYU / U(0.9,1.1) KITTI;
  per-channel color U(0.9,1.1); clip [0,1];
* ``clip_depth`` zeroing; ImageNet mean/std normalization;
* band masking (``RandomMasking``) incl. the inverse ``drop_edge`` mode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    out_height: int
    out_width: int
    degree: float = 0.0            # 0 disables rotation
    data_type: str = "KITTI"
    clip_depth: float = 1e9
    height_drop: Tuple[float, int] = (0.0, 0)
    width_drop: Tuple[float, int] = (0.0, 0)
    drop_edge: bool = False


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization, NHWC in [0,1]."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD


def _rotate_sample(image, depth, angle_deg):
    """Rotate about center: bilinear (image) / nearest (depth), zero fill."""
    h, w = image.shape[0], image.shape[1]
    theta = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    # inverse map (output -> source) for a CCW rotation
    sy = cy + (cos * yy + sin * xx)
    sx = cx + (-sin * yy + cos * xx)

    def sample_bilinear(img, sy, sx):
        y0 = jnp.floor(sy); x0 = jnp.floor(sx)
        wy = sy - y0; wx = sx - x0
        out = 0.0
        for dy, wgt_y in ((0, 1 - wy), (1, wy)):
            for dx, wgt_x in ((0, 1 - wx), (1, wx)):
                yi = (y0 + dy).astype(jnp.int32)
                xi = (x0 + dx).astype(jnp.int32)
                valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                yi = jnp.clip(yi, 0, h - 1)
                xi = jnp.clip(xi, 0, w - 1)
                val = img[yi, xi]
                out = out + (wgt_y * wgt_x * valid)[..., None] * val
        return out

    def sample_nearest(img, sy, sx):
        yi = jnp.round(sy).astype(jnp.int32)
        xi = jnp.round(sx).astype(jnp.int32)
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        return img[yi, xi] * valid[..., None]

    return sample_bilinear(image, sy, sx), sample_nearest(depth, sy, sx)


def _rand_int(key, maxval_inclusive):
    """random.randint(0, m) with a possibly-traced inclusive bound."""
    u = jax.random.uniform(key)
    return jnp.floor(u * (maxval_inclusive + 1)).astype(jnp.int32)


def _band_mask(key, size: int, frac: float, count: int, axis_len_other: int,
               invert: bool):
    """1-D keep-mask of ``size`` after dropping ``count`` bands of extent up
    to ``frac`` (or keeping one band of extent up to 1-frac if ``invert``)."""
    iota = jnp.arange(size)
    if not invert:
        mask = jnp.ones((size,), jnp.float32)
        for i in range(count):
            k1, k2, key = jax.random.split(key, 3)
            max_len = int((size - 1) * frac)
            ln = _rand_int(k1, max_len)
            st = _rand_int(k2, size - ln)
            mask = mask * (~((iota >= st) & (iota < st + ln))).astype(jnp.float32)
        return mask
    # drop_edge: keep exactly one band
    k1, k2, key = jax.random.split(key, 3)
    max_len = int((size - 1) * (1.0 - frac))
    ln = _rand_int(k1, max_len)
    st = _rand_int(k2, size - ln)
    return ((iota >= st) & (iota < st + ln)).astype(jnp.float32)


def _augment_sample(cfg: AugmentConfig, key, image, depth):
    h_in, w_in = image.shape[0], image.shape[1]
    h, w = cfg.out_height, cfg.out_width
    keys = jax.random.split(key, 12)

    if cfg.degree > 0:
        angle = jax.random.uniform(keys[0], minval=-cfg.degree, maxval=cfg.degree)
        image, depth = _rotate_sample(image, depth, angle)

    # random crop
    if (h_in, w_in) != (h, w):
        y = _rand_int(keys[1], h_in - h)
        x = _rand_int(keys[2], w_in - w)
        image = jax.lax.dynamic_slice(image, (y, x, 0), (h, w, 3))
        depth = jax.lax.dynamic_slice(depth, (y, x, 0), (h, w, 1))

    # LR flip
    flip = jax.random.bernoulli(keys[3])
    image = jnp.where(flip, image[:, ::-1, :], image)
    depth = jnp.where(flip, depth[:, ::-1, :], depth)

    # photometric
    gamma = jax.random.uniform(keys[4], minval=0.9, maxval=1.1)
    image = jnp.clip(image, 0.0, 1.0) ** gamma
    if cfg.data_type.upper() == "NYU":
        bright = jax.random.uniform(keys[5], minval=0.75, maxval=1.25)
    else:
        bright = jax.random.uniform(keys[5], minval=0.9, maxval=1.1)
    color = jax.random.uniform(keys[6], (3,), minval=0.9, maxval=1.1)
    image = jnp.clip(image * bright * color, 0.0, 1.0)

    # depth clipping (hide_depth)
    depth = jnp.where(depth > cfg.clip_depth, 0.0, depth)

    # normalize
    image = normalize_images(image)

    # band masking
    hr, hc = cfg.height_drop[0], int(cfg.height_drop[1])
    wr, wc = cfg.width_drop[0], int(cfg.width_drop[1])
    if cfg.drop_edge:
        hc, wc = min(hc, 1), min(wc, 1)
    if hc > 0 or wc > 0:
        mh = _band_mask(keys[7], h, hr, hc, w, cfg.drop_edge) if hc > 0 else \
            (jnp.zeros(h) if cfg.drop_edge else jnp.ones(h))
        mw = _band_mask(keys[8], w, wr, wc, w, cfg.drop_edge) if wc > 0 else \
            (jnp.zeros(w) if cfg.drop_edge else jnp.ones(w))
        if cfg.drop_edge:
            # union of kept bands (reference fills 0 then sets kept rows/cols)
            mask = jnp.maximum(mh[:, None], mw[None, :])
        else:
            mask = mh[:, None] * mw[None, :]
        image = image * mask[..., None]
        depth = depth * mask[..., None]

    return image, depth


@functools.partial(jax.jit, static_argnums=(0,))
def device_augment_batch(cfg: AugmentConfig, key, images, depths):
    """images: (B, H, W, 3) float32 in [0,1]; depths: (B, H, W, 1) meters.
    Returns augmented, normalized (B, h, w, 3) and (B, h, w, 1)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(functools.partial(_augment_sample, cfg))(keys, images, depths)


@jax.jit
def normalize_eval_batch(images: jnp.ndarray) -> jnp.ndarray:
    """Eval path: normalization only."""
    return normalize_images(jnp.clip(images, 0.0, 1.0))
