"""ODA Swin-L/384/w12 encoder with 384-multiple resize.

Behavioral reference: ``model/ODA/encoder.py`` + ``oda_swin_transformer.py``:
timm-style Swin-L patch4/window12/384-in22k; input is bilinearly resized
(align_corners=True) to the nearest multiple of 384 per side (352,1216 ->
384,1152; 352,704 -> 384,768); returns the four *pre-downsample* stage
outputs WITHOUT per-stage norms (the timm model's final norm/head are
deleted, ``encoder.py:70-73``).

TPU-native: the reference rebuilds attention masks on resolution change
(``reset_resolution``); here masks are derived from iota under jit per static
shape, so arbitrary static shapes just work.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..swin import SwinTransformer
from ...ops.resize import resize_bilinear


def oda_resize_policy(h: int, w: int) -> Tuple[int, int]:
    """Round each side to the nearest positive multiple of 384
    (reference ``encoder.py:79-84``)."""
    return (max(384, round(h / 384) * 384), max(384, round(w / 384) * 384))


class ODASwinEncoder(nn.Module):
    window_size: int = 12
    drop_prob: float = 0.1
    attn_drop_prob: float = 0.0
    path_drop_prob: float = 0.1
    resize_to_multiple: bool = True
    dtype: jnp.dtype = jnp.float32
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.resize_to_multiple:
            h, w = x.shape[1], x.shape[2]
            x = resize_bilinear(x, oda_resize_policy(h, w), align_corners=True)

        kwargs = dict(embed_dim=192, depths=(2, 2, 18, 2),
                      num_heads=(6, 12, 24, 48))
        kwargs.update(self.encoder_kwargs or {})
        feats = SwinTransformer(
            window_size=self.window_size, drop_prob=self.drop_prob,
            attn_drop_prob=self.attn_drop_prob,
            path_drop_prob=self.path_drop_prob,
            # timm min-window rule (``oda_swin_transformer.py:56-60``): when
            # the window covers the smaller token dim, SW-MSA collapses to
            # W-MSA — fires at stage 4 of the production config (12x36
            # tokens, window 12). Executed-parity-tested r4.
            shift_collapse=True,
            out_norms=False, dtype=self.dtype, name="backbone", **kwargs,
        )(x, train=train)
        return feats
