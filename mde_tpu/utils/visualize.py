"""Depth visualization (reference ``utils/visualize_utils.py``).

``colorize``: depth map -> uint8 RGBA colormap image (matplotlib magma_r /
jet; out-of-range values render white). ``save_visualizations``: batch dump of
colorized predictions mirroring the dataset tree.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def colorize(depth: np.ndarray, vmin: Optional[float] = None,
             vmax: Optional[float] = None, cmap: str = "magma_r") -> np.ndarray:
    """(H, W[, 1]) depth -> (H, W, 4) uint8 (reference ``:10-29``)."""
    import matplotlib

    value = np.asarray(depth, np.float32)
    if value.ndim == 3:
        value = value[..., 0]
    vmin = np.nanmin(value) if vmin is None else vmin
    vmax = np.nanmax(value) if vmax is None else vmax
    invalid = (value < vmin) | (value > vmax) | ~np.isfinite(value)

    if vmax != vmin:
        norm = (value - vmin) / (vmax - vmin)
    else:
        norm = value * 0.0
    cmapper = matplotlib.colormaps[cmap]
    img = cmapper(np.clip(norm, 0, 1), bytes=True)  # (H, W, 4) uint8
    img[invalid] = 255  # over/under-range -> white (reference behavior)
    return img


def save_visualizations(preds: np.ndarray, paths, out_dir: str,
                        vmin: float = 0.0, vmax: Optional[float] = None,
                        cmap: str = "magma_r") -> None:
    """Save colorized predictions under ``out_dir`` mirroring the relative
    dataset paths (reference ``visualization``, ``:32-51``)."""
    from PIL import Image

    for pred, rel in zip(preds, paths):
        img = colorize(pred, vmin=vmin, vmax=vmax, cmap=cmap)
        dst = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        Image.fromarray(img).save(dst if dst.endswith(".png") else dst + ".png")
