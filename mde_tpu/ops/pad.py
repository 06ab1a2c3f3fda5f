"""Spatial padding helpers (NHWC)."""

from __future__ import annotations

import jax.numpy as jnp


def pad2d(x: jnp.ndarray, pad_t: int, pad_b: int, pad_l: int, pad_r: int,
          mode: str = "edge") -> jnp.ndarray:
    """Pad the H/W dims of an NHWC tensor.

    ``mode='edge'`` reproduces torch's ``padding_mode='replicate'`` — the
    reference's conv/window padding mode throughout
    (``model/ODA2/oda2_layer_utils.py:9``, ``oda2_swin_transformer.py:12``).
    ``mode='zeros'`` (alias of numpy's ``constant``) reproduces torch's
    ``F.pad`` default — the NewCRFs Swin variant
    (``model/NewCRFs/swin_transformer.py:209,277,425-427``).
    """
    if pad_t == pad_b == pad_l == pad_r == 0:
        return x
    return jnp.pad(
        x,
        ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)),
        mode="constant" if mode == "zeros" else mode,
    )


def pad_to_multiple(x: jnp.ndarray, multiple: int, mode: str = "edge") -> jnp.ndarray:
    """Pad H and W (bottom/right) up to the next multiple of ``multiple``."""
    h, w = x.shape[1], x.shape[2]
    pad_b = (-h) % multiple
    pad_r = (-w) % multiple
    return pad2d(x, 0, pad_b, 0, pad_r, mode=mode)
