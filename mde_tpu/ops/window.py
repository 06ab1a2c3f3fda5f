"""Shifted-window utilities (static shapes, batch-preserving).

The reference's ``SwinWindowing`` (``model/ODA2/oda2_swin_transformer.py:41-92``)
folds windows into the batch dim with view/permute; we do the same with
reshapes/transposes which XLA fuses into surrounding ops for free. The SW-MSA
attention mask is built from iota under jit (static shapes, no dynamic
control flow); XLA constant-folds or fuses it, and no large literal is
embedded in the program (reference computes it per forward on device:
``oda2_swin_transformer.py:409-432``).
"""

from __future__ import annotations

import jax.numpy as jnp


def num_windows(h: int, w: int, window_size: int) -> int:
    assert h % window_size == 0 and w % window_size == 0
    return (h // window_size) * (w // window_size)


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, window_size*window_size, C)."""
    b, h, w, c = x.shape
    r = window_size
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, nH, nW, r, r, c)
    return x.reshape(b * (h // r) * (w // r), r * r, c)


def window_reverse(windows: jnp.ndarray, window_size: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition` -> (B, H, W, C)."""
    r = window_size
    nh, nw = h // r, w // r
    c = windows.shape[-1]
    b = windows.shape[0] // (nh * nw)
    x = windows.reshape(b, nh, nw, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, nH, r, nW, r, c)
    return x.reshape(b, h, w, c)


def shifted_window_attn_mask(h: int, w: int, window_size: int,
                             shift_size: int) -> jnp.ndarray:
    """Additive (0 / -100) SW-MSA mask of shape (num_windows, r*r, r*r).

    Reproduces the reference's region-labelling construction
    (``oda2_swin_transformer.py:409-432``): tokens that wrapped around under
    the cyclic shift must not attend across region boundaries.

    Built on-device from iota (labels 0/1/2 per axis: before the last window,
    the rolled-in remainder, the shifted tail) rather than as a numpy
    constant: at Swin stage 1 the mask is (512, 49, 49) per layer, and
    embedding those as HLO literals made the serialized program too large for
    remote-compile endpoints. The iota form is a handful of fused VPU ops.
    """
    r = window_size
    assert h % r == 0 and w % r == 0

    def axis_labels(size):
        i = jnp.arange(size, dtype=jnp.int32)
        return ((i >= size - r).astype(jnp.int32)
                + (i >= size - shift_size).astype(jnp.int32))

    lab = axis_labels(h)[:, None] * 3 + axis_labels(w)[None, :]  # (h, w)
    labels = lab.reshape(h // r, r, w // r, r)
    labels = labels.transpose(0, 2, 1, 3).reshape(-1, r * r)  # (nW, r*r)
    diff = labels[:, :, None] - labels[:, None, :]
    return jnp.where(diff != 0, -100.0, 0.0).astype(jnp.float32)


def cyclic_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """torch.roll(x, (-shift, -shift), dims=(1, 2)) on NHWC."""
    if shift == 0:
        return x
    return jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))


def cyclic_unshift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    if shift == 0:
        return x
    return jnp.roll(x, shift=(shift, shift), axis=(1, 2))
