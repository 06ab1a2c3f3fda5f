"""Parameter initializers matching the reference's torch init semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trunc_normal_init(std: float = 0.02, mean: float = 0.0):
    """Truncated normal with hard +/-2*std bounds.

    torch's ``nn.init.trunc_normal_(std=s)`` samples N(0, s^2) truncated to
    [-2s, 2s] (bounds are in *output* units). jax's ``truncated_normal``
    truncates the standard normal, so scaling by ``std`` afterwards gives the
    same distribution.
    """

    def init(key, shape, dtype=jnp.float32):
        unit = jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
        return (unit * std + mean).astype(dtype)

    return init


def conv_kernel_normal_init(kernel_h: int, kernel_w: int):
    """N(0, sqrt(2/(kh*kw))) — the reference's depthwise-conv FF init
    (``oda2_red_order_reg_decoder.py:72-74``)."""
    std = (2.0 / (kernel_h * kernel_w)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    return init
