"""Stochastic depth (DropPath)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class DropPath(nn.Module):
    """Per-sample residual-branch dropout (timm DropPath equivalent; used by
    the reference Swin blocks, ``oda2_swin_transformer.py:227``).

    ``rate`` may be a python float or a traced scalar — the latter lets
    stochastic-depth decay vary across ``nn.scan`` iterations (per-block rates
    ride the scanned xs instead of the module structure).
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 rate=None) -> jnp.ndarray:
        """``rate`` (optional, possibly traced) overrides the static attr —
        used under ``nn.scan`` where per-block stochastic-depth decay rides
        the scanned xs instead of the module structure."""
        if rate is None:
            if self.rate == 0.0 or deterministic:
                return x
            rate = self.rate
        elif deterministic:
            return x
        keep_prob = 1.0 - jnp.asarray(rate, jnp.float32)
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(rng, keep_prob, shape)
        return jnp.where(keep, x / keep_prob.astype(x.dtype), 0.0).astype(x.dtype)
