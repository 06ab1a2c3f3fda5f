"""Torch-default-compatible nn aliases.

The reference is pure torch 1.10; two flax defaults silently diverge from it
and would break checkpoint parity at the 1e-3 level:

* ``torch.nn.LayerNorm`` uses eps **1e-5**; ``flax.linen.LayerNorm`` defaults
  to 1e-6.
* ``torch.nn.GELU()`` is the **exact** erf GELU; ``flax.linen.gelu`` defaults
  to the tanh approximation.

All framework modules import ``LayerNorm``/``gelu`` from here so the torch
semantics hold everywhere (see ``tests/test_torch_parity.py``).
"""

from __future__ import annotations

import functools

import flax.linen as nn

LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)
gelu = functools.partial(nn.gelu, approximate=False)
