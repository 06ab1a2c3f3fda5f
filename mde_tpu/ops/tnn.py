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

import contextlib
import functools

import flax.linen as nn

LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)

_exact_gelu = functools.partial(nn.gelu, approximate=False)


def gelu(x):
    """Exact erf GELU in float32 (torch parity); tanh GELU in bfloat16.

    The erf polynomial is VPU-bound on TPU: at the flagship FF shape
    (8,112,224,1024) bf16 it measures 3.28 ms vs 0.39 ms for the tanh
    approximation — 8.4x — and turned the six BN+GELU fusions into the
    forward's single largest cost (6 x 9.8 ms at 21% of HBM bandwidth,
    tools/fusion_profile.py round 5). In bf16 the two are numerically
    indistinguishable: max |tanh_bf16 - erf_f32| = max |erf_bf16 - erf_f32|
    = 0.0312 (one bf16 ulp at these magnitudes; mean 0.0015 vs 0.0014), so
    the reference's exact-erf semantics (torch.nn.GELU()) are preserved at
    every precision where they are observable. f32/f64 inputs — the parity
    and converter paths — always use exact erf. Set ``MDE_EXACT_GELU=1`` to
    force erf for bf16 as well."""
    import os

    import jax.numpy as jnp
    if x.dtype == jnp.bfloat16 \
            and os.environ.get("MDE_EXACT_GELU", "0") == "0":
        return nn.gelu(x, approximate=True)
    return _exact_gelu(x)


# ---------------------------------------------------------------------------
# BN freeze scopes (reference ``freeze_bn`` -> m.eval(),
# ``utils/common_utils.py:78-81``)
# ---------------------------------------------------------------------------
#
# The reference's freeze_bn switches BatchNorm modules to eval(): they
# normalize with RUNNING stats and stop updating them, while the rest of the
# model keeps training. In flax that choice is per-call, so every BN call
# site resolves it through ``bn_use_running_average(self, train)``, which
# consults a trace-time stack of path predicates. ``make_train_step`` pushes a
# predicate (everything, or the ``encoder`` subtree for
# ``train.freeze_encoder_bn``) around ``model.apply`` while the frozen step is
# traced, so the eval-mode normalization is baked into that step's XLA
# program. Pure trace-time machinery: nothing dynamic remains under jit.

_BN_FREEZE_PREDICATES: list = []


@contextlib.contextmanager
def bn_freeze_scope(predicate=None):
    """While active (at trace time), BN layers whose module path satisfies
    ``predicate`` (default: all) normalize with running stats even when
    ``train=True`` — the reference's ``m.eval()`` freeze semantics."""
    _BN_FREEZE_PREDICATES.append(predicate or (lambda path: True))
    try:
        yield
    finally:
        _BN_FREEZE_PREDICATES.pop()


def encoder_only(path) -> bool:
    """Predicate for ``train.freeze_encoder_bn``: the model's ``encoder``
    submodule subtree."""
    return len(path) > 0 and path[0] == "encoder"


def bn_use_running_average(module: nn.Module, train: bool) -> bool:
    """Resolve a BN call site's ``use_running_average``: eval mode, or a
    matching active freeze scope."""
    if not train:
        return True
    if not _BN_FREEZE_PREDICATES:
        return False
    path = module.scope.path if module.scope is not None else ()
    return any(p(path) for p in _BN_FREEZE_PREDICATES)
