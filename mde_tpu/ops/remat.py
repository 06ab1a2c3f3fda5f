"""Rematerialization policy for the checkpointed blocks.

``use_checkpoint`` blocks (Swin stages, ordered-head repeats) wrap their
body in ``nn.remat``. Full remat recomputes the whole block forward in the
backward pass; the attention sublayers are expensive to recompute (qkv
projections + the fused Pallas kernels) but their OUTPUTS are small
((B, H, W, C) — ~26 MB per instance at flagship train shapes vs ~400 MB for
a single FF gate intermediate), so saving just those is nearly free in HBM
and skips the priciest part of the recompute.

Attention outputs are tagged ``checkpoint_name(x, "sa_out")`` at the
residual add; ``remat_policy()`` returns the jax checkpoint policy that
saves exactly those. ``MDE_REMAT_POLICY=full`` reverts to whole-block remat
(the round-1 behavior) for A/B and as an escape hatch if a config's memory
budget is tighter.
"""

from __future__ import annotations

import os

import jax
from jax.ad_checkpoint import checkpoint_name


def tag_sa(x, name: str = "sa_out"):
    """Tag an attention-sublayer output as saveable under selective remat."""
    return checkpoint_name(x, name)


def remat_policy():
    """Policy for ``nn.remat(..., policy=...)`` call sites. None = save
    nothing (full recompute)."""
    mode = os.environ.get("MDE_REMAT_POLICY", "save_sa")
    if mode == "full":
        return None
    return jax.checkpoint_policies.save_only_these_names("sa_out")
