"""Rematerialization policy for the checkpointed blocks.

``use_checkpoint`` blocks (Swin stages, ordered-head repeats) wrap their
body in ``nn.remat``. Full remat recomputes the whole block forward in the
backward pass; the attention sublayers are expensive to recompute (qkv
projections + the fused Pallas kernels) but their OUTPUTS are small
((B, H, W, C) — ~26 MB per instance at flagship train shapes vs ~400 MB for
a single FF gate intermediate), so saving just those is nearly free in HBM
and skips the priciest part of the recompute.

Attention outputs are tagged ``checkpoint_name(x, "sa_out")`` at the
residual add, and the FF depthwise-conv outputs ``"dw_conv"`` (the conv
forward is ~8.5 ms per FF at flagship train shapes and its output is needed
verbatim by GELU's backward — saving it skips the priciest recompute in the
FF for ~410 MB/instance HBM). The GLU gate output (``"glu_out"``, the conv
*input*) is tagged too but NOT saved by default: ``save_sa_conv_glu`` was
measured 5% SLOWER end-to-end (722 vs 688 ms/step at flagship batch 4 —
the extra ~2.5 GB of saved activations cost more in scheduling/HBM pressure
than the LN -> lin1 -> sigmoid-mul recompute they avoid).
``remat_policy()`` returns the jax checkpoint policy for the selected mode.
``MDE_REMAT_POLICY`` selects ``full`` (whole-block remat, the round-1
behavior), ``save_sa`` (round-2), ``save_sa_conv_glu`` (measured regression,
kept for A/B), or the default ``save_sa_conv``.
"""

from __future__ import annotations

import os

import jax
from jax.ad_checkpoint import checkpoint_name


def tag_sa(x, name: str = "sa_out"):
    """Tag an attention-sublayer output as saveable under selective remat."""
    return checkpoint_name(x, name)


def tag_conv(x, name: str = "dw_conv"):
    """Tag an FF depthwise-conv output as saveable under selective remat."""
    return checkpoint_name(x, name)


def tag_glu(x, name: str = "glu_out"):
    """Tag an FF GLU gate output (the conv input) as saveable."""
    return checkpoint_name(x, name)


def remat_policy():
    """Policy for ``nn.remat(..., policy=...)`` call sites. None = save
    nothing (full recompute)."""
    mode = os.environ.get("MDE_REMAT_POLICY", "save_sa_conv")
    if mode == "full":
        return None
    if mode == "save_sa":
        return jax.checkpoint_policies.save_only_these_names("sa_out")
    if mode == "save_sa_conv_glu":
        return jax.checkpoint_policies.save_only_these_names(
            "sa_out", "dw_conv", "glu_out")
    return jax.checkpoint_policies.save_only_these_names(
        "sa_out", "dw_conv")
