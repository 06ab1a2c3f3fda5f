"""Shared layout constants used by both the model layer and the converters.

Kept dependency-free so ``core.checkpoint`` (numpy-only) and the flax model
modules can both import it without pulling each other in.
"""

# Default head-repeat layout for the ODA2 flagship (``oda2_red_order_swin2``).
# False = UNROLLED repeats (params under ``attn{i}``/``conv{i}_*``) — measured
# 8% faster train step than the nn.scan layout at flagship shapes
# (BASELINE.md round 3). True = nn.scan layout (params stacked under
# ``repeat/``; ~3x smaller head HLO when compile time dominates).
#
# The model default (``models.oda2.red_order_swin2``), the config path
# (``from_options``), and every ODA2 checkpoint converter
# (``core.checkpoint.convert_oda2_*``) all read THIS constant, so converted
# reference weights and config-built models always agree on the param tree.
# ``core.checkpoint.migrate_head_layout`` converts existing checkpoints
# between the two layouts.
SCAN_REPEATS_DEFAULT = False
