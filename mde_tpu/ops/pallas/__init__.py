"""Pallas TPU kernels for the hot attention ops.

Dispatch policy: modules take an ``attn_impl`` knob with values

* ``"auto"``   — pallas on TPU backends, xla elsewhere (CPU tests, fallback)
* ``"pallas"`` — force the fused kernel (compiled on TPU, interpreted on CPU)
* ``"xla"``    — force the reference einsum path

Both directions are fused: forwards avoid the (B·nW, heads, N, N) HBM
materializations, and the ``custom_vjp`` backwards are flash-style Pallas
kernels that recompute scores/probabilities in VMEM (``dS = P*(dP -
rowsum(dP*P))``) instead of round-tripping them through XLA.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def default_backend_is_tpu() -> bool:
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover - no devices at all
        return False
    kind = getattr(dev, "device_kind", "") or ""
    return dev.platform in ("tpu",) or kind.upper().startswith("TPU")


def resolve_impl(impl: str) -> str:
    """Map ``auto`` to a concrete implementation for this process.

    ``auto`` honors the ``MDE_ATTN_IMPL`` env var (pallas / pallas_interpret /
    xla) and otherwise picks pallas on TPU backends, xla elsewhere.
    """
    if impl == "auto":
        import os
        impl = os.environ.get("MDE_ATTN_IMPL", "auto")
    if impl == "auto":
        return "pallas" if default_backend_is_tpu() else "xla"
    if impl in ("pallas", "pallas_interpret", "xla"):
        return impl
    raise ValueError(f"Unknown attention impl {impl!r}")


from .window_attention import fused_window_attention  # noqa: E402
from .ordered_attention import fused_ordered_window_attention  # noqa: E402
from .channel_attention import fused_channel_attention  # noqa: E402

__all__ = [
    "fused_window_attention",
    "fused_ordered_window_attention",
    "fused_channel_attention",
    "resolve_impl",
    "default_backend_is_tpu",
]
