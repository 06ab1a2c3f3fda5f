"""Checkpointing: native (orbax) + PyTorch-interop converters.

Native path replaces the reference's ``save_checkpoint``
(``utils/common_utils.py:12-31``): model params/batch_stats + optimizer state
+ epoch/iter/best bookkeeping, written with orbax.

Interop path replaces the reference's converters (``checkpoint/*_rename.py``,
``model/NewCRFs/newcrf_utils.load_checkpoint``): maps torch state dicts
(Microsoft Swin-B/L 22k, released AdaBins/NewCRFs weights) into our flax
pytrees with STRICT key accounting — every torch key must be consumed or
explicitly skipped, every flax leaf must be produced — plus the
relative-position-bias bicubic interpolation across window sizes
(``newcrf_utils.py:245-260``).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


# ---------------------------------------------------------------------------
# Native checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int,
                    best_value: Optional[float] = None,
                    keep: int = 3) -> str:
    """Save a TrainState (+bookkeeping) under ``ckpt_dir/step_<N>``."""
    assert _HAS_ORBAX
    import jax
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": jax.device_get(state),
               "meta": {"step": step, "best_value": best_value or 0.0}}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    _gc_checkpoints(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def restore_checkpoint(path: str, target):
    assert _HAS_ORBAX
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


def _gc_checkpoints(ckpt_dir: str, keep: int) -> None:
    import shutil
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    for s in sorted(steps)[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)


# ---------------------------------------------------------------------------
# Torch-interop utilities
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file to numpy (torch CPU build is available in-image).
    Handles the Microsoft Swin convention of nesting under 'model', and strips
    DDP 'module.' prefixes (reference ``checkpoint/*_rename.py``)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def interpolate_rel_pos_bias(table: np.ndarray, new_window: int) -> np.ndarray:
    """Bicubic-resize a ((2w-1)^2, nh) rel-pos table to a new window size
    (reference ``newcrf_utils.py:245-260``)."""
    l_old, nh = table.shape
    s_old = int(round(l_old ** 0.5))
    s_new = 2 * new_window - 1
    if s_old * s_old != l_old:
        raise ValueError(f"Table length {l_old} is not square.")
    if s_old == s_new:
        return table
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(table.astype(np.float32))
    t = t.permute(1, 0).view(1, nh, s_old, s_old)
    t = F.interpolate(t, size=(s_new, s_new), mode="bicubic")
    return t.view(nh, s_new * s_new).permute(1, 0).numpy()


class KeyAccountant:
    """Tracks consumption of torch keys and production of flax leaves so a
    conversion is verifiably complete (analog of strict=True loading,
    ``oda2_swin_transformer.py:654``)."""

    def __init__(self, torch_state: Dict[str, np.ndarray]):
        self.state = torch_state
        self.used: set = set()
        self.skipped: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.state:
            raise KeyError(f"Missing torch key: {key}")
        self.used.add(key)
        return self.state[key]

    def skip(self, pattern: str) -> None:
        for k in self.state:
            if re.search(pattern, k):
                self.skipped.add(k)

    def unused(self) -> List[str]:
        return sorted(set(self.state) - self.used - self.skipped)

    def assert_exhausted(self):
        left = self.unused()
        if left:
            raise ValueError(f"Unconverted torch keys ({len(left)}): {left[:10]}...")


def _dense(acc: KeyAccountant, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": acc.take(f"{prefix}.weight").T}
    if bias:
        out["bias"] = acc.take(f"{prefix}.bias")
    return out


def _ln(acc: KeyAccountant, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": acc.take(f"{prefix}.weight"),
            "bias": acc.take(f"{prefix}.bias")}


def _conv(acc: KeyAccountant, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
    out = {"kernel": acc.take(f"{prefix}.weight").transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = acc.take(f"{prefix}.bias")
    return out


def convert_swin_backbone(torch_state: Dict[str, np.ndarray],
                          depths: Tuple[int, ...] = (2, 2, 18, 2),
                          out_indices: Tuple[int, ...] = (0, 1, 2, 3),
                          target_window: Optional[int] = None,
                          ) -> Dict[str, Any]:
    """Microsoft Swin(-B/L 22k) state dict -> our SwinTransformer params.

    Mirrors the reference's strict load after dropping classifier head/norm
    and attn_mask buffers (``oda2_swin_transformer.py:640-654``); the
    per-out-index norms are freshly initialized to identity (``:651-653``).
    """
    acc = KeyAccountant(torch_state)
    acc.skip(r"^(norm\.weight|norm\.bias|head\.weight|head\.bias)$")
    acc.skip(r"attn_mask")
    acc.skip(r"relative_position_index")

    params: Dict[str, Any] = {}
    params["patch_embed"] = {
        "proj": _conv(acc, "patch_embed.proj"),
        "norm": _ln(acc, "patch_embed.norm"),
    }

    num_layers = len(depths)
    for i in range(num_layers):
        stage: Dict[str, Any] = {}
        for j in range(depths[i]):
            p = f"layers.{i}.blocks.{j}"
            table = acc.take(f"{p}.attn.relative_position_bias_table")
            if target_window is not None:
                table = interpolate_rel_pos_bias(table, target_window)
            stage[f"blocks{j}"] = {
                "norm1": _ln(acc, f"{p}.norm1"),
                "attn": {
                    "relative_position_bias_table": table,
                    "qkv": _dense(acc, f"{p}.attn.qkv"),
                    "proj": _dense(acc, f"{p}.attn.proj"),
                },
                "norm2": _ln(acc, f"{p}.norm2"),
                "mlp": {
                    "fc1": _dense(acc, f"{p}.mlp.fc1"),
                    "fc2": _dense(acc, f"{p}.mlp.fc2"),
                },
            }
        if i < num_layers - 1:
            stage["downsample"] = {
                "norm": _ln(acc, f"layers.{i}.downsample.norm"),
                "reduction": _dense(acc, f"layers.{i}.downsample.reduction",
                                    bias=False),
            }
        params[f"layers{i}"] = stage

    # fresh identity output norms (reference fills 1/0: ``:651-653``)
    embed_dim = params["patch_embed"]["proj"]["kernel"].shape[-1]
    for i in out_indices:
        dim = embed_dim * 2 ** i
        params[f"norm{i}"] = {"scale": np.ones(dim, np.float32),
                              "bias": np.zeros(dim, np.float32)}

    acc.assert_exhausted()
    return params


def tree_shapes_match(a, b) -> List[str]:
    """Return a list of mismatched paths between two pytrees of arrays."""
    import jax
    mismatches = []

    def walk(pa, pb, path):
        if isinstance(pa, dict) and isinstance(pb, dict):
            keys = set(pa) | set(pb)
            for k in sorted(keys):
                if k not in pa:
                    mismatches.append(f"{path}/{k}: missing in A")
                elif k not in pb:
                    mismatches.append(f"{path}/{k}: missing in B")
                else:
                    walk(pa[k], pb[k], f"{path}/{k}")
        else:
            sa = tuple(np.shape(pa))
            sb = tuple(np.shape(pb))
            if sa != sb:
                mismatches.append(f"{path}: {sa} vs {sb}")

    walk(a, b, "")
    del jax
    return mismatches
