"""Import the reference torch models from /root/reference for activation-parity
tests (analog of the reference's own ``model/swin_transformer_check.py:22-52``,
which diffs two Swin implementations stage by stage).

The sandbox image ships torch 2.13-CPU but not timm, so a ~30-line stub of
``timm.models.layers`` (``DropPath``, ``to_2tuple``, ``trunc_normal_`` — the
only three names the reference models import) is installed into sys.modules
before loading the reference code. The reference's ODA2 package inits are
empty, so ``model.ODA2.*`` modules import cleanly; ``model/NewCRFs/__init__``
pulls in mmcv via NewCRFDepth, so ``newcrf_layers`` is loaded directly from
its file path instead.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_timm_stub() -> None:
    """Register a minimal ``timm.models.layers`` with the three names the
    reference model files import (parity runs are eval-mode, so DropPath is
    identity; trunc_normal_ delegates to torch's own)."""
    if "timm.models.layers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers


def import_ref(dotted: str):
    """Import a reference module by dotted path under /root/reference, e.g.
    ``model.ODA2.oda2_swin_transformer`` (its package __init__s are empty)."""
    install_timm_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(dotted)


def load_ref_file(relpath: str, name: str):
    """Load a single reference file that has NO relative imports, bypassing
    its package __init__ (``model/NewCRFs/__init__`` imports mmcv)."""
    install_timm_stub()
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    # register before exec so intra-module references resolve
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def state_dict_numpy(module) -> dict:
    """torch module -> {key: np.ndarray} state dict (buffers included)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
