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

    # --- timm 0.5.4 module stubs used by model/ODA/oda_swin_transformer.py.
    # Faithful reimplementations of the public timm semantics (PatchEmbed,
    # Mlp, window helpers, WindowAttention, PatchMerging) — these are part of
    # the reference compute path, so their math must match timm 0.5.4
    # exactly for activation parity.

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True):
            super().__init__()
            img_size = to_2tuple(img_size)
            patch_size = to_2tuple(patch_size)
            self.img_size = img_size
            self.patch_size = patch_size
            self.grid_size = (img_size[0] // patch_size[0],
                              img_size[1] // patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)  # BCHW -> BNC
            return self.norm(x)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    def window_partition(x, window_size):
        B, H, W, C = x.shape
        x = x.view(B, H // window_size, window_size, W // window_size,
                   window_size, C)
        return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(
            -1, window_size, window_size, C)

    def window_reverse(windows, window_size, H, W):
        B = int(windows.shape[0] / (H * W / window_size / window_size))
        x = windows.view(B, H // window_size, W // window_size, window_size,
                         window_size, -1)
        return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)

    class WindowAttention(nn.Module):
        def __init__(self, dim, window_size, num_heads, qkv_bias=True,
                     attn_drop=0.0, proj_drop=0.0):
            super().__init__()
            self.dim = dim
            self.window_size = window_size
            self.num_heads = num_heads
            head_dim = dim // num_heads
            self.scale = head_dim ** -0.5
            self.relative_position_bias_table = nn.Parameter(torch.zeros(
                (2 * window_size[0] - 1) * (2 * window_size[1] - 1),
                num_heads))
            coords = torch.stack(torch.meshgrid(
                [torch.arange(window_size[0]), torch.arange(window_size[1])]))
            coords_flatten = torch.flatten(coords, 1)
            rel = (coords_flatten[:, :, None] - coords_flatten[:, None, :]
                   ).permute(1, 2, 0).contiguous()
            rel[:, :, 0] += window_size[0] - 1
            rel[:, :, 1] += window_size[1] - 1
            rel[:, :, 0] *= 2 * window_size[1] - 1
            self.register_buffer("relative_position_index", rel.sum(-1))
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)
            torch.nn.init.trunc_normal_(self.relative_position_bias_table,
                                        std=.02)
            self.softmax = nn.Softmax(dim=-1)

        def forward(self, x, mask=None):
            B_, N, C = x.shape
            qkv = self.qkv(x).reshape(B_, N, 3, self.num_heads,
                                      C // self.num_heads).permute(
                                          2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            q = q * self.scale
            attn = q @ k.transpose(-2, -1)
            bias = self.relative_position_bias_table[
                self.relative_position_index.view(-1)].view(
                    self.window_size[0] * self.window_size[1],
                    self.window_size[0] * self.window_size[1], -1)
            attn = attn + bias.permute(2, 0, 1).contiguous().unsqueeze(0)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(B_ // nW, nW, self.num_heads, N,
                                 N) + mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, self.num_heads, N, N)
            attn = self.attn_drop(self.softmax(attn))
            x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
            return self.proj_drop(self.proj(x))

    class PatchMerging(nn.Module):
        def __init__(self, input_resolution, dim, norm_layer=nn.LayerNorm):
            super().__init__()
            self.input_resolution = input_resolution
            self.dim = dim
            self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
            self.norm = norm_layer(4 * dim)

        def forward(self, x):
            H, W = self.input_resolution
            B, L, C = x.shape
            assert L == H * W
            x = x.view(B, H, W, C)
            x0 = x[:, 0::2, 0::2, :]
            x1 = x[:, 1::2, 0::2, :]
            x2 = x[:, 0::2, 1::2, :]
            x3 = x[:, 1::2, 1::2, :]
            x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
            return self.reduction(self.norm(x))

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm_layers.PatchEmbed = PatchEmbed
    timm_layers.Mlp = Mlp
    timm_fx = types.ModuleType("timm.models.fx_features")
    timm_fx.register_notrace_function = lambda fn: fn
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_vit.checkpoint_filter_fn = lambda sd, model: sd
    # reference calls self.apply(_init_vit_weights); torch default inits are
    # fine for parity (the converted state dict carries the actual values)
    timm_vit._init_vit_weights = lambda m, n="", head_bias=0., jax_impl=False: None
    timm_swin = types.ModuleType("timm.models.swin_transformer")
    timm_swin.window_partition = window_partition
    timm_swin.window_reverse = window_reverse
    timm_swin.WindowAttention = WindowAttention
    timm_swin.PatchMerging = PatchMerging
    timm_models.layers = timm_layers
    timm_models.fx_features = timm_fx
    timm_models.vision_transformer = timm_vit
    timm_models.swin_transformer = timm_swin
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers
    sys.modules["timm.models.fx_features"] = timm_fx
    sys.modules["timm.models.vision_transformer"] = timm_vit
    sys.modules["timm.models.swin_transformer"] = timm_swin


def import_ref(dotted: str):
    """Import a reference module by dotted path under /root/reference, e.g.
    ``model.ODA2.oda2_swin_transformer`` (its package __init__s are empty)."""
    install_timm_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(dotted)


def import_ref_pkg_module(pkg_dir: str, pkg_alias: str, module: str):
    """Import ``<pkg_alias>.<module>`` from a reference package directory
    WITHOUT executing the package's real ``__init__`` (which may import
    unavailable deps, e.g. ``model/NewCRFs/__init__`` -> mmcv). Relative
    imports inside the module still resolve against the synthetic package."""
    install_timm_stub()
    if "torchvision" not in sys.modules:
        # newcrf_utils imports torchvision only for its mmcv-style loader
        # machinery; none of it runs in parity tests
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.0"
        sys.modules["torchvision"] = tv
    if pkg_alias not in sys.modules:
        pkg = types.ModuleType(pkg_alias)
        pkg.__path__ = [f"{REFERENCE_ROOT}/{pkg_dir}"]
        sys.modules[pkg_alias] = pkg
    return importlib.import_module(f"{pkg_alias}.{module}")


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
