"""Swin Transformer backbone — TPU-native reimplementation.

Behavioral reference: the ODA2 clean Swin
(``model/ODA2/oda2_swin_transformer.py:503-690``): patch4 embed + LN, 4 stages
of [W-MSA | SW-MSA] blocks with relative position bias, replicate padding to
window multiples, patch-merging downsample between stages, per-stage LayerNorm
outputs, stochastic-depth decay, per-stage gradient checkpointing, frozen-stage
support. Loads Microsoft Swin-B/L ImageNet-22k checkpoints via the converter in
``mde_tpu/core/checkpoint.py``.

TPU-first departures from the reference:
* NHWC end-to-end; tokens never flattened to (B, N, C) — windows are folded
  into the batch dim with static reshapes.
* SW-MSA masks are iota-derived under jit, fused by XLA (no big literals,
  construction as in the reference ``:409-432``).
* bf16 activations / f32 params via the ``dtype`` field.
* rematerialization via ``nn.remat`` per block (reference: torch checkpoint
  per block, ``:439-445``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import tnn

from ..ops.attention import WindowAttention
from ..ops.mlp import SwinMLP
from ..ops.drop import DropPath
from ..ops.remat import tag_sa, remat_policy
from ..ops.window import (
    window_partition, window_reverse, shifted_window_attn_mask,
    cyclic_shift, cyclic_unshift,
)
from ..ops.pad import pad_to_multiple
from ..ops.init import trunc_normal_init


class PatchEmbed(nn.Module):
    """4x4 conv patchify + LayerNorm (reference ``PatchEmbed``, ``:455-501``)."""

    patch_size: int = 4
    embed_dim: int = 96
    out_norm: bool = True
    padding_mode: str = "edge"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = pad_to_multiple(x, p, mode=self.padding_mode)
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name="proj")(x)
        if self.out_norm:
            x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm")(x)
        return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LN + Linear(4C -> 2C) (reference ``:298-339``).

    Concat order matches the reference exactly: [x00, x10, x01, x11]
    (even/odd row-major), which matters for checkpoint interop.
    """

    padding_mode: str = "edge"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if h % 2 == 1 or w % 2 == 1:
            from ..ops.pad import pad2d
            x = pad2d(x, 0, h % 2, 0, w % 2, mode=self.padding_mode)
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02), name="reduction")(x)
        return x


class SwinBlock(nn.Module):
    """One Swin block: [shift ->] W-MSA (+rel-pos bias, +SW mask) -> FFN
    (reference ``SwinTransformerBlock``, ``:186-295``)."""

    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    path_drop_prob: float = 0.0
    padding_mode: str = "edge"
    shift_collapse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 path_drop_rate=None) -> jnp.ndarray:
        b, h, w, c = x.shape
        r = self.window_size
        shift = self.shift_size
        if self.shift_collapse and min(h, w) <= r:
            # timm min-window rule (``model/ODA/oda_swin_transformer.py:56-60``):
            # when the window covers the smaller spatial dim, SW-MSA collapses
            # to W-MSA and the window shrinks to that dim. In the production
            # ODA config this fires at stage 4 (12x36 tokens, window 12).
            # Static under jit — shapes are traced constants.
            shift = 0
            r = min(r, min(h, w))

        shortcut = x
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)

        x = pad_to_multiple(x, r, mode=self.padding_mode)
        hp, wp = x.shape[1], x.shape[2]

        if shift > 0:
            x = cyclic_shift(x, shift)
            mask = shifted_window_attn_mask(hp, wp, r, shift)
        else:
            mask = None

        xw = window_partition(x, r)  # (B*nW, r*r, C)
        xw = WindowAttention(
            num_heads=self.num_heads, window_size=r, qkv_bias=self.qkv_bias,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="attn",
        )(xw, mask=mask, train=train)
        x = window_reverse(xw, r, hp, wp)

        if shift > 0:
            x = cyclic_unshift(x, shift)
        x = x[:, :h, :w, :]

        drop_path = DropPath(self.path_drop_prob, name="drop_path")
        x = shortcut + drop_path(x, deterministic=not train,
                                 rate=path_drop_rate)
        # saveable under selective remat (ops/remat.py): skipping the
        # attention recompute in the backward costs only this small tensor
        x = tag_sa(x)

        y = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = SwinMLP(hidden_features=int(c * self.mlp_ratio),
                    drop_prob=self.drop_prob, dtype=self.dtype, name="mlp")(y, train=train)
        x = x + drop_path(y, deterministic=not train, rate=path_drop_rate)
        return x


class SwinBlockPair(nn.Module):
    """One W-MSA + SW-MSA block pair — the unit scanned by ``nn.scan`` in
    deep stages. Per-block stochastic-depth rates arrive as scanned xs
    (``pdp_pair``) so the pair structure is iteration-invariant."""

    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    padding_mode: str = "edge"
    shift_collapse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pdp_pair: jnp.ndarray, train: bool = False):
        common = dict(num_heads=self.num_heads, window_size=self.window_size,
                      mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                      drop_prob=self.drop_prob,
                      attn_drop_prob=self.attn_drop_prob,
                      padding_mode=self.padding_mode,
                      shift_collapse=self.shift_collapse, dtype=self.dtype)
        x = SwinBlock(shift_size=0, name="blk0", **common)(
            x, train=train, path_drop_rate=pdp_pair[0])
        x = SwinBlock(shift_size=self.window_size // 2, name="blk1", **common)(
            x, train=train, path_drop_rate=pdp_pair[1])
        return x, None


class SwinStage(nn.Module):
    """A stack of blocks with alternating shift, plus optional downsample
    (reference ``SwinTransformerStage``, ``:342-452``)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    path_drop_probs: Tuple[float, ...] = ()
    downsample: bool = False
    use_checkpoint: bool = False
    scan_blocks: bool = True
    padding_mode: str = "edge"
    shift_collapse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        pdp = [self.path_drop_probs[i] if i < len(self.path_drop_probs) else 0.0
               for i in range(self.depth)]

        if self.scan_blocks and self.depth % 2 == 0 and self.depth >= 2:
            # nn.scan over W-MSA/SW-MSA pairs: compiles ONE pair instead of
            # `depth` unrolled blocks (9x smaller HLO for the 18-block stage;
            # params gain a leading n_pairs axis). Wrapped in remat when
            # use_checkpoint so each pair recomputes in backward.
            n_pairs = self.depth // 2
            pair_cls = SwinBlockPair
            if self.use_checkpoint:
                pair_cls = nn.remat(SwinBlockPair, static_argnums=(3,),
                                    policy=remat_policy())
            scan_cls = nn.scan(
                pair_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast),
                length=n_pairs,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            pdp_arr = jnp.asarray(pdp, jnp.float32).reshape(n_pairs, 2)
            x, _ = scan_cls(
                num_heads=self.num_heads, window_size=self.window_size,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop_prob=self.drop_prob, attn_drop_prob=self.attn_drop_prob,
                padding_mode=self.padding_mode,
                shift_collapse=self.shift_collapse,
                dtype=self.dtype, name="blocks",
            )(x, pdp_arr, train)
        else:
            block_cls = SwinBlock
            if self.use_checkpoint:
                # remat trades FLOPs for HBM: recompute block activations in
                # the backward pass (reference: torch checkpoint, ``:439-445``).
                block_cls = nn.remat(SwinBlock, static_argnums=(2,),
                                     policy=remat_policy())
            for i in range(self.depth):
                x = block_cls(
                    num_heads=self.num_heads,
                    window_size=self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop_prob=self.drop_prob,
                    attn_drop_prob=self.attn_drop_prob,
                    path_drop_prob=pdp[i],
                    padding_mode=self.padding_mode,
                    shift_collapse=self.shift_collapse,
                    dtype=self.dtype,
                    name=f"blocks{i}",
                )(x, train)
        x_out = x
        if self.downsample:
            x = PatchMerging(padding_mode=self.padding_mode, dtype=self.dtype,
                             name="downsample")(x)
        return x_out, x


class SwinTransformer(nn.Module):
    """4-stage hierarchical backbone returning NHWC features at strides
    4/8/16/32 (reference ``SwinTransformer``, ``:503-685``)."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    path_drop_prob: float = 0.2
    patch_norm: bool = True
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    use_checkpoint: bool = False
    scan_blocks: bool = True
    out_norms: bool = True  # per-stage output LayerNorms (ODA encoder: off)
    # 'edge' = replicate (ODA/ODA2 variants, ``oda2_swin_transformer.py:12``);
    # 'zeros' = torch F.pad default (NewCRFs variant,
    # ``model/NewCRFs/swin_transformer.py:209,277,425-427``)
    padding_mode: str = "edge"
    # timm min-window rule (ODA variant, ``oda_swin_transformer.py:56-60``)
    shift_collapse: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_features(self) -> Tuple[int, ...]:
        return tuple(int(self.embed_dim * 2 ** i) for i in range(len(self.depths)))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       out_norm=self.patch_norm,
                       padding_mode=self.padding_mode, dtype=self.dtype,
                       name="patch_embed")(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        x = nn.Dropout(self.drop_prob, deterministic=not train)(x)

        # stochastic depth decay rule (reference ``:574``)
        total = sum(self.depths)
        pdp = [self.path_drop_prob * i / max(total - 1, 1) for i in range(total)]

        num_layers = len(self.depths)
        outs = []
        for i in range(num_layers):
            start = sum(self.depths[:i])
            x_out, x = SwinStage(
                dim=self.num_features[i],
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop_prob=self.drop_prob,
                attn_drop_prob=self.attn_drop_prob,
                path_drop_probs=tuple(pdp[start:start + self.depths[i]]),
                downsample=i < num_layers - 1,
                use_checkpoint=self.use_checkpoint,
                scan_blocks=self.scan_blocks,
                padding_mode=self.padding_mode,
                shift_collapse=self.shift_collapse,
                dtype=self.dtype,
                name=f"layers{i}",
            )(x, train)
            if i + 1 < self.frozen_stages:
                x = jax.lax.stop_gradient(x)
                x_out = jax.lax.stop_gradient(x_out)
            if i in self.out_indices:
                if self.out_norms:
                    x_out = tnn.LayerNorm(dtype=self.dtype,
                                         param_dtype=jnp.float32,
                                         name=f"norm{i}")(x_out)
                outs.append(x_out)
        return tuple(outs)


def swin_base(**kwargs) -> SwinTransformer:
    """Swin-B/22k config (reference ``oda2_red_order_swin2.py:36-38``)."""
    kwargs.setdefault("embed_dim", 128)
    kwargs.setdefault("depths", (2, 2, 18, 2))
    kwargs.setdefault("num_heads", (4, 8, 16, 32))
    return SwinTransformer(**kwargs)


def swin_large(**kwargs) -> SwinTransformer:
    """Swin-L/22k config (reference ``oda2_red_order_swin2.py:39-41``)."""
    kwargs.setdefault("embed_dim", 192)
    kwargs.setdefault("depths", (2, 2, 18, 2))
    kwargs.setdefault("num_heads", (6, 12, 24, 48))
    return SwinTransformer(**kwargs)


def swin_tiny(**kwargs) -> SwinTransformer:
    kwargs.setdefault("embed_dim", 96)
    kwargs.setdefault("depths", (2, 2, 6, 2))
    kwargs.setdefault("num_heads", (3, 6, 12, 24))
    return SwinTransformer(**kwargs)
