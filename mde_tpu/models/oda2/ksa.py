"""ODA2 ``oda2_ksa_reg`` — Kernel-window Self-Attention decoder pyramid.

Behavioral reference: ``model/ODA2/{oda2_ksa_decoder,oda2_ksa_reg}.py``.
A Swin-like DECODER-side transformer pyramid running coarse -> fine: the
coarsest stage is plain W-MSA/SW-MSA; finer stages prepend a
``KernelWindowAttention`` — a per-window channel-mixing cross attention
(attn over head-channel pairs between decoder tokens and that scale's
encoder window, scale sqrt(1/n)) — then W-MSA, each with pre-norm residuals
and two MLPs. Between stages ``PatchUnMerging`` upsamples (channel quarters
-> 2x2 interleave + ConvBN d/4 -> d/2). Inputs: PPM at 1/32 + per-scale
ConvBN laterals; head: ConvBN + 3x3 VALID conv (2-px shrink quirk) +
sigmoid.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ...ops.conv import ConvBN
from ...ops.attention import WindowAttention
from ...ops.mlp import SwinMLP
from ...ops.ppm import PyramidPoolingModule
from ...ops.window import (
    window_partition, window_reverse, shifted_window_attn_mask,
    cyclic_shift, cyclic_unshift,
)
from ...ops.pad import pad_to_multiple
from ...ops.resize import resize_bilinear
from ...ops.drop import DropPath
from ...ops.init import trunc_normal_init
from .red_order_swin2 import _resize_policy
from ..swin import swin_base, swin_large, SwinTransformer, SwinBlock


class KernelWindowAttention(nn.Module):
    """(reference ``KernelWindowAttention``, ``oda2_ksa_decoder.py:49-103``).

    ``attn_impl``: 'auto' routes through the fused channel-attention Pallas
    kernel on TPU (rectangular hd x enc_hd scores stay in VMEM); train-time
    attention dropout forces the XLA einsum path.
    """

    num_heads: int
    qkv_bias: bool = True
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, enc: jnp.ndarray, train: bool = False):
        from ...ops.pallas import resolve_impl, fused_channel_attention

        bw, n, c = x.shape
        enc_c = enc.shape[-1]
        nh = self.num_heads
        assert c % nh == 0 and enc_c % nh == 0

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02), name="q")(x)
        kv = nn.Dense(2 * enc_c, use_bias=self.qkv_bias, dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=trunc_normal_init(0.02), name="kv")(enc)
        k, v = jnp.split(kv, 2, axis=-1)

        scale = math.sqrt(1.0 / n)
        impl = resolve_impl(self.attn_impl)
        use_fused = impl != "xla" and not (train and self.attn_drop_prob > 0)

        if use_fused:
            out = fused_channel_attention(q, k, v, nh, scale, impl=impl)
        else:
            q = q.reshape(bw, n, nh, c // nh)
            k = k.reshape(bw, n, nh, enc_c // nh)
            v = v.reshape(bw, n, nh, enc_c // nh)

            # channel-channel attention inside each window: (bw, nh, hd, enc_hd)
            attn = jnp.einsum("bnhd,bnhe->bhde", q, k)
            attn = attn * scale
            attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
            attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(
                attn.astype(self.dtype))

            out = jnp.einsum("bhde,bnhe->bnhd", attn, v).reshape(bw, n, c)
        out = nn.Dense(c, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init(0.02), name="proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)
        return out


class KSABlock(nn.Module):
    """KSA transformer block — VERBATIM port of the reference
    ``KSATransformerBlock.forward`` (``oda2_ksa_decoder.py:167-251``),
    including its quirky shifted-path rolls: after the kernel attention and
    after the W-MSA it rolls the *windowed token tensor* on dims (1, 2) =
    (token-index, channel) by +shift — NOT a spatial unshift — and never
    spatially unshifts the map (the mid-block roll at ``:222-224`` shifts the
    full map a second time). Reproduced deliberately: any released weights
    were trained with exactly this dataflow."""

    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    path_drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, enc: jnp.ndarray, train: bool = False):
        b, h, w, c = x.shape
        r = self.window_size
        s = self.shift_size
        drop_path = DropPath(self.path_drop_prob, name="drop_path")

        x = pad_to_multiple(x, r, mode="edge")
        enc = pad_to_multiple(enc, r, mode="edge")
        hp, wp = x.shape[1], x.shape[2]

        if s > 0:
            xs = cyclic_shift(x, s)
            es = cyclic_shift(enc, s)
            mask = shifted_window_attn_mask(hp, wp, r, s)
        else:
            xs, es, mask = x, enc, None

        # K-MSA on windowed tokens
        xw = window_partition(xs, r)        # (bw, n, c)
        ew = window_partition(es, r)
        xn = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm_kernel")(xw)
        en = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm_enc")(ew)
        kw = KernelWindowAttention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="kernel_attn")(xn, en, train=train)
        kw = xw + drop_path(kw, deterministic=not train)
        if s > 0:
            # reference ``:214``: roll on (token, channel) of the token tensor
            kw = jnp.roll(kw, shift=(s, s), axis=(1, 2))
        y = window_reverse(kw, r, hp, wp)   # no spatial unshift (reference)

        # FFN1 on the full map
        yn = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm_ff1")(y)
        yn = SwinMLP(hidden_features=int(c * self.mlp_ratio),
                     drop_prob=self.drop_prob, dtype=self.dtype,
                     name="mlp1")(yn, train=train)
        y = y + drop_path(yn, deterministic=not train)

        # W-MSA / SW-MSA
        if s > 0:
            y = cyclic_shift(y, s)          # reference ``:222``: shifts AGAIN
        yw = window_partition(y, r)
        yn = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm_attn")(yw)
        aw = WindowAttention(
            num_heads=self.num_heads, window_size=r, qkv_bias=self.qkv_bias,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            dtype=self.dtype, name="attn")(yn, mask=mask, train=train)
        aw = yw + drop_path(aw, deterministic=not train)
        if s > 0:
            # reference ``:245``: the same (token, channel) roll
            aw = jnp.roll(aw, shift=(s, s), axis=(1, 2))
        y = window_reverse(aw, r, hp, wp)   # no spatial unshift (reference)

        # FFN2
        yn = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm_ff2")(y)
        yn = SwinMLP(hidden_features=int(c * self.mlp_ratio),
                     drop_prob=self.drop_prob, dtype=self.dtype,
                     name="mlp2")(yn, train=train)
        y = y + drop_path(yn, deterministic=not train)
        return y[:, :h, :w, :]


class PatchUnMerging(nn.Module):
    """Channel quarters -> 2x2 interleave + ConvBN d/4 -> d/2
    (reference ``:412-455``: x0->(0,0), x1->(1,0), x2->(0,1), x3->(1,1))."""

    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, h, w, d = x.shape
        g = x.reshape(b, h, w, 4, d // 4)
        g = g.reshape(b, h, w, 2, 2, d // 4)      # (..., col, row, c)
        g = g.transpose(0, 1, 4, 2, 3, 5)          # (b, h, row, w, col, c)
        y = g.reshape(b, 2 * h, 2 * w, d // 4)
        return ConvBN(d // 2, 3, bn_momentum=self.bn_momentum,
                      dtype=self.dtype, name="expansion")(y, train)


class KSATransformerRegDecoder(nn.Module):
    """Reference ``KSATransformerRegDecoder``
    (``oda2_ksa_decoder.py:458-612``): PPM at 1/32 + per-scale ConvBN
    laterals; 4 KSA stages coarse->fine (the coarsest is plain Swin blocks),
    PatchUnMerging between; ConvBN + 3x3 VALID conv head + sigmoid."""

    dec_dim: int
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    ppm_proj: int = 512  # fixed upstream (oda2_ksa_decoder.py:498-500)
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    path_drop_prob: float = 0.2
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_features, train: bool = False):
        e4, e8, e16, e32 = enc_features
        d = self.dec_dim
        nf = [d // 8, d // 4, d // 2, d]
        ck = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                  dtype=self.dtype)

        e32 = PyramidPoolingModule(proj_ch=self.ppm_proj, out_ch=d,
                                   bn_momentum=self.bn_momentum,
                                   bn_eps=self.bn_eps, dtype=self.dtype,
                                   name="ppm32")(e32, train=train)
        e16 = ConvBN(nf[2], 3, name="enc_conv16", **ck)(e16, train)
        e8 = ConvBN(nf[1], 3, name="enc_conv8", **ck)(e8, train)
        e4 = ConvBN(nf[0], 3, name="enc_conv4", **ck)(e4, train)

        total = sum(self.depths)
        pdp = [self.path_drop_prob * i / max(total - 1, 1)
               for i in range(total)]

        def stage(i_layer, xdec, enc_feat, train):
            use_ksa = i_layer < len(self.depths) - 1
            start = sum(self.depths[:i_layer])
            for j in range(self.depths[i_layer]):
                shift = 0 if j % 2 == 0 else self.window_size // 2
                common = dict(num_heads=self.num_heads[i_layer],
                              window_size=self.window_size, shift_size=shift,
                              attn_drop_prob=self.attn_drop_prob,
                              drop_prob=self.drop_prob,
                              path_drop_prob=pdp[start + j], dtype=self.dtype,
                              name=f"layers{i_layer}_blocks{j}")
                if use_ksa:
                    xdec = KSABlock(**common)(xdec, enc_feat, train=train)
                else:
                    xdec = SwinBlock(**common)(xdec, train=train)
            if i_layer > 0:
                xdec = PatchUnMerging(bn_momentum=self.bn_momentum,
                                      dtype=self.dtype,
                                      name=f"layers{i_layer}_up")(xdec, train)
            return xdec

        xdec = stage(3, e32, e32, train)          # 1/32 (plain Swin blocks)
        xdec = stage(2, xdec, e16, train)         # 1/16
        xdec = stage(1, xdec, e8, train)          # 1/8
        xdec = stage(0, xdec, e4, train)          # 1/4

        out_ch = min(nf[0], 128)
        out = ConvBN(out_ch, 3, name="dec_conv4", **ck)(xdec, train)
        out = nn.Conv(1, (3, 3), padding="VALID", dtype=self.dtype,
                      param_dtype=jnp.float32, name="out_conv")(out)
        return nn.sigmoid(jnp.asarray(out, jnp.float32))


class ODA2KSARegModel(nn.Module):
    dec_dim: int
    min_depth: float
    max_depth: float
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    dec_num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    encoder_type: str = "large"
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    path_drop_prob: float = 0.2
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    use_checkpoint: bool = True
    dtype: jnp.dtype = jnp.float32
    resize_to_multiple: bool = True
    encoder_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, h, w, _ = x.shape
        if self.resize_to_multiple:
            x = resize_bilinear(x, _resize_policy(h, w, self.max_depth),
                                align_corners=True)

        kwargs = dict(window_size=7, path_drop_prob=self.path_drop_prob,
                      use_checkpoint=self.use_checkpoint, dtype=self.dtype,
                      name="encoder")
        kwargs.update(self.encoder_kwargs or {})
        if self.encoder_type in ("base", "B"):
            enc = swin_base(**kwargs)
        elif self.encoder_type in ("large", "L"):
            enc = swin_large(**kwargs)
        else:
            enc = SwinTransformer(**kwargs)
        feats = enc(x, train=train)

        out = KSATransformerRegDecoder(
            dec_dim=self.dec_dim, depths=self.depths,
            num_heads=self.dec_num_heads, window_size=self.window_size,
            ppm_proj=min(512, self.dec_dim),
            drop_prob=self.drop_prob, attn_drop_prob=self.attn_drop_prob,
            path_drop_prob=self.path_drop_prob,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            dtype=self.dtype, name="decoder")(feats, train=train)
        out = out * (self.max_depth - self.min_depth) + self.min_depth
        return out, None

    @classmethod
    def build(cls, opt, min_depth, max_depth, **overrides):
        kwargs = dict(
            dec_dim=opt["dec_dim"],
            depths=tuple(opt.get("depths", (2, 2, 2, 2))),
            dec_num_heads=tuple(opt.get("dec_num_heads",
                                        opt.get("num_heads_list",
                                                (4, 8, 16, 32)))),
            window_size=opt.get("window_size", 7),
            min_depth=min_depth, max_depth=max_depth,
            encoder_type=opt.get("encoder_type", "large"),
            drop_prob=opt.get("drop_prob", 0.0),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            bn_momentum=opt.get("bn_momentum", 0.1),
            bn_eps=opt.get("bn_eps", 1e-5))
        kwargs.update(overrides)
        return cls(**kwargs)
