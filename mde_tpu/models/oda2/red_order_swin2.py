"""ODA2 ``oda2_red_order_swin2`` — the flagship model family (34 configs).

Behavioral reference: ``model/ODA2/oda2_red_order_swin2_decoder.py`` +
``oda2_red_order_swin2.py``. Ordered-depth iterative refinement: the head runs
``num_repeats`` rounds of {conv head -> 1ch logit -> sigmoid depth map;
quantize the logit into ``num_emb`` indices (no grad); run an ordered
shifted-window attention block whose logits are biased by the pairwise
relative depth indices}. All ``num_repeats + 1`` sigmoid maps are returned and
supervised; inference uses the last.

TPU-first notes: NHWC throughout (the reference permutes NCHW<->NHWC around
every conv/attention; here there are zero layout shuffles), neck upsampling is
matmul bilinear (align_corners=True), and the quantization is a
``stop_gradient`` + ``floor`` — trivially fused by XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import tnn

from ...ops.conv import ConvBN
from ...ops.mlp import PreNormDWConvFF
from ...ops.ordered_attention import PreNormOrderedSwinSA
from ...ops.remat import remat_policy
from ...ops.resize import resize_bilinear, upsample2d
from ...ops.init import trunc_normal_init
from ..swin import swin_base, swin_large, SwinTransformer

# Single source of truth for the head-repeat layout default (shared with the
# checkpoint converters so converted reference weights and config-built
# models always agree on the param tree); see ``core/layout.py``.
from ...core.layout import SCAN_REPEATS_DEFAULT  # noqa: E402  (re-exported)


class OrderedSwinBlock(nn.Module):
    """[ordered SA (shift 0) + DWConv-GLU FF] x [ordered SA (shift r/2) +
    DWConv-GLU FF] + Linear + LN (reference ``OrderedSwinBlock``,
    ``oda2_red_order_swin2_decoder.py:135-181``)."""

    num_heads: int
    num_emb: int
    window_size: int = 8
    feedforward_dims: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bias_type: str = "depth"
    bias_init: str = "linear"
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    return_weights: bool = False
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, indices: jnp.ndarray, train: bool = False):
        sa_kwargs = dict(
            num_heads=self.num_heads, num_emb=self.num_emb,
            window_size=self.window_size,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bias_type=self.bias_type, bias_init=self.bias_init,
            dtype=self.dtype, return_weights=self.return_weights,
        )
        ff_kwargs = dict(
            feedforward_dims=self.feedforward_dims, drop_prob=self.drop_prob,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps, dtype=self.dtype,
            tp_axis=self.tp_axis,
        )

        x, attn1 = PreNormOrderedSwinSA(shift_size=0, name="sa1", **sa_kwargs)(
            x, indices, train=train)
        x = PreNormDWConvFF(name="ff1", **ff_kwargs)(x, train=train)

        x, attn2 = PreNormOrderedSwinSA(shift_size=self.window_size // 2,
                                        name="sa2", **sa_kwargs)(x, indices, train=train)
        x = PreNormDWConvFF(name="ff2", **ff_kwargs)(x, train=train)

        c = x.shape[-1]
        x = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init(0.02), name="linear")(x)
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        return x, (attn1, attn2)


def _quantize_logit(logit: jnp.ndarray, num_emb: int) -> jnp.ndarray:
    """sigmoid(logit) -> [0, num_emb) index map, no grad (reference
    ``oda2_red_order_swin2_decoder.py:246-253``). The reference's
    floor(p*E - 1e-3) yields -1 for p < 7.8e-6, which torch index-wraps to
    the last table row; we clamp to 0 instead (in-range behavior identical).
    """
    p = jax.nn.sigmoid(jax.lax.stop_gradient(logit))
    idx = jnp.floor(p * num_emb - 1e-3)
    return jnp.clip(idx, 0, num_emb - 1).astype(jnp.int32)[..., 0]


class OrderedRepeatCell(nn.Module):
    """One head repeat — conv head (logit) + ordered Swin block — as the
    unit scanned by ``nn.scan`` (params gain a leading num_repeats axis).
    Matches the unrolled loop body in ``OrderedSwinRegHead`` exactly; names
    are index-free (``conv_0``/``conv_1``/``conv_out``/``attn``) since the
    repeat index rides the stacked-param axis instead."""

    num_heads: int
    num_emb: int
    window_size: int = 8
    feedforward_dims: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bias_type: str = "depth"
    bias_init: str = "linear"
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        in_dims = x.shape[-1]
        ck = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                  dtype=self.dtype)
        logit = ConvBN(in_dims // 4, 3, name="conv_0", **ck)(x, train)
        logit = ConvBN(in_dims // 4, 3, name="conv_1", **ck)(logit, train)
        logit = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_out")(logit)
        out = jax.nn.sigmoid(logit)

        indices = _quantize_logit(logit, self.num_emb)
        x, _ = OrderedSwinBlock(
            num_heads=self.num_heads, num_emb=self.num_emb,
            window_size=self.window_size,
            feedforward_dims=self.feedforward_dims,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            bias_type=self.bias_type, bias_init=self.bias_init,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            dtype=self.dtype, return_weights=False, tp_axis=self.tp_axis,
            name="attn",
        )(x, indices, train)
        return x, out


class OrderedSwinRegHead(nn.Module):
    """Iterative ordered refinement head (reference ``OrderedSwinRegHead``,
    ``oda2_red_order_swin2_decoder.py:184-281``).

    ``scan_repeats=True`` opts into running the repeats under ``nn.scan`` —
    ONE compiled repeat body instead of ``num_repeats`` unrolled ones (2
    ordered-attention Pallas call sites instead of 2x num_repeats; ~3x
    smaller head HLO on the slow remote-compile path), with per-repeat
    params stacked under ``repeat/``. The default is the UNROLLED layout
    (``SCAN_REPEATS_DEFAULT``) — measured 8% faster train step.
    ``return_weights`` forces the unrolled layout (the per-repeat attention
    maps are a debugging output)."""

    num_heads: int
    num_repeats: int
    num_emb: int = 128
    window_size: int = 8
    feedforward_dims: Optional[int] = None
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    output_scale: int = 4
    bias_type: str = "depth"
    bias_init: str = "linear"
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    return_weights: bool = False
    scan_repeats: bool = SCAN_REPEATS_DEFAULT
    tp_axis: Optional[str] = None

    def _conv_head(self, in_dims: int, index: int, upsample: bool):
        """ConvBN -> ConvBN -> 1x1 conv to one channel (logit)."""
        conv_kwargs = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                           dtype=self.dtype)

        def apply(x, train):
            if upsample:
                x = upsample2d(x, 2, align_corners=True)
            x = ConvBN(in_dims // 4, 3, name=f"conv{index}_0", **conv_kwargs)(x, train)
            x = ConvBN(in_dims // 4, 3, name=f"conv{index}_1", **conv_kwargs)(x, train)
            x = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{index}_out")(x)
            return x

        return apply

    def _logit_to_indices(self, logit: jnp.ndarray) -> jnp.ndarray:
        return _quantize_logit(logit, self.num_emb)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        in_dims = x.shape[-1]
        assert self.output_scale in (2, 4)

        if (self.scan_repeats and self.num_repeats >= 1
                and not self.return_weights):
            cell_cls = OrderedRepeatCell
            if self.use_checkpoint:
                cell_cls = nn.remat(OrderedRepeatCell, static_argnums=(2,),
                                    policy=remat_policy())
            scan_cls = nn.scan(
                cell_cls,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,),
                length=self.num_repeats,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            x, stacked = scan_cls(
                num_heads=self.num_heads, num_emb=self.num_emb,
                window_size=self.window_size,
                feedforward_dims=self.feedforward_dims,
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                bias_type=self.bias_type, bias_init=self.bias_init,
                bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                dtype=self.dtype, tp_axis=self.tp_axis, name="repeat",
            )(x, train)
            outs = [stacked[i] for i in range(self.num_repeats)]
            logit = self._conv_head(in_dims, self.num_repeats,
                                    upsample=self.output_scale == 2)(x, train)
            outs.append(jax.nn.sigmoid(logit))
            return tuple(outs), ()

        outs = []
        attn_weights = ()
        for i in range(self.num_repeats):
            logit = self._conv_head(in_dims, i, upsample=False)(x, train)
            outs.append(jax.nn.sigmoid(logit))

            indices = self._logit_to_indices(logit)
            # remat: recompute block activations in the backward pass — the
            # head runs at 1/4 resolution with 4x-expanded FFs, whose saved
            # intermediates otherwise dominate train-step HBM
            block_cls = (nn.remat(OrderedSwinBlock, static_argnums=(3,),
                                   policy=remat_policy())
                         if self.use_checkpoint else OrderedSwinBlock)
            x, aws = block_cls(
                num_heads=self.num_heads, num_emb=self.num_emb,
                window_size=self.window_size,
                feedforward_dims=self.feedforward_dims,
                attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
                bias_type=self.bias_type, bias_init=self.bias_init,
                bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                dtype=self.dtype, return_weights=self.return_weights,
                tp_axis=self.tp_axis,
                name=f"attn{i}",
            )(x, indices, train)
            attn_weights += aws

        logit = self._conv_head(in_dims, self.num_repeats,
                                upsample=self.output_scale == 2)(x, train)
        outs.append(jax.nn.sigmoid(logit))
        return tuple(outs), attn_weights


class OrderedSwin2RegDecoder(nn.Module):
    """Neck (red / fpn / segformer / red33 / red33r / red33res) + ordered head
    (reference ``OrderedSwin2RegDecoder``, ``oda2_red_order_swin2_decoder.py:284-580``)."""

    dec_dim: int = 512
    num_heads: int = 8
    num_repeats: int = 3
    num_emb: int = 128
    window_size: int = 8
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    output_scale: int = 4
    bias_type: str = "depth"
    bias_init: str = "linear"
    neck_type: str = "red"
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    return_weights: bool = False
    scan_repeats: bool = SCAN_REPEATS_DEFAULT
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, enc_features: Tuple[jnp.ndarray, ...], train: bool = False):
        e4, e8, e16, e32 = enc_features  # NHWC at strides 4/8/16/32
        dec_dim = self.dec_dim
        assert dec_dim % 4 == 0
        ck = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps, dtype=self.dtype)

        def conv_chain(x, chans, ks, prefix, train):
            for j, (ch, k) in enumerate(zip(chans, ks)):
                x = ConvBN(ch, k, name=f"{prefix}_{j}", **ck)(x, train)
            return x

        if self.neck_type == "red":
            # per-scale: 3x ConvBN to dec_dim//4, then upsample to 1/4 scale
            e32 = conv_chain(e32, (e32.shape[-1], dec_dim // 4, dec_dim // 4),
                             (3, 3, 3), "enc_conv32", train)
            e32 = upsample2d(e32, 8)
            e16 = conv_chain(e16, (e16.shape[-1], dec_dim // 4, dec_dim // 4),
                             (3, 3, 3), "enc_conv16", train)
            e16 = upsample2d(e16, 4)
            e8 = conv_chain(e8, (e8.shape[-1], dec_dim // 4, dec_dim // 4),
                            (3, 3, 3), "enc_conv8", train)
            e8 = upsample2d(e8, 2)
            e4 = conv_chain(e4, (e4.shape[-1], dec_dim // 4, dec_dim // 4),
                            (3, 3, 3), "enc_conv4", train)
            dec = jnp.concatenate([e4, e8, e16, e32], axis=-1)

        elif self.neck_type == "fpn":
            e32 = conv_chain(e32, (dec_dim, dec_dim), (3, 3), "enc_conv32", train)
            e32 = upsample2d(e32, 2)
            e16 = conv_chain(jnp.concatenate([e16, e32], axis=-1),
                             (dec_dim, dec_dim), (3, 3), "enc_conv16", train)
            e16 = upsample2d(e16, 2)
            e8 = conv_chain(jnp.concatenate([e8, e16], axis=-1),
                            (dec_dim, dec_dim), (3, 3), "enc_conv8", train)
            e8 = upsample2d(e8, 2)
            dec = conv_chain(jnp.concatenate([e4, e8], axis=-1),
                             (dec_dim, dec_dim), (3, 3), "enc_conv4", train)

        elif self.neck_type == "segformer":
            outs = []
            for name, feat, scale in (("enc_conv32", e32, 8), ("enc_conv16", e16, 4),
                                      ("enc_conv8", e8, 2), ("enc_conv4", e4, 1)):
                y = nn.Conv(dec_dim, (1, 1), use_bias=True, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)(feat)
                if scale > 1:
                    y = upsample2d(y, scale)
                outs.append(y)
            dec = jnp.concatenate(outs[::-1], axis=-1)  # [e4, e8, e16, e32]
            dec = ConvBN(dec_dim, 1, name="enc_fuse", **ck)(dec, train)

        elif self.neck_type in ("red33", "red33r"):
            outs = []
            for name, feat, scale in (("enc_conv32", e32, 8), ("enc_conv16", e16, 4),
                                      ("enc_conv8", e8, 2), ("enc_conv4", e4, 1)):
                ch = dec_dim if self.neck_type == "red33" else min(feat.shape[-1], dec_dim)
                y = conv_chain(feat, (ch, ch), (3, 3), name, train)
                if scale > 1:
                    y = upsample2d(y, scale)
                outs.append(y)
            dec = jnp.concatenate(outs[::-1], axis=-1)
            dec = ConvBN(dec_dim, 1, name="enc_fuse", **ck)(dec, train)

        elif self.neck_type == "red33res":
            outs = []
            for name, feat, scale in (("enc_conv32", e32, 8), ("enc_conv16", e16, 4),
                                      ("enc_conv8", e8, 2), ("enc_conv4", e4, 1)):
                res = ConvBN(dec_dim, 1, name=f"{name}_res", **ck)(feat, train)
                y = conv_chain(feat, (dec_dim, dec_dim), (3, 3), name, train)
                y = y + res
                if scale > 1:
                    y = upsample2d(y, scale)
                outs.append(y)
            dec = jnp.concatenate(outs[::-1], axis=-1)
            dec = ConvBN(dec_dim, 1, name="enc_fuse", **ck)(dec, train)

        else:
            raise ValueError(f"Unsupported neck type {self.neck_type}.")

        dec = nn.Dense(dec_dim, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init(0.02), name="dec_linear")(dec)
        dec = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                           name="dec_norm")(dec)

        return OrderedSwinRegHead(
            num_heads=self.num_heads, num_repeats=self.num_repeats,
            num_emb=self.num_emb, window_size=self.window_size,
            attn_drop_prob=self.attn_drop_prob, drop_prob=self.drop_prob,
            output_scale=self.output_scale, bias_type=self.bias_type,
            bias_init=self.bias_init, bn_momentum=self.bn_momentum,
            bn_eps=self.bn_eps, use_checkpoint=self.use_checkpoint,
            dtype=self.dtype, return_weights=self.return_weights,
            scan_repeats=self.scan_repeats, tp_axis=self.tp_axis,
            name="reducer",
        )(dec, train=train)


def _resize_policy(h: int, w: int, max_depth: float) -> Tuple[int, int]:
    """Input resize heuristic (reference ``oda2_red_order_swin2.py:64-88``):
    KITTI train (352,704)->(448,896), test (352,1216)->(448,1536);
    NYU (480,640)/(448,608)->(448,672). Other shapes fall back to rounding
    each side to a multiple of 224 preserving the reference's intent."""
    known = {
        (352, 704): (448, 896),
        (352, 1216): (448, 1536),
        (480, 640): (448, 672),
        (448, 608): (448, 672),
    }
    if (h, w) in known:
        return known[(h, w)]
    if max_depth > 40:  # kitti-like: ceil
        return (max(224, -(-h // 224) * 224), max(224, -(-w // 224) * 224))
    # nyu-like: round
    return (max(224, round(h / 224) * 224), max(224, round(w / 224) * 224))


class ODA2OrderedSwin2RegModel(nn.Module):
    """Flagship model wrapper (reference ``ODA2OrderedSwin2RegModel``,
    ``oda2_red_order_swin2.py:11-124``)."""

    dec_dim: int
    min_depth: float
    max_depth: float
    num_heads: int
    num_repeats: int
    num_emb: int
    window_size: int = 8
    encoder_type: str = "large"
    output_scale: int = 4
    drop_prob: float = 0.0
    attn_drop_prob: float = 0.0
    bias_type: str = "depth"
    bias_init: str = "linear"
    neck_type: str = "red"
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    use_checkpoint: bool = True
    path_drop_prob: float = 0.2
    dtype: jnp.dtype = jnp.float32
    return_weights: bool = False
    scan_repeats: bool = SCAN_REPEATS_DEFAULT
    tp_axis: Optional[str] = None
    # test-size override for tiny configs (tests / dryrun): skip 224-multiple resize
    resize_to_multiple: bool = True
    encoder_kwargs: Optional[dict] = None

    def _build_encoder(self) -> SwinTransformer:
        kwargs = dict(
            window_size=7, drop_prob=0.0, attn_drop_prob=0.0,
            path_drop_prob=self.path_drop_prob,
            use_checkpoint=self.use_checkpoint, dtype=self.dtype, name="encoder",
        )
        kwargs.update(self.encoder_kwargs or {})
        if self.encoder_type in ("base", "B"):
            return swin_base(**kwargs)
        if self.encoder_type in ("large", "L"):
            return swin_large(**kwargs)
        if self.encoder_type == "custom":
            return SwinTransformer(**kwargs)
        raise ValueError(f"Unsupported encoder type {self.encoder_type}.")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, h, w, _ = x.shape
        if self.resize_to_multiple:
            new_h, new_w = _resize_policy(h, w, self.max_depth)
            x = resize_bilinear(x, (new_h, new_w), align_corners=True)

        features = self._build_encoder()(x, train=train)

        outs, attn_weights = OrderedSwin2RegDecoder(
            dec_dim=self.dec_dim, num_heads=self.num_heads,
            num_repeats=self.num_repeats, num_emb=self.num_emb,
            window_size=self.window_size, attn_drop_prob=self.attn_drop_prob,
            drop_prob=self.drop_prob, output_scale=self.output_scale,
            bias_type=self.bias_type, bias_init=self.bias_init,
            neck_type=self.neck_type, bn_momentum=self.bn_momentum,
            bn_eps=self.bn_eps, use_checkpoint=self.use_checkpoint,
            dtype=self.dtype, return_weights=self.return_weights,
            scan_repeats=self.scan_repeats, tp_axis=self.tp_axis,
            name="decoder",
        )(features, train=train)

        outs = tuple(jnp.asarray(o, jnp.float32) * self.max_depth for o in outs)
        out = outs[-1]  # inference output = last refinement
        return out, outs, attn_weights

    @classmethod
    def build(cls, opt, min_depth: float, max_depth: float, **overrides):
        """Construct from a config ``model`` section (reference ``build``,
        ``oda2_red_order_swin2.py:98-118``)."""
        kwargs = dict(
            dec_dim=opt["dec_dim"],
            num_heads=opt["num_heads"],
            num_repeats=opt["num_repeats"],
            num_emb=opt["num_emb"],
            window_size=opt.get("window_size", 8),
            min_depth=min_depth,
            max_depth=max_depth,
            encoder_type=opt["encoder_type"],
            output_scale=opt.get("output_scale", 4),
            drop_prob=opt.get("drop_prob", 0.0),
            attn_drop_prob=opt.get("attn_drop_prob", 0.0),
            bias_type=opt.get("bias_type", "depth"),
            bias_init=opt.get("bias_init", "linear"),
            neck_type=opt.get("neck_type", "red"),
            bn_momentum=opt.get("bn_momentum", 0.1),
            bn_eps=opt.get("bn_eps", 1e-5),
            # config default: UNROLLED repeats — measured 8% faster train
            # step than the nn.scan layout (635.8 vs 687.6 ms at flagship
            # batch 4; nn.scan re-loads the stacked params each iteration
            # and blocks cross-repeat scheduling). scan_repeats=true opts
            # back into the ~3x-smaller head HLO when compile time matters.
            scan_repeats=opt.get("scan_repeats", SCAN_REPEATS_DEFAULT),
            # optional tensor-parallel mesh axis for the FF hot path
            # (beyond-reference scaling; see PreNormDWConvFF.tp_axis)
            tp_axis=opt.get("tp_axis", None),
        )
        kwargs.update(overrides)
        return cls(**kwargs)
