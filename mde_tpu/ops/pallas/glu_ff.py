"""Fused GLU gate + 5x5 depthwise conv + BN(inference) + GELU — Pallas TPU.

The DWConv-GLU feed-forward (reference ``PreNormDWConvFF``,
``oda2_red_order_reg_decoder.py:43-93``) is the flagship's dominant cost
(BASELINE.md: 18.7 ms x 6 instances at round-1 shapes). Between its two
projections sit four bandwidth-bound elementwise stages

    a, b = split(lin1(x));  g = a * sigmoid(b)          (GLU gate)
    y = dwconv5x5(g)                                    (replicate pad)
    y = bn(y); y = gelu(y)

that each round-trip a (B, 112, 224, 2048) activation through HBM. This
kernel computes all four in ONE pass over the lin1 output: the gate is
evaluated on replicate-padded tiles (elementwise ops commute with replicate
padding, so gate(pad(x)) == pad(gate(x))), the conv uses the same
halo-blocked accumulation as ``depthwise._kernel``, and the BN (folded to an
affine ``y*s + t`` — valid whenever BN normalizes with running stats, i.e.
eval mode or an active freeze_bn scope) and exact-erf GELU run as an f32
epilogue before the single output write.

Gradients: ``custom_vjp`` whose backward recomputes through the XLA
composite (gate -> shift-FMA conv -> affine -> GELU) — exact same math, so
frozen-BN *training* can also take the fused forward.

STATUS — measured on v5e (2026-08, flagship batch-8 inference): the fused
kernel REGRESSES end-to-end, 17.8 img/s vs 26.7 on the unfused path, despite
eliminating ~1.6 GB of elementwise HBM round-trips per FF. The VPU tap loop
over 2x input channels (gate half streams in too) plus the kw sublane
relayouts cost more than XLA's native grouped-conv pipeline saves — same
conclusion as the conv-only halo kernel in ``depthwise.py`` (10.6 vs 8.8 ms).
``PreNormDWConvFF`` therefore keeps this path opt-in (``ff_impl='pallas'``);
revisit if Mosaic grows a cheaper W-shift or a native depthwise primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_glu_dwconv_bn_gelu(ab: jnp.ndarray, w: jnp.ndarray,
                           scale: jnp.ndarray, shift: jnp.ndarray,
                           padding_mode: str = "edge") -> jnp.ndarray:
    """Unfused reference path (and the custom-vjp backward).

    ab: (B, H, W, 2C) lin1 output; w: (kh, kw, C); scale/shift: (C,) folded
    inference BN. Mirrors the module path exactly (gate in the input dtype,
    affine + GELU in f32)."""
    from .depthwise import xla_depthwise_conv2d
    a, b = jnp.split(ab, 2, axis=-1)
    g = a * jax.nn.sigmoid(b)
    y = xla_depthwise_conv2d(g, w, padding_mode)
    y = y.astype(jnp.float32) * scale + shift
    return jax.nn.gelu(y, approximate=False).astype(ab.dtype)


def _plan(h: int, w: int, c: int, kh: int, kw: int, itemsize: int):
    """-> (TH, TC): H-tile and channel-tile sizes (cf. ``depthwise._plan``;
    the input side is doubled — a and b halves stream in separately)."""
    tc = c if c < 128 else 128
    budget = int(9.5 * 1024 * 1024)
    wp = w + kw - 1
    hb = max(kh - 1, 1)
    top = -(-h // hb) * hb
    for th in range(top, 0, -hb):
        # IO blocks (double-buffered): a+b cur/halo in, out
        io = (2 * (th + hb) * wp + th * w) * tc * itemsize * 2
        # stack: a, b, gate (th+hb rows at padded width), tap partial t,
        # acc + shifted-slice temp, f32 epilogue y
        work = ((3 * (th + hb) + th) * wp + 2 * th * w) * tc * itemsize \
            + th * w * tc * 4
        if io + work <= budget:
            return th, tc
    return hb, tc


def _kernel(kh: int, kw: int, th: int, w_out: int,
            a_cur, a_nxt, b_cur, b_nxt, w_ref, s_ref, t_ref, o_ref):
    halo = kh - 1
    if halo:
        a = jnp.concatenate([a_cur[0], a_nxt[0]], axis=0)
        b = jnp.concatenate([b_cur[0], b_nxt[0]], axis=0)
    else:
        a, b = a_cur[0], b_cur[0]
    # sigmoid spelled out: Mosaic's `logistic` lowering broadcasts an f32
    # scalar into the result vector, which fails verification on bf16 tiles
    one = jnp.asarray(1.0, b.dtype)
    x = a * (one / (one + jnp.exp(-b)))      # (TH + kh - 1, W + kw - 1, TC)
    # conv accumulation: all kh H-taps (outer-dim slices, free) per column
    # offset j, then ONE shifted W-slice — kw sublane relayouts total (see
    # depthwise._kernel for the Mosaic rationale)
    dt = x.dtype
    w_all = w_ref[...].astype(dt)
    acc = jnp.zeros((th, w_out) + x.shape[2:], dt)
    for j in range(kw):
        t = jnp.zeros((th,) + x.shape[1:], dt)
        for i in range(kh):
            t = t + x[i:i + th] * w_all[i, j]
        acc = acc + t[:, j:j + w_out, :]
    y = acc.astype(jnp.float32) * s_ref[0] + t_ref[0]
    # erf-GELU. Mosaic lowers neither erf nor erfc, so evaluate erf with the
    # Abramowitz-Stegun 7.1.26 rational approximation (|eps| <= 1.5e-7 —
    # below the parity tests' 1e-5 tolerance and far below bf16 resolution);
    # the tanh-approximate GELU would deviate ~1e-3 from the module path.
    x = y * (2.0 ** -0.5)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    erf = jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))
    o_ref[0] = (0.5 * y * (1.0 + erf)).astype(o_ref.dtype)


def _kernel_roll(kh: int, kw: int, th: int, w_out: int,
                 a_cur, a_nxt, b_cur, b_nxt, w_ref, s_ref, t_ref, o_ref):
    """Same fusion, conv combine via ``pltpu.roll`` + aligned prefix slices
    (the structure that makes the dw tap-reduce kernel the fastest measured
    lowering — 6.2 ms vs 8.9 XLA at flagship shapes). The gate output is
    cast to f32 once (Mosaic's dynamic rotate needs 32-bit data); taps then
    accumulate in f32, feeding the BN/GELU epilogue directly."""
    halo = kh - 1
    if halo:
        a = jnp.concatenate([a_cur[0], a_nxt[0]], axis=0)
        b = jnp.concatenate([b_cur[0], b_nxt[0]], axis=0)
    else:
        a, b = a_cur[0], b_cur[0]
    one = jnp.asarray(1.0, b.dtype)
    x = a * (one / (one + jnp.exp(-b)))      # (TH + kh - 1, W + kw - 1, TC)
    x = x.astype(jnp.float32)
    w_all = w_ref[...].astype(jnp.float32)
    acc = jnp.zeros((th, w_out) + x.shape[2:], jnp.float32)
    for j in range(kw):
        xr = pltpu.roll(x, x.shape[1] - j, axis=1) if j else x
        for i in range(kh):
            acc = acc + xr[i:i + th, :w_out, :] * w_all[i, j]
    y = acc * s_ref[0] + t_ref[0]
    xg = y * (2.0 ** -0.5)
    ax = jnp.abs(xg)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    erf = jnp.sign(xg) * (1.0 - poly * jnp.exp(-ax * ax))
    o_ref[0] = (0.5 * y * (1.0 + erf)).astype(o_ref.dtype)


def _pallas_glu_ff(ab, w, scale, shift, interpret: bool) -> jnp.ndarray:
    import os
    from ..pad import pad2d
    bsz, h, wd, c2 = ab.shape
    c = c2 // 2
    kh, kw, _ = w.shape
    use_roll = os.environ.get("MDE_GLU_COMBINE", "roll") == "roll"
    # the roll combine casts the gate output to f32 in-kernel — plan with the
    # f32 working set so Mosaic's scoped-vmem limit holds
    itemsize = 4 if use_roll else jnp.dtype(ab.dtype).itemsize
    th, tc = _plan(h, wd, c, kh, kw, itemsize)
    nh = -(-h // th)

    # replicate-pad W and top in XLA; H's bottom out to one EXTRA tile so the
    # next-block halo read is always in bounds
    xp = pad2d(ab, kh // 2, kh // 2, kw // 2, kw // 2, mode="edge")
    h_pad = (nh + 1) * th
    xp = jnp.pad(xp, ((0, 0), (0, h_pad - xp.shape[1]), (0, 0), (0, 0)))
    wp = wd + kw - 1

    halo = kh - 1
    hb = max(halo, 1)
    pairs = th // hb
    nc = c // tc  # channel-block count; b-half blocks sit nc blocks later
    s2 = scale.astype(jnp.float32).reshape(1, c)
    t2 = shift.astype(jnp.float32).reshape(1, c)

    import os
    body = (_kernel_roll
            if os.environ.get("MDE_GLU_COMBINE", "roll") == "roll"
            else _kernel)
    grid = (bsz, nh, nc)
    return pl.pallas_call(
        functools.partial(body, kh, kw, th, wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, wp, tc), lambda bi, hi, ci: (bi, hi, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, wp, tc),
                         lambda bi, hi, ci: (bi, (hi + 1) * pairs, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, tc),
                         lambda bi, hi, ci: (bi, hi, 0, nc + ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, wp, tc),
                         lambda bi, hi, ci: (bi, (hi + 1) * pairs, 0, nc + ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, tc), lambda bi, hi, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda bi, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda bi, hi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wd, tc),
                               lambda bi, hi, ci: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nh * th, wd, c), ab.dtype),
        interpret=interpret,
    )(xp, xp, xp, xp, w, s2, t2)[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(ab, w, scale, shift, interpret):
    return _pallas_glu_ff(ab, w, scale, shift, interpret)


def _fused_fwd(ab, w, scale, shift, interpret):
    return _pallas_glu_ff(ab, w, scale, shift, interpret), \
        (ab, w, scale, shift)


def _composite_for_vjp(ab, w, scale, shift):
    """Backward-recompute composite. Uses the production depthwise dispatch
    (native grouped conv + hand-written split backward on TPU) — the
    shift-FMA composite OOMs at flagship shapes when XLA materializes its
    25 shifted slices under the transpose (measured: 37.6 GB requested)."""
    from ..depthwise import depthwise_conv2d
    a, b = jnp.split(ab, 2, axis=-1)
    g = a * jax.nn.sigmoid(b)
    y = depthwise_conv2d(g, w)
    y = y.astype(jnp.float32) * scale + shift
    return jax.nn.gelu(y, approximate=False).astype(ab.dtype)


def _fused_bwd(interpret, res, g):
    ab, w, scale, shift = res
    fn = xla_glu_dwconv_bn_gelu if interpret else _composite_for_vjp
    _, vjp = jax.vjp(fn, ab, w, scale, shift)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_glu_dwconv_bn_gelu(ab: jnp.ndarray, w: jnp.ndarray,
                             scale: jnp.ndarray, shift: jnp.ndarray,
                             impl: str = "pallas") -> jnp.ndarray:
    """gelu(dwconv(glu(ab)) * scale + shift) in one HBM pass.

    ab: (B, H, W, 2C) — lin1 output, first C channels the value half ``a``,
    last C the gate half ``b``; w: (kh, kw, C) depthwise taps; scale/shift:
    (C,) BN folded to inference affine."""
    c = ab.shape[-1] // 2
    if impl == "xla" or (c > 128 and c % 128 != 0):
        return xla_glu_dwconv_bn_gelu(ab, w, scale, shift)
    return _fused(ab, w, scale, shift, impl == "pallas_interpret")
