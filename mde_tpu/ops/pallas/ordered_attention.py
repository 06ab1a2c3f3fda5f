"""Fused ordered depth-bias window attention — Pallas TPU kernel.

The flagship decoder op (reference
``model/ODA2/oda2_red_order_swin2_decoder.py:87-119``): window self-attention
whose logits receive a learned per-head bias indexed by the pairwise
difference of quantized depth indices, ``bias[q,k,h] = T[i_q - i_k + E-1, h]``
with ``T`` of shape ``(2E-1, heads)``.

XLA lowers that lookup to a gather producing a ``(B*nW, N, N, heads)`` HBM
tensor (≈100 MB at bench shapes) before the logits add. Mosaic has no dynamic
VMEM gather, so the kernel reformulates the lookup as MXU matmuls over
one-hot index encodings:

    M[a, h*E + b] = T[a - b + E - 1, h]          (Toeplitz expansion, XLA,
                                                  (E, heads*E), built per call)
    G   = onehot(i_q) @ M                        -> (TB, N, heads*E)   row gather
    B_h = G[:, :, h*E:(h+1)*E] @ onehot(i_k)^T   -> (TB, N, N)      column gather

Both matmuls run in f32 so the selected table entries are bit-exact with the
XLA gather. Attention itself (QK^T, PV) stays in the input dtype with f32
accumulation. No (.., N, N, heads) tensor ever leaves VMEM.

When the window block is exactly one lane tile (N == E == 128, the packed
flagship shape), the kernel skips the Toeplitz matmuls entirely and uses
Mosaic's dynamic lane gather (``jnp.take_along_axis`` along the minor dim,
equal 128x128 shapes — the only form the compiler accepts): the bias table is
split at entry E-1 into two 128-entry halves, each (N, N) relative-index map
gathers from a broadcast table row, and a ``where(rel < E)`` stitches the
halves. That converts the N*E*E + N*N*E one-hot MACs per head (~4x the
attention dots' FLOPs) into a handful of VPU shuffles. Selected entries stay
bit-exact (pure f32 lane moves). ``MDE_ORDERED_GATHER=0`` restores the
one-hot path.

Gradients: ``custom_vjp`` with a fused Pallas backward. Scores/probabilities
(including the one-hot bias lookup) are recomputed per window block in VMEM,
``dS = P*(dP - rowsum(dP*P))`` yields dq/dk/dv via MXU dots, and the bias-
table gradient rides the Toeplitz trick transposed:

    dM_h = sum_t oh_q[t]^T @ dS_h[t] @ oh_k[t]   (accumulated across grid
                                                  steps in a revisited block)
    dT[r, h] = sum_{a-b+E-1 = r} dM[a, h*E + b]  (tiny XLA segment-sum)

No (.., N, N, heads) tensor touches HBM in either direction.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import _pick_tb

# Read once at import: the custom_vjp forward and backward trace
# independently, so a per-trace env read could silently pair a gather forward
# with a one-hot backward (benign — both bit-exact — but implicit).
_ENV_ORDERED_GATHER = os.environ.get("MDE_ORDERED_GATHER", "1") != "0"
_ENV_ORDERED_PACK = os.environ.get("MDE_ORDERED_PACK", "1") != "0"


def toeplitz_bias_matrix(table: jnp.ndarray, num_emb: int) -> jnp.ndarray:
    """(2E-1, heads) bias table -> (E, heads*E) Toeplitz expansion.

    M[a, h*E + b] = table[a - b + E - 1, h]. Constant-index gather, built
    once per call in XLA (≈1 MB at E=128); negligible next to one attention
    layer.
    """
    e = num_emb
    nh = table.shape[1]
    a = jnp.arange(e)[:, None]
    b = jnp.arange(e)[None, :]
    rel = a - b + (e - 1)                       # (E, E) in [0, 2E-2]
    m = jnp.take(table, rel, axis=0)            # (E, E, heads)
    m = jnp.transpose(m, (0, 2, 1))             # (E, heads, E)
    return m.reshape(e, nh * e)


def xla_ordered_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          idx: jnp.ndarray, table: Optional[jnp.ndarray],
                          num_heads: int, scale: float,
                          num_emb: int) -> jnp.ndarray:
    """Reference einsum+gather path (and the custom-vjp backward)."""
    bw, n, c = q.shape
    nh = num_heads
    hd = c // nh
    qh = q.reshape(bw, n, nh, hd)
    kh = k.reshape(bw, n, nh, hd)
    vh = v.reshape(bw, n, nh, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
    attn = attn * scale
    if table is not None:
        rel = idx[:, :, None] - idx[:, None, :] + (num_emb - 1)  # (BW, N, N)
        # gather with N as the minor dim: a (BW, N, N, heads) layout pads the
        # 8-head lane dim 16x on TPU (5.7 GB of padding at train shapes)
        de = jnp.take(table.T, rel, axis=1)                      # (nh, BW, N, N)
        attn = attn + de.transpose(1, 0, 2, 3).astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
    return out.reshape(bw, n, c)


def _cross_window_kill(n: int, pack: int) -> Optional[jnp.ndarray]:
    """(N, N) additive f32 mask killing logits between the `pack` windows
    sharing one attention instance (Swin's -100 convention; cross leakage
    through softmax is ~e^-100, below f32 resolution). None when pack == 1."""
    if pack <= 1:
        return None
    n0 = n // pack
    iq = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // n0
    ik = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // n0
    return jnp.where(iq == ik, 0.0, -100.0).astype(jnp.float32)


def split_bias_table(table: jnp.ndarray, num_emb: int) -> jnp.ndarray:
    """(2E-1, heads) table -> (2*heads, E) halves for the lane-gather path.

    Row h is T[0:E, h] (rel in [0, E-1]); row heads+h is T[E-1:, h]
    (rel-(E-1) in [0, E-1]); the shared entry E-1 makes the halves agree at
    the stitch point.
    """
    e = num_emb
    return jnp.concatenate([table[:e].T, table[e - 1:].T], axis=0)


def _gather_maps(idx: jnp.ndarray, e: int):
    """Per-window (rel, lo, hi) index maps for the lane-gather bias path,
    hoisted out of the per-head loop (they depend only on the indices; built
    once per grid step instead of nh x TB times)."""
    return [
        (rel, jnp.minimum(rel, e - 1), jnp.maximum(rel - (e - 1), 0))
        for rel in (idx[t][:, None] - idx[t][None, :] + (e - 1)
                    for t in range(idx.shape[0]))
    ]


def _gathered_bias(maps_t, tlo_h: jnp.ndarray, thi_h: jnp.ndarray,
                   e: int) -> jnp.ndarray:
    """(N, N) index maps -> (N, N) f32 bias via two lane gathers.

    Requires N == e == 128 (Mosaic's dynamic gather only lowers equal-shape
    2D minor-dim gathers within one 128-lane tile).
    """
    rel, lo, hi = maps_t
    n = rel.shape[0]
    blo = jnp.take_along_axis(
        jnp.broadcast_to(tlo_h[None, :], (n, e)), lo, axis=-1)
    bhi = jnp.take_along_axis(
        jnp.broadcast_to(thi_h[None, :], (n, e)), hi, axis=-1)
    return jnp.where(rel < e, blo, bhi)


def _kernel(num_heads: int, scale: float, num_emb: int, has_bias: bool,
            pack: int, use_gather: bool, *refs):
    if has_bias:
        q_ref, k_ref, v_ref, i_ref, m_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        i_ref = m_ref = None

    q = q_ref[:]  # (TB, N, C)
    k = k_ref[:]
    v = v_ref[:]
    tb, n, c = q.shape
    nh = num_heads
    hd = c // nh
    e = num_emb

    # Precision policy (measured, see BASELINE.md): f32 inputs take
    # full-precision MXU passes everywhere — the default single pass rounds
    # f32 operands to bf16, costing 1e-2 deviations vs the XLA path, and the
    # one-hot gathers must select table entries exactly for the f32 parity
    # tests. bf16 production inputs keep DEFAULT single passes on every dot:
    # Mosaic rejects HIGHEST on bf16 operands ("Bad lhs type"), and the
    # gathers dominate this kernel's FLOPs (N*E vs N*hd contractions — ~4x
    # the attention dots), so tripling their passes costs ~6% end-to-end
    # while the ~0.4% bf16 table rounding is below the bf16 noise floor of
    # the surrounding compute.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    gmaps = None
    if m_ref is not None:
        idx = i_ref[:, 0, :]                             # (TB, N) int32; the
        # (TB, 1, N) block layout keeps N on the lane dim so TB is not
        # pinned to sublane multiples (a (TB, N) int32 block needs TB % 8)
        oh_q = oh_kt = g = None
        if use_gather:
            gmaps = _gather_maps(idx, e)
        if not use_gather:
            iota_qe = jax.lax.broadcasted_iota(jnp.int32, (tb, n, e), 2)
            oh_q = (idx[:, :, None] == iota_qe).astype(jnp.float32)  # (TB,N,E)
            iota_ek = jax.lax.broadcasted_iota(jnp.int32, (tb, e, n), 1)
            oh_kt = (iota_ek == idx[:, None, :]).astype(jnp.float32)  # (TB,E,N)
            # row gather: G[t, q, h*E + b] = T[i_q - b + E - 1, h]. Packed
            # blocks (2N tokens) gather per head inside the loop instead — the
            # full (TB, N, nh*E) f32 precompute is what pushes the packed
            # working set past the 16 MB scoped-vmem limit.
            if pack == 1:
                g = jax.lax.dot_general(
                    oh_q, m_ref[:], (((2,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)  # (TB, N, nh*E)
    else:
        idx = oh_q = oh_kt = g = None

    q = q * jnp.asarray(scale, q.dtype)
    kill = _cross_window_kill(n, pack)
    qk_dims = (((2,), (2,)), ((0,), (0,)))
    bias_dims = (((2,), (1,)), ((0,), (0,)))
    pv_dims = (((2,), (1,)), ((0,), (0,)))
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(q[:, :, sl], k[:, :, sl], qk_dims,
                                precision=prec,
                                preferred_element_type=jnp.float32)
        if kill is not None:
            s = s + kill[None]
        if m_ref is not None and use_gather:
            tlo_h = m_ref[h]                             # (E,) f32
            thi_h = m_ref[nh + h]
            bias = jnp.stack([_gathered_bias(gmaps[t], tlo_h, thi_h, e)
                              for t in range(tb)])       # (TB, N, N)
            s = s + bias
        elif oh_q is not None:
            g_h = g[:, :, h * e:(h + 1) * e] if g is not None else \
                jax.lax.dot_general(
                    oh_q, m_ref[:, h * e:(h + 1) * e], (((2,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)  # (TB, N, E)
            # column gather: bias[t, q, k'] = G[t, q, i_k'] (head h slab)
            bias = jax.lax.dot_general(
                g_h, oh_kt, bias_dims,
                precision=prec,
                preferred_element_type=jnp.float32)      # (TB, N, N)
            s = s + bias
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(p, v[:, :, sl], pv_dims,
                                precision=prec,
                                preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _use_gather_bias(n: int, num_emb: int) -> bool:
    """Lane-gather bias path: only the equal-shape 128-lane 2D gather lowers
    (probed on-chip; 256-lane, bf16, and mismatched shapes crash Mosaic)."""
    return n == 128 and num_emb == 128 and _ENV_ORDERED_GATHER


def _pallas_ordered_attention(q, k, v, idx, table, num_heads, scale, num_emb,
                              pack: int, interpret: bool) -> jnp.ndarray:
    bw, n, c = q.shape
    itemsize = jnp.dtype(q.dtype).itemsize
    has_bias = table is not None
    use_gather = has_bias and _use_gather_bias(n, num_emb)
    # 4 double-buffered IO blocks + bias working set + scores/probs
    if use_gather:
        bias_ws = 4 * n * n * 4          # rel/lo/hi index maps + bias, f32
    elif has_bias:
        bias_ws = n * num_heads * num_emb * 4 + 2 * n * num_emb * 4
    else:
        bias_ws = 0
    per_window = 4 * n * c * itemsize * 2 + bias_ws + 2 * n * n * 4
    tb = _pick_tb(bw, None, per_window)
    grid = (bw // tb,)

    def blk(shape):
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [blk((tb, n, c)), blk((tb, n, c)), blk((tb, n, c))]
    args = [q, k, v]
    if has_bias:
        if use_gather:
            m_all = split_bias_table(table.astype(jnp.float32), num_emb)
        else:
            m_all = toeplitz_bias_matrix(table.astype(jnp.float32), num_emb)
        in_specs.append(blk((tb, 1, n)))
        in_specs.append(pl.BlockSpec(m_all.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args += [idx.astype(jnp.int32).reshape(bw, 1, n), m_all]

    kernel = functools.partial(_kernel, num_heads, float(scale), num_emb,
                               has_bias, pack, use_gather)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=blk((tb, n, c)),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), q.dtype),
        interpret=interpret,
    )(*args)


def _bwd_kernel(num_heads: int, scale: float, num_emb: int, has_bias: bool,
                pack: int, use_gather: bool, *refs):
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref = next(it), next(it), next(it), next(it)
    i_ref = next(it) if has_bias else None
    m_ref = next(it) if has_bias else None
    dq_ref, dk_ref, dv_ref = next(it), next(it), next(it)
    dm_ref = next(it) if has_bias else None

    q = q_ref[:]  # (TB, N, C)
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    tb, n, c = q.shape
    nh = num_heads
    hd = c // nh
    e = num_emb

    gmaps = None
    if m_ref is not None:
        idx = i_ref[:, 0, :]                             # (TB, N) int32; the
        # (TB, 1, N) block layout keeps N on the lane dim so TB is not
        # pinned to sublane multiples (a (TB, N) int32 block needs TB % 8)
        iota_qe = jax.lax.broadcasted_iota(jnp.int32, (tb, n, e), 2)
        oh_q = (idx[:, :, None] == iota_qe).astype(jnp.float32)   # (TB, N, E)
        iota_ek = jax.lax.broadcasted_iota(jnp.int32, (tb, e, n), 1)
        oh_kt = (iota_ek == idx[:, None, :]).astype(jnp.float32)  # (TB, E, N)
        if use_gather:
            gmaps = _gather_maps(idx, e)

        @pl.when(pl.program_id(0) == 0)
        def _():
            dm_ref[:] = jnp.zeros_like(dm_ref)
    else:
        oh_q = oh_kt = None

    qs = q * jnp.asarray(scale, q.dtype)
    kill = _cross_window_kill(n, pack)
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    qk_dims = (((2,), (2,)), ((0,), (0,)))   # contract minor dim -> (TB, N, N)
    bias_dims = (((2,), (1,)), ((0,), (0,)))
    row_dims = (((1,), (1,)), ((0,), (0,)))  # contract query dim -> (TB, Nk, hd)
    col_dims = (((2,), (1,)), ((0,), (0,)))  # contract key dim   -> (TB, Nq, hd)
    flat_dims = (((0,), (0,)), ((), ()))     # contract TB*N      -> (E, E)
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(qs[:, :, sl], k[:, :, sl], qk_dims,
                                precision=prec,
                                preferred_element_type=jnp.float32)
        if kill is not None:
            s = s + kill[None]
        if oh_q is not None:
            if use_gather:
                bias = jnp.stack([_gathered_bias(gmaps[t], m_ref[h],
                                                 m_ref[nh + h], e)
                                  for t in range(tb)])   # (TB, N, N) f32
            else:
                # per-head row gather (vs one (TB, N, nh*E) precompute):
                # keeps the working set under the TB >= 8 block floor
                g_h = jax.lax.dot_general(
                    oh_q, m_ref[:, h * e:(h + 1) * e],
                    (((2,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)  # (TB, N, E)
                bias = jax.lax.dot_general(g_h, oh_kt, bias_dims,
                                           precision=prec,
                                           preferred_element_type=jnp.float32)
            s = s + bias
        p = jax.nn.softmax(s, axis=-1)                   # f32 (TB, N, N)
        dp = jax.lax.dot_general(do[:, :, sl], v[:, :, sl], qk_dims,
                                 precision=prec,
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        p_lo = p.astype(do.dtype)
        ds_lo = ds.astype(q.dtype)
        dv = jax.lax.dot_general(p_lo, do[:, :, sl], row_dims,
                                 precision=prec,
                                 preferred_element_type=jnp.float32)
        dq = jax.lax.dot_general(ds_lo, k[:, :, sl], col_dims,
                                 precision=prec,
                                 preferred_element_type=jnp.float32)
        dq = dq * jnp.asarray(scale, jnp.float32)
        dk = jax.lax.dot_general(ds_lo, qs[:, :, sl], row_dims,
                                 precision=prec,
                                 preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)
        if dm_ref is not None:
            # dM_h[a, b] = sum_{t,q,k: i_q=a, i_k=b} dS_h[t,q,k]
            # z[t, q, b] = sum_k dS[t, q, k] * [idx_k[t, k] == b]
            z = jax.lax.dot_general(ds, oh_kt, qk_dims,
                                    precision=prec,
                                    preferred_element_type=jnp.float32)
            # flatten (TB, N) into one contraction: Mosaic only lowers plain /
            # single-batch matmuls, not multi-dim contractions
            dm_h = jax.lax.dot_general(oh_q.reshape(tb * n, e),
                                       z.reshape(tb * n, e), flat_dims,
                                       precision=prec,
                                       preferred_element_type=jnp.float32)
            dm_ref[:, h * e:(h + 1) * e] += dm_h


def _pallas_ordered_attention_bwd(q, k, v, do, idx, table, num_heads, scale,
                                  num_emb, pack: int, interpret: bool):
    bw, n, c = q.shape
    itemsize = jnp.dtype(q.dtype).itemsize
    nh = num_heads
    e = num_emb
    has_bias = table is not None
    use_gather = has_bias and _use_gather_bias(n, e)
    if use_gather:
        # one-hots + z survive for the dM matmuls; the bias recompute adds
        # the rel/lo/hi maps instead of the row-gather G
        bias_ws = 3 * n * e * 4 + 3 * n * n * 4
    elif has_bias:
        bias_ws = 4 * n * e * 4
    else:
        bias_ws = 0
    per_window = 7 * n * c * itemsize * 2 + 5 * n * n * 4 + bias_ws
    shared = (2 * e * nh * e * 4) if has_bias else 0
    tb = _pick_tb(bw, None, per_window, budget=8 * 1024 * 1024 - shared)
    grid = (bw // tb,)

    def blk(shape):
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [blk((tb, n, c))] * 4
    args = [q, k, v, do]
    if has_bias:
        if use_gather:
            m_all = split_bias_table(table.astype(jnp.float32), num_emb)
        else:
            m_all = toeplitz_bias_matrix(table.astype(jnp.float32), num_emb)
        in_specs.append(blk((tb, 1, n)))
        in_specs.append(pl.BlockSpec(m_all.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args += [idx.astype(jnp.int32).reshape(bw, 1, n), m_all]

    out_shape = [jax.ShapeDtypeStruct((bw, n, c), q.dtype)] * 3
    out_specs = [blk((tb, n, c)) for _ in range(3)]
    if has_bias:
        out_shape.append(jax.ShapeDtypeStruct((e, nh * e), jnp.float32))
        out_specs.append(pl.BlockSpec((e, nh * e), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(_bwd_kernel, nh, float(scale), e, has_bias,
                               pack, use_gather)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
    dq, dk, dv = outs[:3]
    if not has_bias:
        return dq, dk, dv, None

    # fold dM (E, nh*E) back onto the (2E-1, nh) table: dT[a-b+E-1, h] +=
    # dM[a, h*E + b] — tiny, XLA
    dm = outs[3].reshape(e, nh, e).transpose(0, 2, 1).reshape(e * e, nh)
    rel = (jnp.arange(e)[:, None] - jnp.arange(e)[None, :] + e - 1).ravel()
    dt = jax.ops.segment_sum(dm, rel, num_segments=2 * e - 1)
    return dq, dk, dv, dt.astype(table.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused(q, k, v, idx, table, num_heads, scale, num_emb, pack, interpret):
    return _pallas_ordered_attention(q, k, v, idx, table, num_heads, scale,
                                     num_emb, pack, interpret)


def _fused_fwd(q, k, v, idx, table, num_heads, scale, num_emb, pack,
               interpret):
    out = _pallas_ordered_attention(q, k, v, idx, table, num_heads, scale,
                                    num_emb, pack, interpret)
    return out, (q, k, v, idx, table)


def _fused_bwd(num_heads, scale, num_emb, pack, interpret, res, g):
    q, k, v, idx, table = res
    gather_packed = (pack > 1 and table is not None
                     and _use_gather_bias(q.shape[1], num_emb))
    if pack > 1 and not gather_packed:
        # run the backward UNPACKED: the packed forward is mathematically
        # per-window attention (cross logits killed), so per-window
        # gradients are identical — and the packed (TB, 2N, ...) one-hot
        # backward blocks blow the 16 MB scoped-vmem limit (measured
        # 33.8 MB at TB=8, N=128), while the unpacked profile is proven.
        # With the lane-gather bias recompute the packed footprint fits, so
        # that path stays packed (cross-pair softmax mass is ~e^-100 —
        # subnormal f32 — so its dT/dq/dk/dv contribution is lost below
        # resolution, same argument as the packed forward).
        bw, n, c = q.shape
        shp = (bw * pack, n // pack)
        dq, dk, dv, dt = _pallas_ordered_attention_bwd(
            q.reshape(shp + (c,)), k.reshape(shp + (c,)),
            v.reshape(shp + (c,)), g.reshape(shp + (c,)),
            idx.reshape(shp), table, num_heads, scale, num_emb, 1,
            interpret)
        return (dq.reshape(bw, n, c), dk.reshape(bw, n, c),
                dv.reshape(bw, n, c), None, dt)
    dq, dk, dv, dt = _pallas_ordered_attention_bwd(
        q, k, v, g, idx, table, num_heads, scale, num_emb, pack, interpret)
    return dq, dk, dv, None, dt


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ordered_window_attention(q: jnp.ndarray, k: jnp.ndarray,
                                   v: jnp.ndarray, idx: jnp.ndarray,
                                   table: Optional[jnp.ndarray],
                                   num_heads: int, scale: float,
                                   num_emb: int,
                                   impl: str = "pallas") -> jnp.ndarray:
    """Ordered window MHA over (B*nW, N, C) q/k/v.

    idx: (B*nW, N) int32 quantized depth indices in [0, num_emb).
    table: optional (2*num_emb-1, heads) learned relative-depth bias table
    (None == bias_type 'none').

    Packing: with N = 64 (window 8), two windows share one attention
    instance — the packed 128-token score matmuls exactly fill the MXU lane
    tile the 64-token ones already paid for, halving the matmul count. The
    kernel kills cross-window logits in-place (``_cross_window_kill``); the
    one-hot bias gather computes cross-pair entries too, but they sit under
    the -100 kill so their softmax weight (~e^-100) and bias-table gradient
    contribution vanish below f32 resolution.
    """
    if impl == "xla":
        return xla_ordered_attention(q, k, v, idx, table, num_heads, scale,
                                     num_emb)
    interpret = impl == "pallas_interpret"
    bw, n, c = q.shape
    pack_ok = 2 * n <= 128 and bw % 2 == 0 and _ENV_ORDERED_PACK
    if pack_ok:
        q2 = q.reshape(bw // 2, 2 * n, c)
        k2 = k.reshape(bw // 2, 2 * n, c)
        v2 = v.reshape(bw // 2, 2 * n, c)
        idx2 = idx.reshape(bw // 2, 2 * n)
        out = _fused(q2, k2, v2, idx2, table, num_heads, scale, num_emb,
                     2, interpret)
        return out.reshape(bw, n, c)
    return _fused(q, k, v, idx, table, num_heads, scale, num_emb, 1,
                  interpret)
