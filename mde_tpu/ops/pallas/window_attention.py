"""Fused window multi-head attention (W-MSA / SW-MSA) Pallas TPU kernel.

Computes ``softmax(q @ k^T * scale + bias + mask) @ v`` over window-batched
tokens without materializing the ``(B*nW, heads, N, N)`` logits in HBM —
the reference's torch path (``model/ODA2/oda2_swin_transformer.py:141-170``)
and the XLA einsum fallback both round-trip those logits through main memory;
at Swin-L 448x896 that is hundreds of MB per layer.

Layout: windows ride the leading (grid) dimension, ``TB`` windows per program.
Per head, scores are a batched MXU dot ``(TB, N, hd) x (TB, N, hd) ->
(TB, N, N)`` kept in VMEM through bias/mask add and a f32 softmax, then the
PV dot writes the head's lane slice of the output block.

Gradients: ``custom_vjp`` with a fused Pallas backward — flash-style: scores
and probabilities are recomputed per window block in VMEM from the saved
q/k/v (never hitting HBM), then ``dS = P*(dP - rowsum(dP*P))`` yields dq/dk/dv
with three more MXU dots. The rel-pos-bias gradient accumulates across grid
steps into a revisited output block (TPU grids are sequential). HBM traffic of
the backward is exactly the IO tensors (q/k/v/do in, dq/dk/dv out) — the XLA
recompute path it replaces materialized the (BW, heads, N, N) probabilities
twice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tb(bw: int, nw: Optional[int],
             bytes_per_window: int = 0,
             budget: int = 8 * 1024 * 1024,
             min_tb: int = 1) -> Optional[int]:
    """Largest window-block size that divides BW (and nW when masked) and
    keeps the per-program VMEM footprint under ``budget`` (the hardware
    scoped-vmem limit is 16 MB and Mosaic's real stack allocation runs up to
    ~30% over these estimates, so budget conservatively; block IO buffers are
    double-buffered by the pipeline, which ``bytes_per_window`` estimates
    must account for).

    ``min_tb``: hard floor on the block size — kernels whose blocks carry a
    2-D int32 ref (e.g. the ordered-attention index block (TB, N)) need
    TB % 8 == 0 to satisfy Mosaic's sublane tiling. The floor wins over the
    budget (the budget is ~2x conservative vs the 16 MB hardware limit);
    returns None when no divisor >= min_tb exists (caller falls back to the
    XLA path).

    ``MDE_WATTN_TB`` overrides the choice for shape-specific tuning (round-5
    sweep at (1568,128,512): the budget-driven tb=8 measured 2.58 ms vs
    tb=4's 1.46 — smaller blocks double-buffer better well before the VMEM
    estimate says so; the flagship's ordered kernel prefers its
    budget-driven choice, so the default logic is unchanged)."""
    import os
    forced = os.environ.get("MDE_WATTN_TB", "")
    if forced:
        tb = int(forced)
        if bw % tb == 0 and (nw is None or nw % tb == 0) and tb >= min_tb:
            return tb
    fallback = None
    for tb in (16, 8, 4, 2, 1):
        if tb < min_tb:
            break
        if bw % tb != 0 or (nw is not None and nw % tb != 0):
            continue
        fallback = tb  # smallest admissible divisor seen (may be over budget)
        if bytes_per_window and tb * bytes_per_window > budget:
            continue
        return tb
    return fallback if min_tb > 1 else (fallback or 1)


def xla_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: Optional[jnp.ndarray],
                         mask: Optional[jnp.ndarray],
                         num_heads: int, scale: float) -> jnp.ndarray:
    """Reference einsum path (also the custom-vjp backward)."""
    bw, n, c = q.shape
    hd = c // num_heads
    qh = q.reshape(bw, n, num_heads, hd)
    kh = k.reshape(bw, n, num_heads, hd)
    vh = v.reshape(bw, n, num_heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", qh * jnp.asarray(scale, q.dtype), kh)
    attn = attn.astype(jnp.float32)
    if bias is not None:
        attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bw // nw, nw, num_heads, n, n) \
            + jnp.asarray(mask, jnp.float32)[None, :, None]
        attn = attn.reshape(bw, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
    return out.reshape(bw, n, c)


def _kernel(num_heads: int, scale: float, has_bias: bool, has_mask: bool,
            *refs):
    if has_bias and has_mask:
        q_ref, k_ref, v_ref, b_ref, m_ref, o_ref = refs
    elif has_bias:
        q_ref, k_ref, v_ref, b_ref, o_ref = refs
        m_ref = None
    elif has_mask:
        q_ref, k_ref, v_ref, m_ref, o_ref = refs
        b_ref = None
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        b_ref = m_ref = None

    q = q_ref[:]  # (TB, N, C)
    k = k_ref[:]
    v = v_ref[:]
    tb, n, c = q.shape
    hd = c // num_heads
    mask = m_ref[:].astype(jnp.float32) if m_ref is not None else None  # (TB, N, N)

    q = q * jnp.asarray(scale, q.dtype)
    batch_dims = (((2,), (2,)), ((0,), (0,)))      # contract hd, batch TB
    pv_dims = (((2,), (1,)), ((0,), (0,)))         # contract N,  batch TB
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(q[:, :, sl], k[:, :, sl], batch_dims,
                                preferred_element_type=jnp.float32)
        if b_ref is not None:
            s = s + b_ref[h].astype(jnp.float32)[None]
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(p, v[:, :, sl], pv_dims,
                                preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _pallas_window_attention(q, k, v, bias, mask, num_heads, scale,
                             interpret: bool) -> jnp.ndarray:
    bw, n, c = q.shape
    nw = mask.shape[0] if mask is not None else None
    itemsize = jnp.dtype(q.dtype).itemsize
    # 4 double-buffered IO blocks + f32 scores/probs + mask block
    per_window = (4 * n * c * itemsize * 2
                  + 2 * n * n * 4
                  + (n * n * 4 * 2 if mask is not None else 0))
    tb = _pick_tb(bw, nw, per_window)
    grid = (bw // tb,)

    def qkv_spec():
        return pl.BlockSpec((tb, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.ANY if interpret else pltpu.VMEM)

    in_specs = [qkv_spec(), qkv_spec(), qkv_spec()]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))
    if mask is not None:
        nwb = nw // tb
        in_specs.append(pl.BlockSpec((tb, n, n), lambda i: (i % nwb, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(mask, jnp.float32))

    kernel = functools.partial(_kernel, num_heads, float(scale),
                               bias is not None, mask is not None)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), q.dtype),
        interpret=interpret,
    )(*args)


def _bwd_kernel(num_heads: int, scale: float, has_bias: bool, has_mask: bool,
                *refs):
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref = next(it), next(it), next(it), next(it)
    b_ref = next(it) if has_bias else None
    m_ref = next(it) if has_mask else None
    dq_ref, dk_ref, dv_ref = next(it), next(it), next(it)
    db_ref = next(it) if has_bias else None

    q = q_ref[:]  # (TB, N, C)
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    tb, n, c = q.shape
    hd = c // num_heads
    mask = m_ref[:].astype(jnp.float32) if m_ref is not None else None

    if db_ref is not None:
        # revisited accumulator block (constant index map, sequential grid)
        @pl.when(pl.program_id(0) == 0)
        def _():
            db_ref[:] = jnp.zeros_like(db_ref)

    qs = q * jnp.asarray(scale, q.dtype)
    qk_dims = (((2,), (2,)), ((0,), (0,)))   # contract hd       -> (TB, N, N)
    row_dims = (((1,), (1,)), ((0,), (0,)))  # contract query dim -> (TB, Nk, hd)
    col_dims = (((2,), (1,)), ((0,), (0,)))  # contract key dim   -> (TB, Nq, hd)
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(qs[:, :, sl], k[:, :, sl], qk_dims,
                                preferred_element_type=jnp.float32)
        if b_ref is not None:
            s = s + b_ref[h].astype(jnp.float32)[None]
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)                       # f32 (TB, N, N)
        dp = jax.lax.dot_general(do[:, :, sl], v[:, :, sl], qk_dims,
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        p_lo = p.astype(do.dtype)
        ds_lo = ds.astype(q.dtype)
        dv = jax.lax.dot_general(p_lo, do[:, :, sl], row_dims,
                                 preferred_element_type=jnp.float32)
        dq = jax.lax.dot_general(ds_lo, k[:, :, sl], col_dims,
                                 preferred_element_type=jnp.float32)
        dq = dq * jnp.asarray(scale, jnp.float32)
        dk = jax.lax.dot_general(ds_lo, qs[:, :, sl], row_dims,
                                 preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)
        if db_ref is not None:
            db_ref[h] += jnp.sum(ds, axis=0)


def _pallas_window_attention_bwd(q, k, v, do, bias, mask, num_heads, scale,
                                 interpret: bool):
    bw, n, c = q.shape
    nw = mask.shape[0] if mask is not None else None
    itemsize = jnp.dtype(q.dtype).itemsize
    nh = num_heads
    # 7 double-buffered IO blocks + 4 f32 score-sized temporaries + mask
    per_window = (7 * n * c * itemsize * 2
                  + 4 * n * n * 4
                  + (n * n * 4 * 2 if mask is not None else 0))
    shared = (2 * nh * n * n * 4) if bias is not None else 0
    tb = _pick_tb(bw, nw, per_window, budget=8 * 1024 * 1024 - shared)
    grid = (bw // tb,)

    def blk():
        return pl.BlockSpec((tb, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.ANY if interpret else pltpu.VMEM)

    in_specs = [blk(), blk(), blk(), blk()]
    args = [q, k, v, do]
    if bias is not None:
        in_specs.append(pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))
    if mask is not None:
        nwb = nw // tb
        in_specs.append(pl.BlockSpec((tb, n, n), lambda i: (i % nwb, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(mask, jnp.float32))

    out_shape = [jax.ShapeDtypeStruct((bw, n, c), q.dtype)] * 3
    out_specs = [pl.BlockSpec((tb, n, c), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(3)]
    if bias is not None:
        out_shape.append(jax.ShapeDtypeStruct((nh, n, n), jnp.float32))
        out_specs.append(pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(_bwd_kernel, nh, float(scale),
                               bias is not None, mask is not None)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
    dq, dk, dv = outs[:3]
    db = outs[3].astype(bias.dtype) if bias is not None else None
    return dq, dk, dv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(q, k, v, bias, mask, num_heads, scale, interpret):
    return _pallas_window_attention(q, k, v, bias, mask, num_heads, scale,
                                    interpret)


def _fused_fwd(q, k, v, bias, mask, num_heads, scale, interpret):
    out = _pallas_window_attention(q, k, v, bias, mask, num_heads, scale,
                                   interpret)
    return out, (q, k, v, bias, mask)


def _fused_bwd(num_heads, scale, interpret, res, g):
    q, k, v, bias, mask = res
    dq, dk, dv, db = _pallas_window_attention_bwd(
        q, k, v, g, bias, mask, num_heads, scale, interpret)
    dm = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, db, dm


_fused.defvjp(_fused_fwd, _fused_bwd)


def _pack2(q, k, v, bias, mask, num_heads):
    """Pack 2 windows per attention instance (block-diagonal masking).

    MXU lane tiles are 128 wide, so a (N, N) score matmul with N = 49 (or
    64) pays the same padded tile as 2N <= 128 — packing pairs of windows
    along the token dim halves the number of score/PV matmuls at unchanged
    per-matmul cost. Cross-window logits are killed with the Swin -100
    additive convention; the diagonal blocks carry the original bias/mask,
    so softmax factorizes per window exactly.

    Applied OUTSIDE the custom_vjp: reshapes and the block-diag embedding
    are plain traced ops, so gradients (incl. d_bias = sum of the two
    diagonal blocks) come from autodiff with no kernel changes.
    """
    bw, n, c = q.shape
    n2 = 2 * n
    q2 = q.reshape(bw // 2, n2, c)
    k2 = k.reshape(bw // 2, n2, c)
    v2 = v.reshape(bw // 2, n2, c)

    # cross-window kill folded into the BIAS channel (constant per program;
    # a synthetic single-window mask would break the kernel's nW/TB block
    # indexing and force TB=1)
    cross = jnp.full((n2, n2), -100.0, jnp.float32)
    zero = jnp.zeros((n, n), jnp.float32)
    cross = cross.at[:n, :n].set(zero).at[n:, n:].set(zero)

    bias2 = jnp.broadcast_to(cross, (num_heads, n2, n2))
    if bias is not None:
        b = jnp.asarray(bias, jnp.float32)
        bias2 = bias2.at[:, :n, :n].add(b).at[:, n:, n:].add(b)

    mask2 = None
    if mask is not None:
        nw = mask.shape[0]
        m = jnp.asarray(mask, jnp.float32).reshape(nw // 2, 2, n, n)
        mask2 = jnp.zeros((nw // 2, n2, n2), jnp.float32)
        mask2 = mask2.at[:, :n, :n].set(m[:, 0]).at[:, n:, n:].set(m[:, 1])
    return q2, k2, v2, bias2, mask2


def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: Optional[jnp.ndarray],
                           mask: Optional[jnp.ndarray],
                           num_heads: int, scale: float,
                           impl: str = "pallas") -> jnp.ndarray:
    """Window MHA over (B*nW, N, C) q/k/v.

    bias: optional (heads, N, N) additive logits bias (rel-pos bias).
    mask: optional (nW, N, N) additive SW-MSA mask (compile-time constant).
    """
    if impl == "xla":
        return xla_window_attention(q, k, v, bias, mask, num_heads, scale)
    interpret = impl == "pallas_interpret"

    bw, n, c = q.shape
    if (2 * n <= 128 and bw % 2 == 0
            and (mask is None or mask.shape[0] % 2 == 0)):
        q2, k2, v2, bias2, mask2 = _pack2(q, k, v, bias, mask, num_heads)
        out = _fused(q2, k2, v2, bias2, mask2, num_heads, scale, interpret)
        return out.reshape(bw, n, c)

    if bias is None and mask is None:
        # avoid a custom_vjp cell for the trivial-constant case; same path
        return _fused(q, k, v, None, None, num_heads, scale, interpret)
    return _fused(q, k, v, bias, mask, num_heads, scale, interpret)
