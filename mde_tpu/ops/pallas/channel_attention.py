"""Fused kernel-window (channel) cross attention — Pallas TPU kernel.

The KSA decoder op (reference ``model/ODA2/oda2_ksa_decoder.py:49-103``):
per-window attention over HEAD-CHANNEL pairs — scores contract the token
dimension, ``S[t, d, e] = sum_n q[t, n, d] k[t, n, e] * sqrt(1/n)`` — so the
"sequence" axes are the per-head channel counts of the decoder (hd) and
encoder (ehd) sides, which are rectangular in general. Softmax over e, then
``out[t, n, d] = sum_e P[t, d, e] v[t, n, e]``.

Same structure as ``window_attention.py``: windows ride the grid dimension,
scores stay in VMEM through the f32 softmax, per-head MXU dots.

Gradients: ``custom_vjp`` with a fused Pallas backward (flash-style recompute,
``dS = P*(dP - rowsum(dP*P))``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import _pick_tb


def xla_channel_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          num_heads: int, scale: float) -> jnp.ndarray:
    """Reference einsum path (q: (BW, N, C); k/v: (BW, N, EC))."""
    bw, n, c = q.shape
    ec = k.shape[-1]
    nh = num_heads
    qh = q.reshape(bw, n, nh, c // nh)
    kh = k.reshape(bw, n, nh, ec // nh)
    vh = v.reshape(bw, n, nh, ec // nh)
    attn = jnp.einsum("bnhd,bnhe->bhde", qh, kh)
    attn = attn.astype(jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhde,bnhe->bnhd", attn, vh)
    return out.reshape(bw, n, c)


def _kernel(num_heads: int, scale: float, *refs):
    q_ref, k_ref, v_ref, o_ref = refs
    q = q_ref[:]  # (TB, N, C)
    k = k_ref[:]  # (TB, N, EC)
    v = v_ref[:]
    tb, n, c = q.shape
    ec = k.shape[-1]
    nh = num_heads
    hd = c // nh
    ehd = ec // nh

    tok_dims = (((1,), (1,)), ((0,), (0,)))  # contract tokens -> (TB, hd, ehd)
    pv_dims = (((2,), (2,)), ((0,), (0,)))   # contract ehd    -> (TB, N, hd)
    for h in range(nh):
        sq = slice(h * hd, (h + 1) * hd)
        se = slice(h * ehd, (h + 1) * ehd)
        s = jax.lax.dot_general(q[:, :, sq], k[:, :, se], tok_dims,
                                preferred_element_type=jnp.float32)
        s = s * jnp.asarray(scale, jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)   # (TB, hd, ehd)
        o = jax.lax.dot_general(v[:, :, se], p, pv_dims,
                                preferred_element_type=jnp.float32)
        o_ref[:, :, sq] = o.astype(o_ref.dtype)


def _pallas_channel_attention(q, k, v, num_heads, scale, interpret: bool):
    bw, n, c = q.shape
    ec = k.shape[-1]
    itemsize = jnp.dtype(q.dtype).itemsize
    hd, ehd = c // num_heads, ec // num_heads
    per_window = ((2 * n * (c + ec) + n * c) * itemsize * 2
                  + 2 * hd * ehd * 4)
    tb = _pick_tb(bw, None, per_window)
    grid = (bw // tb,)

    def blk(minor):
        return pl.BlockSpec((tb, n, minor), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, num_heads, float(scale)),
        grid=grid,
        in_specs=[blk(c), blk(ec), blk(ec)],
        out_specs=blk(c),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _bwd_kernel(num_heads: int, scale: float, *refs):
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    tb, n, c = q.shape
    ec = k.shape[-1]
    nh = num_heads
    hd = c // nh
    ehd = ec // nh

    tok_dims = (((1,), (1,)), ((0,), (0,)))   # contract tokens
    dv_dims = (((2,), (1,)), ((0,), (0,)))    # (TB,N,hd)x(TB,hd,ehd) -> (TB,N,ehd)
    dq_dims = (((2,), (2,)), ((0,), (0,)))    # (TB,N,ehd)x(TB,hd,ehd) -> (TB,N,hd)
    for h in range(nh):
        sq = slice(h * hd, (h + 1) * hd)
        se = slice(h * ehd, (h + 1) * ehd)
        s = jax.lax.dot_general(q[:, :, sq], k[:, :, se], tok_dims,
                                preferred_element_type=jnp.float32)
        s = s * jnp.asarray(scale, jnp.float32)
        p = jax.nn.softmax(s, axis=-1)                    # f32 (TB, hd, ehd)
        # dP[t,d,e] = sum_n do[t,n,d] v[t,n,e]
        dp = jax.lax.dot_general(do[:, :, sq], v[:, :, se], tok_dims,
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds * jnp.asarray(scale, jnp.float32)
        p_lo = p.astype(do.dtype)
        ds_lo = ds.astype(q.dtype)
        # dV[t,n,e] = sum_d P[t,d,e] do[t,n,d]
        dv = jax.lax.dot_general(do[:, :, sq], p_lo, dv_dims,
                                 preferred_element_type=jnp.float32)
        # dQ[t,n,d] = sum_e dS[t,d,e] k[t,n,e]
        dq = jax.lax.dot_general(k[:, :, se], ds_lo, dq_dims,
                                 preferred_element_type=jnp.float32)
        # dK[t,n,e] = sum_d dS[t,d,e] q[t,n,d]
        dk = jax.lax.dot_general(q[:, :, sq], ds_lo, dv_dims,
                                 preferred_element_type=jnp.float32)
        dq_ref[:, :, sq] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, se] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, se] = dv.astype(dv_ref.dtype)


def _pallas_channel_attention_bwd(q, k, v, do, num_heads, scale,
                                  interpret: bool):
    bw, n, c = q.shape
    ec = k.shape[-1]
    itemsize = jnp.dtype(q.dtype).itemsize
    hd, ehd = c // num_heads, ec // num_heads
    per_window = ((4 * n * (c + ec)) * itemsize * 2
                  + 4 * hd * ehd * 4)
    tb = _pick_tb(bw, None, per_window)
    grid = (bw // tb,)

    def blk(minor):
        return pl.BlockSpec((tb, n, minor), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads, float(scale)),
        grid=grid,
        in_specs=[blk(c), blk(ec), blk(ec), blk(c)],
        out_specs=(blk(c), blk(ec), blk(ec)),
        out_shape=(jax.ShapeDtypeStruct((bw, n, c), q.dtype),
                   jax.ShapeDtypeStruct((bw, n, ec), k.dtype),
                   jax.ShapeDtypeStruct((bw, n, ec), v.dtype)),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(q, k, v, num_heads, scale, interpret):
    return _pallas_channel_attention(q, k, v, num_heads, scale, interpret)


def _fused_fwd(q, k, v, num_heads, scale, interpret):
    out = _pallas_channel_attention(q, k, v, num_heads, scale, interpret)
    return out, (q, k, v)


def _fused_bwd(num_heads, scale, interpret, res, g):
    q, k, v = res
    return _pallas_channel_attention_bwd(q, k, v, g, num_heads, scale,
                                         interpret)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_channel_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            num_heads: int, scale: float,
                            impl: str = "pallas") -> jnp.ndarray:
    """Kernel-window channel cross attention.

    q: (BW, N, C) decoder windows; k, v: (BW, N, EC) encoder windows; the
    per-head channel counts C/heads and EC/heads may differ (rectangular).
    """
    if impl == "xla":
        return xla_channel_attention(q, k, v, num_heads, scale)
    return _fused(q, k, v, num_heads, scale, impl == "pallas_interpret")
