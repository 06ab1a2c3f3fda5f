"""Parity tests: Pallas fused attention kernels vs the XLA einsum paths.

Run in interpreter mode on CPU (conftest forces the cpu platform); the same
kernels compile with Mosaic on TPU. Values must match the XLA path to f32
tolerance; gradients flow through the fused Pallas custom_vjp backwards and
must match differentiating the XLA path directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mde_tpu.ops.pallas.window_attention import (
    fused_window_attention, xla_window_attention)
from mde_tpu.ops.pallas.ordered_attention import (
    fused_ordered_window_attention, xla_ordered_attention)
from mde_tpu.ops.window import shifted_window_attn_mask


def _qkv(key, bw, n, c):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (bw, n, c), jnp.float32) for k in ks]


@pytest.mark.parametrize("with_bias,with_mask", [
    (False, False), (True, False), (True, True),
])
def test_window_attention_parity(with_bias, with_mask):
    nh, n, c = 4, 49, 64
    h = w = 28
    r = 7
    nw = (h // r) * (w // r)
    bw = 2 * nw
    q, k, v = _qkv(jax.random.PRNGKey(0), bw, n, c)
    bias = (jax.random.normal(jax.random.PRNGKey(1), (nh, n, n), jnp.float32)
            if with_bias else None)
    mask = (jnp.asarray(shifted_window_attn_mask(h, w, r, 3))
            if with_mask else None)

    ref = xla_window_attention(q, k, v, bias, mask, nh, 0.25)
    out = fused_window_attention(q, k, v, bias, mask, nh, 0.25,
                                 impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_window_attention_grad(with_mask):
    nh, n, c = 2, 16, 32
    h = w = 8
    r = 4
    nw = (h // r) * (w // r)
    bw = 2 * nw  # two batches: exercises the bias-grad accumulation revisit
    q, k, v = _qkv(jax.random.PRNGKey(2), bw, n, c)
    bias = jax.random.normal(jax.random.PRNGKey(3), (nh, n, n), jnp.float32)
    mask = (jnp.asarray(shifted_window_attn_mask(h, w, r, 2))
            if with_mask else None)

    def loss_fused(q, k, v, b):
        o = fused_window_attention(q, k, v, b, mask, nh, 0.25,
                                   impl="pallas_interpret")
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v, b):
        return jnp.sum(xla_window_attention(q, k, v, b, mask, nh, 0.25) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("with_table", [True, False])
def test_ordered_attention_parity(with_table):
    nh, n, c, e = 4, 64, 128, 32
    bw = 8
    q, k, v = _qkv(jax.random.PRNGKey(4), bw, n, c)
    idx = jax.random.randint(jax.random.PRNGKey(5), (bw, n), 0, e)
    table = (jax.random.normal(jax.random.PRNGKey(6), (2 * e - 1, nh),
                               jnp.float32) if with_table else None)

    ref = xla_ordered_attention(q, k, v, idx, table, nh, 0.125, e)
    out = fused_ordered_window_attention(q, k, v, idx, table, nh, 0.125, e,
                                         impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ordered_attention_grad():
    # n != e on purpose: catches transposed contractions in the bias-table
    # gradient that would silently shape-match when n == e
    nh, n, c, e, bw = 2, 16, 32, 24, 4
    q, k, v = _qkv(jax.random.PRNGKey(7), bw, n, c)
    idx = jax.random.randint(jax.random.PRNGKey(8), (bw, n), 0, e)
    table = jax.random.normal(jax.random.PRNGKey(9), (2 * e - 1, nh),
                              jnp.float32)

    def loss_fused(q, k, v, t):
        o = fused_ordered_window_attention(q, k, v, idx, t, nh, 0.25, e,
                                           impl="pallas_interpret")
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v, t):
        return jnp.sum(xla_ordered_attention(q, k, v, idx, t, nh, 0.25, e) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, table)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_toeplitz_bias_matches_gather():
    from mde_tpu.ops.pallas.ordered_attention import toeplitz_bias_matrix
    e, nh = 8, 3
    table = jax.random.normal(jax.random.PRNGKey(10), (2 * e - 1, nh))
    m = toeplitz_bias_matrix(table, e)
    for a in range(e):
        for b in range(e):
            for h in range(nh):
                assert m[a, h * e + b] == table[a - b + e - 1, h]


def test_window_attention_module_impl_parity(monkeypatch):
    """The flax WindowAttention module gives identical results on both paths."""
    from mde_tpu.ops.attention import WindowAttention
    from mde_tpu.ops.window import shifted_window_attn_mask

    mod = WindowAttention(num_heads=2, window_size=4, attn_impl="xla")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 32), jnp.float32)
    mask = shifted_window_attn_mask(8, 8, 4, 2)
    params = mod.init(jax.random.PRNGKey(1), x, mask)
    ref = mod.apply(params, x, mask)

    mod2 = WindowAttention(num_heads=2, window_size=4,
                           attn_impl="pallas_interpret")
    out = mod2.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ordered_module_impl_parity():
    from mde_tpu.ops.ordered_attention import PreNormOrderedSwinSA

    kwargs = dict(num_heads=2, num_emb=16, window_size=4, shift_size=2,
                  bias_type="depth", bias_init="linear")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 8, 8), 0, 16)

    mod = PreNormOrderedSwinSA(attn_impl="xla", **kwargs)
    params = mod.init(jax.random.PRNGKey(2), x, idx)
    ref, _ = mod.apply(params, x, idx)

    mod2 = PreNormOrderedSwinSA(attn_impl="pallas_interpret", **kwargs)
    out, _ = mod2.apply(params, x, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,ec", [(32, 32), (32, 64), (48, 16)])
def test_channel_attention_parity(c, ec):
    """Rectangular hd x enc_hd channel attention (KSA) matches XLA."""
    from mde_tpu.ops.pallas.channel_attention import (
        fused_channel_attention, xla_channel_attention)
    nh, n, bw = 4, 49, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (bw, n, c), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (bw, n, ec), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (bw, n, ec), jnp.float32)
    scale = n ** -0.5
    ref = xla_channel_attention(q, k, v, nh, scale)
    out = fused_channel_attention(q, k, v, nh, scale,
                                  impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_channel_attention_grad():
    from mde_tpu.ops.pallas.channel_attention import (
        fused_channel_attention, xla_channel_attention)
    nh, n, c, ec, bw = 2, 16, 16, 32, 4  # rectangular hd != ehd
    q = jax.random.normal(jax.random.PRNGKey(3), (bw, n, c), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (bw, n, ec), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (bw, n, ec), jnp.float32)
    scale = n ** -0.5

    gf = jax.grad(lambda q, k, v: jnp.sum(fused_channel_attention(
        q, k, v, nh, scale, impl="pallas_interpret") ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        xla_channel_attention(q, k, v, nh, scale) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_kernel_window_attention_module_impl_parity():
    """The flax KernelWindowAttention module matches on both paths."""
    from mde_tpu.models.oda2.ksa import KernelWindowAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 32), jnp.float32)
    enc = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 64), jnp.float32)

    mod = KernelWindowAttention(num_heads=2, attn_impl="xla")
    params = mod.init(jax.random.PRNGKey(2), x, enc)
    ref = mod.apply(params, x, enc)

    mod2 = KernelWindowAttention(num_heads=2, attn_impl="pallas_interpret")
    out = mod2.apply(params, x, enc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,k", [
    ((2, 16, 24, 8), 5),
    ((1, 9, 13, 16), 3),
])
def test_depthwise_kernel_parity(shape, k):
    from mde_tpu.ops.pallas.depthwise import (
        fused_depthwise_conv2d, xla_depthwise_conv2d)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, shape[-1]), jnp.float32)
    ref = xla_depthwise_conv2d(x, w)
    out = fused_depthwise_conv2d(x, w, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,k", [
    ((2, 16, 24, 8), 5),
    ((1, 9, 13, 16), 3),
])
def test_glu_ff_kernel_parity(shape, k):
    """Fused GLU+dwconv+BN(affine)+GELU matches the unfused composite."""
    from mde_tpu.ops.pallas.glu_ff import (
        fused_glu_dwconv_bn_gelu, xla_glu_dwconv_bn_gelu)
    c = shape[-1]
    ab = jax.random.normal(jax.random.PRNGKey(0), shape[:3] + (2 * c,),
                           jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, c), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(3), (c,), jnp.float32)
    ref = xla_glu_dwconv_bn_gelu(ab, w, s, t)
    out = fused_glu_dwconv_bn_gelu(ab, w, s, t, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_glu_ff_kernel_grad():
    from mde_tpu.ops.pallas.glu_ff import (
        fused_glu_dwconv_bn_gelu, xla_glu_dwconv_bn_gelu)
    ab = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 8), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(6), (8,), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(7), (8,), jnp.float32)

    gf = jax.grad(lambda *a: jnp.sum(fused_glu_dwconv_bn_gelu(
        *a, impl="pallas_interpret") ** 2), argnums=(0, 1, 2, 3))(ab, w, s, t)
    gr = jax.grad(lambda *a: jnp.sum(xla_glu_dwconv_bn_gelu(*a) ** 2),
                  argnums=(0, 1, 2, 3))(ab, w, s, t)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_prenorm_dwconv_ff_fused_module_parity():
    """PreNormDWConvFF eval forward matches between fused and unfused paths
    (same params, incl. non-trivial BN running stats)."""
    from mde_tpu.ops.mlp import PreNormDWConvFF

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16, 8), jnp.float32)

    ref_mod = PreNormDWConvFF(feedforward_dims=16, ff_impl="xla")
    variables = ref_mod.init(jax.random.PRNGKey(1), x)
    # perturb running stats away from init (mean 0 / var 1)
    stats = jax.tree.map(lambda a: a + 0.25, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    ref = ref_mod.apply(variables, x)
    out = PreNormDWConvFF(feedforward_dims=16,
                          ff_impl="pallas_interpret").apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # train=True with BN active must keep the unfused path (batch stats):
    # fused and xla modules must agree there too (both unfused)
    ref_t, _ = ref_mod.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
    out_t, _ = PreNormDWConvFF(feedforward_dims=16,
                               ff_impl="pallas_interpret").apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t),
                               rtol=1e-5, atol=1e-5)


def test_depthwise_kernel_grad():
    from mde_tpu.ops.pallas.depthwise import (
        fused_depthwise_conv2d, xla_depthwise_conv2d)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 8), jnp.float32)

    gf = jax.grad(lambda x, w: jnp.sum(
        fused_depthwise_conv2d(x, w, impl="pallas_interpret") ** 2),
        argnums=(0, 1))(x, w)
    gr = jax.grad(lambda x, w: jnp.sum(xla_depthwise_conv2d(x, w) ** 2),
                  argnums=(0, 1))(x, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,k", [
    ((2, 14, 28, 64), 5),   # H not a tile multiple
    ((1, 9, 11, 32), 3),
    ((2, 16, 24, 128), 5),  # full 128-lane channel tile
    ((1, 8, 16, 256), 5),   # two channel tiles (accumulator revisits)
])
def test_depthwise_split_vjp_parity(shape, k):
    """The production TPU backward (dx flipped grouped conv + dw Pallas
    tap-reduce, ``native_vjp_depthwise_conv2d``) matches the shift-FMA VJP;
    dw kernel in interpret mode."""
    from mde_tpu.ops.pallas.depthwise import (_native, xla_depthwise_conv2d)
    x = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (k, k, shape[-1]),
                          jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(6), shape, jnp.float32)

    def loss(f, x_, w_):
        return jnp.sum(f(x_, w_) * g)

    rdx, rdw = jax.grad(lambda a, b: loss(xla_depthwise_conv2d, a, b),
                        argnums=(0, 1))(x, w)
    ndx, ndw = jax.grad(
        lambda a, b: loss(lambda a_, b_: _native(a_, b_, True), a, b),
        argnums=(0, 1))(x, w)
    # dx rtol is loose: XLA:CPU's grouped-conv *forward* itself deviates from
    # shift-FMA by ~5e-3 rel at these shapes (pre-existing, TPU-only path)
    np.testing.assert_allclose(np.asarray(ndx), np.asarray(rdx),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ndw), np.asarray(rdw),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("shape,k", [
    ((2, 14, 28, 64), 5),
    ((1, 8, 16, 256), 5),
])
def test_depthwise_dw_slice_kernel_parity(shape, k, monkeypatch):
    """The bf16-friendly shifted-slice dw kernel (MDE_DW_KERNEL=slice)
    matches the roll variant / shift-FMA VJP exactly."""
    monkeypatch.setenv("MDE_DW_KERNEL", "slice")
    from mde_tpu.ops.pallas.depthwise import _dw_pallas, xla_depthwise_conv2d
    x = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(8), (k, k, shape[-1]),
                          jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(9), shape, jnp.float32)

    _, rdw = jax.grad(lambda a, b: jnp.sum(xla_depthwise_conv2d(a, b) * g),
                      argnums=(0, 1))(x, w)
    ndw = _dw_pallas(x, g, k, k, interpret=True)
    np.testing.assert_allclose(np.asarray(ndw), np.asarray(rdw),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("shape,k", [
    ((2, 14, 28, 64), 5),   # H not a tile multiple
    ((1, 9, 11, 32), 3),
    ((1, 8, 16, 256), 5),   # two channel tiles (dw accumulator revisits)
])
def test_depthwise_fused_dxdw_parity(shape, k):
    """The fused single-pass dx+dw backward (MDE_DWCONV_BWD=fused,
    ``_dxdw_pallas``) matches the shift-FMA VJP: dx including the
    replicate-pad fold, dw exactly."""
    from mde_tpu.ops.pallas.depthwise import _dxdw_pallas, xla_depthwise_conv2d
    x = jax.random.normal(jax.random.PRNGKey(10), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(11), (k, k, shape[-1]),
                          jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(12), shape, jnp.float32)

    rdx, rdw = jax.grad(lambda a, b: jnp.sum(xla_depthwise_conv2d(a, b) * g),
                        argnums=(0, 1))(x, w)
    ndx, ndw = _dxdw_pallas(x, g, w, k, k, interpret=True)
    np.testing.assert_allclose(np.asarray(ndx), np.asarray(rdx),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ndw), np.asarray(rdw),
                               rtol=1e-4, atol=1e-3)


def test_crf_window_attention_impl_parity():
    from mde_tpu.models.newcrfs.layers import CRFWindowAttention
    from mde_tpu.ops.window import shifted_window_attn_mask

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 32), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32), jnp.float32)
    mask = shifted_window_attn_mask(8, 8, 4, 2)

    mod = CRFWindowAttention(num_heads=2, window_size=4, attn_impl="xla")
    params = mod.init(jax.random.PRNGKey(2), x, v, mask)
    ref = mod.apply(params, x, v, mask)

    mod2 = CRFWindowAttention(num_heads=2, window_size=4,
                              attn_impl="pallas_interpret")
    out = mod2.apply(params, x, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Lane-gather bias path (n == e == 128, the flagship production shape).
# The default parity/grad tests above never reach it (their shapes keep
# _use_gather_bias False), so the gather numerics get their own coverage,
# cross-checked against BOTH the XLA reference and the one-hot kernel path.
# ---------------------------------------------------------------------------


def _gather_shape_case(n, bw, pack_env):
    import mde_tpu.ops.pallas.ordered_attention as oa
    nh, c, e = 4, 64, 128
    q, k, v = _qkv(jax.random.PRNGKey(40), bw, n, c)
    idx = jax.random.randint(jax.random.PRNGKey(41), (bw, n), 0, e)
    table = jax.random.normal(jax.random.PRNGKey(42), (2 * e - 1, nh),
                              jnp.float32)
    return oa, nh, c, e, q, k, v, idx, table


@pytest.mark.parametrize("n,bw,packed", [(128, 4, False), (64, 8, True)])
def test_ordered_attention_gather_path_parity(monkeypatch, n, bw, packed):
    """Gather-path forward (interpret mode) vs XLA gather AND the one-hot
    kernel path: n=128 unpacked, and n=64 packed into 128-token instances."""
    oa, nh, c, e, q, k, v, idx, table = _gather_shape_case(n, bw, packed)

    ref = oa.xla_ordered_attention(q, k, v, idx, table, nh, 0.125, e)

    monkeypatch.setattr(oa, "_ENV_ORDERED_PACK", packed)
    monkeypatch.setattr(oa, "_ENV_ORDERED_GATHER", True)
    assert oa._use_gather_bias(128, e)  # the path under test is active
    out_gather = oa.fused_ordered_window_attention(
        q, k, v, idx, table, nh, 0.125, e, impl="pallas_interpret")

    monkeypatch.setattr(oa, "_ENV_ORDERED_GATHER", False)
    out_onehot = oa.fused_ordered_window_attention(
        q, k, v, idx, table, nh, 0.125, e, impl="pallas_interpret")

    np.testing.assert_allclose(np.asarray(out_gather), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # gather and one-hot select the same f32 table entries bit-exactly
    np.testing.assert_allclose(np.asarray(out_gather),
                               np.asarray(out_onehot), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n,bw,packed", [(128, 4, False), (64, 8, True)])
def test_ordered_attention_gather_path_grad(monkeypatch, n, bw, packed):
    """Gather-path backward (incl. the packed backward staying packed) vs the
    XLA reference gradient."""
    oa, nh, c, e, q, k, v, idx, table = _gather_shape_case(n, bw, packed)

    def loss_ref(q, k, v, t):
        return jnp.sum(
            oa.xla_ordered_attention(q, k, v, idx, t, nh, 0.125, e) ** 2)

    monkeypatch.setattr(oa, "_ENV_ORDERED_PACK", packed)
    monkeypatch.setattr(oa, "_ENV_ORDERED_GATHER", True)

    def loss_gather(q, k, v, t):
        o = oa.fused_ordered_window_attention(q, k, v, idx, t, nh, 0.125, e,
                                              impl="pallas_interpret")
        return jnp.sum(o ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    g_gather = jax.grad(loss_gather, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b in zip(g_gather, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_split_bias_table():
    """split_bias_table halves cover rel in [0, E-1] / [E-1, 2E-2] and agree
    with the raw table (analog of test_toeplitz_bias_matches_gather)."""
    from mde_tpu.ops.pallas.ordered_attention import split_bias_table
    e, nh = 16, 3
    table = jax.random.normal(jax.random.PRNGKey(43), (2 * e - 1, nh),
                              jnp.float32)
    m = split_bias_table(table, e)
    assert m.shape == (2 * nh, e)
    for h in range(nh):
        for rel in range(2 * e - 1):
            if rel < e:
                assert m[h, rel] == table[rel, h]
            if rel >= e - 1:
                assert m[nh + h, rel - (e - 1)] == table[rel, h]
    # the halves agree at the stitch entry rel == e-1
    np.testing.assert_array_equal(np.asarray(m[:nh, e - 1]),
                                  np.asarray(m[nh:, 0]))
