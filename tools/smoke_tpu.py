"""Compiled-path smoke tests for the Pallas kernels on the real TPU.

CPU tests run the kernels in interpreter mode only; this script compiles the
Mosaic paths on the tunneled chip and checks them against the XLA paths at
bf16/f32 tolerance. Covers: channel attention (KSA), fused GLU-FF, plus a
tiny KSA-model forward. Run: ``python tools/smoke_tpu.py``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mde_tpu.ops.pallas.channel_attention import (
        fused_channel_attention, xla_channel_attention)
    from mde_tpu.ops.pallas.glu_ff import (
        fused_glu_dwconv_bn_gelu, xla_glu_dwconv_bn_gelu)

    # --- channel attention (KSA shapes: window 7x7 tokens, rect hd x ehd)
    nh, n, c, ec, bw = 8, 49, 256, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (bw, n, c), jnp.float32)
    k = jax.random.normal(ks[1], (bw, n, ec), jnp.float32)
    v = jax.random.normal(ks[2], (bw, n, ec), jnp.float32)
    scale = n ** -0.5
    ref = jax.jit(lambda q, k, v: xla_channel_attention(
        q, k, v, nh, scale))(q, k, v)
    out = jax.jit(lambda q, k, v: fused_channel_attention(
        q, k, v, nh, scale, impl="pallas"))(q, k, v)
    d = float(jnp.max(jnp.abs(out - ref)))
    print(f"channel_attention compiled max|d| = {d:.2e}")
    assert d < 1e-4

    gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(fused_channel_attention(
        q, k, v, nh, scale, impl="pallas") ** 2), argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(xla_channel_attention(
        q, k, v, nh, scale) ** 2), argnums=(0, 1, 2)))(q, k, v)
    gd = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gf, gr))
    print(f"channel_attention compiled grad max|d| = {gd:.2e}")
    assert gd < 5e-2  # grads of sum-of-squares grow with N; relative ~1e-5

    # --- fused GLU-FF (flagship-like shapes, shrunk H for speed)
    c = 512
    ab = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 112, 2 * c),
                           jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (5, 5, c), jnp.float32) * 0.1
    s = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(3), (c,), jnp.float32)
    t = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (c,), jnp.float32)
    ref = jax.jit(xla_glu_dwconv_bn_gelu)(ab, w, s, t)
    out = jax.jit(lambda ab, w, s, t: fused_glu_dwconv_bn_gelu(
        ab, w, s, t, impl="pallas"))(ab, w, s, t)
    d = float(jnp.max(jnp.abs(out - ref)))
    print(f"glu_ff compiled max|d| = {d:.2e}")
    assert d < 1e-4

    # --- packed ordered attention (flagship head shapes: window 8 -> N=64,
    # packed pairs -> 128 tokens; checks the VMEM fit of the packed blocks)
    from mde_tpu.ops.pallas.ordered_attention import (
        fused_ordered_window_attention, xla_ordered_attention)
    nh, n, c, e, bw = 8, 64, 512, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (bw, n, c), jnp.float32)
    k = jax.random.normal(ks[1], (bw, n, c), jnp.float32)
    v = jax.random.normal(ks[2], (bw, n, c), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(6), (bw, n), 0, e)
    table = jax.random.normal(jax.random.PRNGKey(7), (2 * e - 1, nh),
                              jnp.float32)
    sc = (c // nh) ** -0.5
    # reference on the CPU backend: true f32 (the TPU einsum path rounds
    # its matmuls to bf16, so a TPU-vs-TPU diff would measure XLA's own
    # rounding, ~1e-2, not the kernel's correctness — the kernel runs its
    # dots at Precision.HIGHEST and should sit within ~1e-5 of true f32)
    ref = jax.jit(lambda q, k, v, t: xla_ordered_attention(
        q, k, v, idx, t, nh, sc, e), backend="cpu")(q, k, v, table)
    out = jax.jit(lambda q, k, v, t: fused_ordered_window_attention(
        q, k, v, idx, t, nh, sc, e, impl="pallas"))(q, k, v, table)
    d = float(jnp.max(jnp.abs(jax.device_get(out) - jax.device_get(ref))))
    print(f"ordered packed compiled max|d| vs f32 = {d:.2e}")
    assert d < 1e-4

    gf = jax.jit(jax.grad(lambda q, k, v, t: jnp.sum(
        fused_ordered_window_attention(q, k, v, idx, t, nh, sc, e,
                                       impl="pallas") ** 2),
        argnums=(0, 1, 2, 3)))(q, k, v, table)
    gr = jax.jit(jax.grad(lambda q, k, v, t: jnp.sum(
        xla_ordered_attention(q, k, v, idx, t, nh, sc, e) ** 2),
        argnums=(0, 1, 2, 3)), backend="cpu")(q, k, v, table)
    gd = max(float(jnp.max(jnp.abs(jax.device_get(a) - jax.device_get(b))))
             for a, b in zip(gf, gr))
    print(f"ordered packed compiled grad max|d| vs f32 = {gd:.2e}")
    assert gd < 5e-2

    # bf16 (the production dtype: bf16 tiles hit different Mosaic lowerings)
    ab16, w16 = ab.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    ref16 = jax.jit(xla_glu_dwconv_bn_gelu)(ab16, w16, s, t)
    out16 = jax.jit(lambda ab, w, s, t: fused_glu_dwconv_bn_gelu(
        ab, w, s, t, impl="pallas"))(ab16, w16, s, t)
    d16 = float(jnp.max(jnp.abs(out16.astype(jnp.float32)
                                - ref16.astype(jnp.float32))))
    print(f"glu_ff bf16 compiled max|d| = {d16:.2e}")
    assert d16 < 0.1

    print("smoke_tpu OK")


if __name__ == "__main__":
    main()
