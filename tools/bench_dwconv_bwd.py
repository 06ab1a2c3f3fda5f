"""Depthwise-conv BACKWARD shootout at flagship FF shapes.

The native grouped conv's XLA VJP measured ~29 ms at (4, 112, 224, 2048)
bf16 5x5 (vs 8.5 ms fwd) — the single largest term in the train step's
FF-dominated backward. Candidates:

  xla_full    jax.grad through native_depthwise_conv2d (XLA's own VJP)
  xla_dx      dx only through the native conv (isolates the conv-transpose)
  xla_dw      dw only through the native conv (isolates the batch-group conv)
  split       hand decomposition: dx = flipped-tap grouped conv + pad fold,
              dw = one-pass Pallas tap-reduce kernel (production candidate)
  split_dx    the flipped-conv dx alone
  split_dw    the Pallas dw kernel alone

Run: ``python tools/bench_dwconv_bwd.py`` (tunneled TPU).
"""

import json
import os
import sys
import time

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

    from mde_tpu.ops.pallas.depthwise import (
        native_depthwise_conv2d, native_vjp_depthwise_conv2d,
        xla_depthwise_conv2d, _dx_native, _dw_pallas)

    dtype = jnp.bfloat16
    batch = int(os.environ.get("MDE_BENCH_BATCH", "4"))
    h, w, c = 112, 224, 2048
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, h, w, c), dtype)
    wk = jnp.asarray(rng.rand(5, 5, c) * 0.1, jnp.float32)
    g = jnp.asarray(rng.rand(batch, h, w, c), dtype)

    def loss(f, x_, w_, g_):
        return jnp.sum(f(x_, w_).astype(jnp.float32) *
                       g_.astype(jnp.float32))

    def slope(fn, n1=1, n2=5, reps=2):
        fn(1)
        t1 = min(fn(n1) for _ in range(reps))
        t2 = min(fn(n2) for _ in range(reps))
        return max(t2 - t1, 1e-9) / (n2 - n1)

    def bench(name, loop):
        def t(n):
            t0 = time.perf_counter()
            float(loop(x, wk, g, n))
            return time.perf_counter() - t0

        ms = slope(t) * 1000
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)

    def grad_loop(f, argnums):
        @jax.jit
        def loop(x_, w_, g_, n):
            # perturb BOTH x and the cotangent g: dx depends only on (w, g)
            # and dw only on (x, g) — perturbing x alone lets XLA hoist the
            # entire dx computation out of the loop (measured as "0.0 ms")
            def body(_, acc):
                x0 = x_ + acc.astype(x_.dtype)
                g0 = g_ + acc.astype(g_.dtype)
                gr = jax.grad(lambda a, b: loss(f, a, b, g0),
                              argnums=argnums)(x0, w_)
                leaves = jax.tree_util.tree_leaves(gr)
                s = jnp.zeros((), jnp.float32)
                for leaf in leaves:
                    s = s + jnp.mean(leaf.astype(jnp.float32))
                return s
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
        return loop

    def piece_loop(f):
        @jax.jit
        def loop(x_, w_, g_, n):
            def body(_, acc):
                g0 = g_ + acc.astype(g_.dtype)
                out = f(x_, w_, g0)
                return jnp.mean(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
        return loop

    # pieces first — the new kernel is the thing under test
    bench("split_dw", piece_loop(
        lambda x_, w_, g0: _dw_pallas(x_, g0, 5, 5, False)))
    bench("split_dx", piece_loop(
        lambda x_, w_, g0: _dx_native(g0, w_, x_.shape, x_.dtype)))
    bench("split(dx+dw)", grad_loop(native_vjp_depthwise_conv2d, (0, 1)))
    bench("xla_full(dx+dw)", grad_loop(native_depthwise_conv2d, (0, 1)))
    bench("xla_dx", grad_loop(native_depthwise_conv2d, (0,)))
    bench("xla_dw", grad_loop(native_depthwise_conv2d, (1,)))

    # round-4 candidates: bf16 shifted-slice dw, fused single-pass dx+dw
    os.environ["MDE_DW_KERNEL"] = "slice"
    bench("slice_dw", piece_loop(
        lambda x_, w_, g0: _dw_pallas(x_, g0, 5, 5, False)))
    os.environ["MDE_DW_KERNEL"] = "roll"
    from mde_tpu.ops.pallas.depthwise import _dxdw_pallas

    def fused_piece(x_, w_, g0):
        dx, dw = _dxdw_pallas(x_, g0, w_, 5, 5, False)
        return dx.astype(jnp.float32)[:1, :1, :1, :1] + \
            dw.astype(jnp.float32)[:1, :1, :1]
    bench("fused(dx+dw)", piece_loop(fused_piece))

    # numeric spot-check of the fused pair on-chip vs the split pair
    fdx, fdw = jax.jit(lambda a, b, g_: _dxdw_pallas(a, g_, b, 5, 5, False))(
        x, wk, g)
    sdx0 = jax.jit(lambda a, b, g_: _dx_native(g_, b, a.shape, a.dtype))(
        x, wk, g)
    sdw0 = jax.jit(lambda a, b, g_: _dw_pallas(a, g_, 5, 5, False))(x, wk, g)
    print(json.dumps({
        "check": "fused_vs_split",
        "max_abs_dx": float(jnp.max(jnp.abs(
            fdx.astype(jnp.float32) - sdx0.astype(jnp.float32)))),
        "max_rel_dw": float(jnp.max(jnp.abs(fdw - sdw0)
                                    / (jnp.abs(sdw0) + 1e-6))),
    }), flush=True)

    # on-chip numeric check: split vs XLA's own VJP of the same native fwd
    sdx, sdw = jax.jit(lambda a, b, g_: jax.grad(
        lambda a_, b_: loss(native_vjp_depthwise_conv2d, a_, b_, g_),
        argnums=(0, 1))(a, b))(x, wk, g)
    ndx, ndw = jax.jit(lambda a, b, g_: jax.grad(
        lambda a_, b_: loss(native_depthwise_conv2d, a_, b_, g_),
        argnums=(0, 1))(a, b))(x, wk, g)
    edx = float(jnp.max(jnp.abs(sdx.astype(jnp.float32) -
                                ndx.astype(jnp.float32))))
    rdw = float(jnp.max(jnp.abs(sdw - ndw) / (jnp.abs(ndw) + 1e-6)))
    print(json.dumps({"check": "grads_vs_xla_vjp", "max_abs_dx": edx,
                      "max_rel_dw": rdw}), flush=True)


if __name__ == "__main__":
    main()
