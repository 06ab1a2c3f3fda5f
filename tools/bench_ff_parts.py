"""Micro-timings inside the DWConv-GLU FF at flagship shapes.

Times fwd and fwd+grad of each FF stage at (B, 112, 224, .) so kernel work
targets the measured gap, not guesses: lin1 (512->4096), GLU, depthwise 5x5
(2048ch, native grouped vs pallas halo kernel), BN(train), GELU, lin3
(2048->512), and the composed FF chain.

Run: ``python tools/bench_ff_parts.py`` (tunneled TPU).
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

    dtype = jnp.bfloat16
    batch = int(os.environ.get("MDE_BENCH_BATCH", "4"))
    h, w, c = 112, 224, 512
    hid = 4 * c
    rng = np.random.RandomState(0)

    def slope(fn, n1=1, n2=5, reps=2):
        fn(1)
        t1 = min(fn(n1) for _ in range(reps))
        t2 = min(fn(n2) for _ in range(reps))
        return max(t2 - t1, 1e-9) / (n2 - n1)

    def bench(name, f, *args):
        """f(*args) -> scalar-reducible array; times fwd and value+grad."""
        @jax.jit
        def floop(args, n):
            def body(_, acc):
                a0 = (args[0] + acc.astype(args[0].dtype),) + args[1:]
                return jnp.mean(f(*a0).astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def lossf(args):
            return jnp.mean(f(*args).astype(jnp.float32))

        @jax.jit
        def gloop(args, n):
            # consume EVERY grad leaf — reading only g[0] lets XLA dead-code
            # -eliminate the weight-grad computations (DCE bug fixed r4)
            def body(_, acc):
                a0 = (args[0] + acc.astype(args[0].dtype),) + args[1:]
                g = jax.grad(lossf)((a0))
                s = jnp.zeros((), jnp.float32)
                for leaf in jax.tree_util.tree_leaves(g):
                    s = s + jnp.mean(leaf.astype(jnp.float32))
                return s
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def tf(n):
            t0 = time.perf_counter()
            float(floop(args, n))
            return time.perf_counter() - t0

        def tg(n):
            t0 = time.perf_counter()
            float(gloop(args, n))
            return time.perf_counter() - t0

        f_ms = slope(tf) * 1000
        g_ms = slope(tg) * 1000
        print(json.dumps({"part": name, "fwd_ms": round(f_ms, 2),
                          "grad_ms": round(g_ms, 2)}), flush=True)

    x = jnp.asarray(rng.rand(batch, h, w, c), dtype)
    x2 = jnp.asarray(rng.rand(batch, h, w, 2 * hid), dtype)
    xg = jnp.asarray(rng.rand(batch, h, w, hid), dtype)
    w1 = jnp.asarray(rng.rand(c, 2 * hid) * 0.02, dtype)
    w3 = jnp.asarray(rng.rand(hid, c) * 0.02, dtype)
    wk = jnp.asarray(rng.rand(5, 5, hid) * 0.1, dtype)

    bench("lin1(512->4096)", lambda a, b: a @ b, x, w1)
    bench("glu(4096->2048)",
          lambda a: (lambda p, q: p * jax.nn.sigmoid(q))(
              *jnp.split(a, 2, axis=-1)), x2)

    from mde_tpu.ops.pallas.depthwise import (native_depthwise_conv2d,
                                              xla_depthwise_conv2d, _fused)
    bench("dwconv5x5 native(2048ch)", native_depthwise_conv2d, xg, wk)
    bench("dwconv5x5 pallas_kernel", lambda a, b: _fused(a, b, False), xg, wk)
    bench("dwconv5x5 shift-fma", xla_depthwise_conv2d, xg, wk)

    from mde_tpu.ops import tnn
    bench("gelu(2048)", tnn.gelu, xg)
    bench("lin3(2048->512)", lambda a, b: a @ b, xg, w3)

    # composed chain without BN (affine instead), to bound the elementwise glue
    def chain(a, w1_, wk_, w3_):
        y = a @ w1_
        p, q = jnp.split(y, 2, axis=-1)
        g = p * jax.nn.sigmoid(q)
        cv = native_depthwise_conv2d(g, wk_)
        e = tnn.gelu(cv)
        return e @ w3_
    bench("chain lin1+glu+conv+gelu+lin3", chain, x, w1, wk, w3)

    # fused GLU+conv+BN(affine)+GELU kernels vs the unfused composite.
    # The unfused reference uses the NATIVE grouped conv (the production
    # lowering) — the shift-FMA composite OOMs at these shapes on TPU (XLA
    # materializes the 25 shifted slices).
    from mde_tpu.ops.pallas.glu_ff import fused_glu_dwconv_bn_gelu
    s_aff = jnp.asarray(rng.rand(hid) + 0.5, jnp.float32)
    t_aff = jnp.asarray(rng.rand(hid) - 0.5, jnp.float32)

    def unfused_native(ab, w_, s_, t_):
        p, q = jnp.split(ab, 2, axis=-1)
        g = p * jax.nn.sigmoid(q)
        y = native_depthwise_conv2d(g, w_)
        y = y.astype(jnp.float32) * s_ + t_
        return jax.nn.gelu(y, approximate=False).astype(ab.dtype)
    bench("glu+conv+bn+gelu unfused(native)", unfused_native,
          x2, wk, s_aff, t_aff)

    def run_fused(a, b, s_, t_):
        return fused_glu_dwconv_bn_gelu(a, b, s_, t_, impl="pallas")
    os.environ["MDE_GLU_COMBINE"] = "slice"
    bench("glu+conv+bn+gelu fused(slice)", run_fused, x2, wk, s_aff, t_aff)
    os.environ["MDE_GLU_COMBINE"] = "roll"
    bench("glu+conv+bn+gelu fused(roll)", run_fused, x2, wk, s_aff, t_aff)




def norms():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = jnp.bfloat16
    batch = int(os.environ.get("MDE_BENCH_BATCH", "4"))
    rng = np.random.RandomState(0)

    def slope(fn, n1=1, n2=5, reps=2):
        fn(1)
        t1 = min(fn(n1) for _ in range(reps))
        t2 = min(fn(n2) for _ in range(reps))
        return max(t2 - t1, 1e-9) / (n2 - n1)

    def bench_mod(name, mod, x, train_mode):
        variables = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), x))()

        def f(params, x):
            if "batch_stats" in variables and train_mode:
                y, _ = mod.apply({"params": params,
                                  "batch_stats": variables["batch_stats"]},
                                 x, mutable=["batch_stats"])
            else:
                y = mod.apply({"params": params, **{k: v for k, v in
                               variables.items() if k != "params"}}, x)
            return jnp.mean(jnp.tanh(y.astype(jnp.float32)))

        @jax.jit
        def floop(params, x, n):
            def body(_, acc):
                return f(params, x + acc.astype(x.dtype))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        @jax.jit
        def gloop(params, x, n):
            def body(_, acc):
                g = jax.grad(f, argnums=1)(params, x + acc.astype(x.dtype))
                return jnp.mean(g.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def tf(n):
            t0 = time.perf_counter()
            float(floop(variables["params"], x, n))
            return time.perf_counter() - t0

        def tg(n):
            t0 = time.perf_counter()
            float(gloop(variables["params"], x, n))
            return time.perf_counter() - t0

        f_ms = slope(tf) * 1000
        g_ms = slope(tg) * 1000
        print(json.dumps({"part": name, "fwd_ms": round(f_ms, 2),
                          "grad_ms": round(g_ms, 2)}), flush=True)

    from mde_tpu.ops import tnn
    x512 = jnp.asarray(rng.rand(batch, 112, 224, 512), dtype)
    x2048 = jnp.asarray(rng.rand(batch, 112, 224, 2048), dtype)

    bench_mod("LN(512)", tnn.LayerNorm(dtype=dtype, param_dtype=jnp.float32),
              x512, False)
    bench_mod("BN(2048, train)",
              nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, dtype=dtype,
                           param_dtype=jnp.float32),
              x2048, True)
    bench_mod("BN(2048, eval)",
              nn.BatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, dtype=dtype,
                           param_dtype=jnp.float32),
              x2048, False)

    # conv VJP cost: grad through gelu(conv(x)) minus the gelu-alone grad
    from mde_tpu.ops.pallas.depthwise import native_depthwise_conv2d

    def bench_fn(name, f, *args):
        @jax.jit
        def floop(args, n):
            def body(_, acc):
                a0 = (args[0] + acc.astype(args[0].dtype),) + args[1:]
                return jnp.mean(f(*a0).astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def lossf(args):
            return jnp.mean(f(*args).astype(jnp.float32))

        @jax.jit
        def gloop(args, n):
            def body(_, acc):
                a0 = (args[0] + acc.astype(args[0].dtype),) + args[1:]
                g = jax.grad(lossf)((a0))
                s = jnp.zeros((), jnp.float32)
                for leaf in jax.tree_util.tree_leaves(g):
                    s = s + jnp.mean(leaf.astype(jnp.float32))
                return s
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def tf(n):
            t0 = time.perf_counter()
            float(floop(args, n))
            return time.perf_counter() - t0

        def tg(n):
            t0 = time.perf_counter()
            float(gloop(args, n))
            return time.perf_counter() - t0

        f_ms = slope(tf) * 1000
        g_ms = slope(tg) * 1000
        print(json.dumps({"part": name, "fwd_ms": round(f_ms, 2),
                          "grad_ms": round(g_ms, 2)}), flush=True)

    wk = jnp.asarray(rng.rand(5, 5, 2048) * 0.1, dtype)
    bench_fn("gelu(conv(x)) [conv vjp probe]",
             lambda a, b: tnn.gelu(native_depthwise_conv2d(a, b)), x2048, wk)


if __name__ == "__main__" and os.environ.get("MDE_FF_NORMS"):
    norms()
elif __name__ == "__main__":
    main()
