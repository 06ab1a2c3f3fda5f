"""Per-component fwd/bwd timings for the flagship train step.

Times (fori-slope method, same as bench.py) the forward and the
value-and-grad of each flagship component at bench shapes so optimization
effort follows measurement:

  * Swin-B encoder (448x896 input, selective remat as in training)
  * OrderedSwinBlock (2x SA + 2x DWConv-GLU FF; 3 instances in the head)
  * PreNormOrderedSwinSA alone (6 instances)
  * PreNormDWConvFF alone (6 instances)

Run: ``python tools/bench_train_parts.py`` (tunneled TPU).
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

    from mde_tpu.models.swin import swin_base
    from mde_tpu.models.oda2.red_order_swin2 import OrderedSwinBlock
    from mde_tpu.ops.mlp import PreNormDWConvFF
    from mde_tpu.ops.ordered_attention import PreNormOrderedSwinSA

    dtype = jnp.bfloat16
    batch = int(os.environ.get("MDE_BENCH_BATCH", "4"))
    rng = np.random.RandomState(0)

    def slope(fn, n1=1, n2=4, reps=2):
        fn(1)  # compile + warmup
        t1 = min(fn(n1) for _ in range(reps))
        t2 = min(fn(n2) for _ in range(reps))
        return max(t2 - t1, 1e-9) / (n2 - n1)

    def time_module(name, module, make_args, train_kw=True):
        """fwd + value_and_grad ms via chained fori loops."""
        args = make_args()
        variables = jax.jit(
            lambda: module.init({"params": jax.random.PRNGKey(0)},
                                *args, **({"train": False} if train_kw else {}))
        )()

        def fwd_once(params, args, eps):
            a0 = args[0] + eps.astype(args[0].dtype)
            out = module.apply(
                {"params": params,
                 **({"batch_stats": variables["batch_stats"]}
                    if "batch_stats" in variables else {})},
                a0, *args[1:],
                **({"train": False} if train_kw else {}))
            leaf = out[0] if isinstance(out, tuple) else out
            while isinstance(leaf, (tuple, list)):
                leaf = leaf[0]
            return jnp.mean(leaf.astype(jnp.float32))

        @jax.jit
        def floop(params, args, n):
            def body(_, acc):
                return fwd_once(params, args, acc * 1e-12)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def loss_fn(params, args, eps):
            rngs = {"dropout": jax.random.PRNGKey(1)} if train_kw else None
            if "batch_stats" not in variables:
                a0 = args[0] + eps.astype(args[0].dtype)
                out = module.apply(
                    {"params": params}, a0, *args[1:], rngs=rngs,
                    **({"train": True} if train_kw else {}))
            else:
                a0 = args[0] + eps.astype(args[0].dtype)
                out, _ = module.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    a0, *args[1:], rngs=rngs,
                    **({"train": True} if train_kw else {}),
                    mutable=["batch_stats"])
            leaf = out[0] if isinstance(out, tuple) else out
            while isinstance(leaf, (tuple, list)):
                leaf = leaf[0]
            return jnp.mean(leaf.astype(jnp.float32))

        @jax.jit
        def gloop(params, args, n):
            def body(_, acc):
                g = jax.grad(loss_fn)(params, args, acc * 1e-12)
                return jnp.mean(jax.flatten_util.ravel_pytree(g)[0]
                                .astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def tf(n):
            t0 = time.perf_counter()
            float(floop(variables["params"], args, n))
            return time.perf_counter() - t0

        def tg(n):
            t0 = time.perf_counter()
            float(gloop(variables["params"], args, n))
            return time.perf_counter() - t0

        f_ms = slope(tf) * 1000
        g_ms = slope(tg) * 1000
        print(json.dumps({"component": name, "fwd_ms": round(f_ms, 2),
                          "grad_ms": round(g_ms, 2),
                          "bwd_over_fwd": round(g_ms / max(f_ms, 1e-9), 2)}))
        return f_ms, g_ms

    import jax.flatten_util  # noqa: F401  (used inside gloop)

    h4, w4, c = 112, 224, 512
    x_feat = jnp.asarray(rng.rand(batch, h4, w4, c), dtype)
    idx = jnp.asarray(rng.randint(0, 128, (batch, h4, w4)), jnp.int32)

    enc = swin_base(dtype=dtype, use_checkpoint=True)
    x_img = jnp.asarray(rng.rand(batch, 448, 896, 3), dtype)
    time_module("swin_b_encoder(448x896, remat)", enc, lambda: (x_img,))

    blk = OrderedSwinBlock(num_heads=8, num_emb=128, window_size=8,
                           dtype=dtype)
    time_module("ordered_swin_block(112x224x512) x3 in head", blk,
                lambda: (x_feat, idx))

    sa = PreNormOrderedSwinSA(num_heads=8, num_emb=128, window_size=8,
                              dtype=dtype)
    time_module("ordered_sa(112x224x512) x6 in head", sa,
                lambda: (x_feat, idx))

    ff = PreNormDWConvFF(dtype=dtype)
    time_module("dwconv_glu_ff(112x224x512) x6 in head", ff,
                lambda: (x_feat,))


if __name__ == "__main__":
    main()
