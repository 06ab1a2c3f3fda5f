"""Depthwise-conv kernel shootout at flagship FF shapes.

The 5x5 depthwise conv over (B, 112, 224, 2048) bf16 is the largest single
term in the DWConv-GLU FF (native grouped conv: 8.8 ms fwd at batch 4 —
~3x the ~2.6 ms VPU tap floor + ~1 ms HBM bound). Candidate lowerings:

  native   XLA feature_group_count conv (current production default)
  slice    halo kernel, per-j padded-width FMA + sublane-shifted slice
           (current ``impl='pallas_kernel'``; the slice relayouts dominate)
  roll     same halo kernel but the W-tap combine uses ``pltpu.roll``
           (sublane dynamic-rotate) + an aligned prefix slice

Run: ``python tools/bench_dwconv_variants.py`` (tunneled TPU).
"""

import functools
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

    from mde_tpu.ops.pallas.depthwise import (native_depthwise_conv2d,
                                              _fused, roll_depthwise_conv2d)

    dtype = jnp.bfloat16
    batch = int(os.environ.get("MDE_BENCH_BATCH", "4"))
    h, w, c = 112, 224, 2048
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, h, w, c), dtype)
    wk = jnp.asarray(rng.rand(5, 5, c) * 0.1, dtype)

    def slope(fn, n1=1, n2=5, reps=2):
        fn(1)
        t1 = min(fn(n1) for _ in range(reps))
        t2 = min(fn(n2) for _ in range(reps))
        return max(t2 - t1, 1e-9) / (n2 - n1)

    ref = np.asarray(native_depthwise_conv2d(x, wk), np.float32)

    def bench(name, f):
        out = np.asarray(f(x, wk), np.float32)
        err = float(np.max(np.abs(out - ref)))

        @jax.jit
        def loop(args, n):
            def body(_, acc):
                a0 = args[0] + acc.astype(args[0].dtype)
                return jnp.mean(f(a0, args[1]).astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        def t(n):
            t0 = time.perf_counter()
            float(loop((x, wk), n))
            return time.perf_counter() - t0

        ms = slope(t) * 1000
        print(json.dumps({"variant": name, "fwd_ms": round(ms, 2),
                          "max_abs_vs_native": err}), flush=True)

    def blockdiag(gs):
        """Depthwise conv embedded in a group-size-``gs`` grouped conv:
        weights are block-diagonal (zeros kill cross-channel terms) so the
        result is exact, but the conv becomes MXU-eligible."""
        def f(a, b):
            from mde_tpu.ops.pad import pad2d
            kh, kw, c = b.shape
            eye = (jnp.arange(gs)[:, None]
                   == (jnp.arange(c) % gs)[None, :]).astype(a.dtype)
            wb = b.astype(a.dtype)[:, :, None, :] * eye[None, None]
            xp = pad2d(a, kh // 2, kh // 2, kw // 2, kw // 2, mode="edge")
            return jax.lax.conv_general_dilated(
                xp, wb, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c // gs)
        return f

    bench("native", native_depthwise_conv2d)
    bench("blockdiag_gs8", blockdiag(8))
    bench("blockdiag_gs16", blockdiag(16))
    bench("blockdiag_gs32", blockdiag(32))
    bench("blockdiag_gs128", blockdiag(128))
    bench("slice_kernel", lambda a, b: _fused(a, b, False))
    bench("roll_kernel", lambda a, b: roll_depthwise_conv2d(a, b))


if __name__ == "__main__":
    main()
