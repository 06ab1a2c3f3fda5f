"""Roofline accounting for the flagship forward on the local chip.

Prints the compiled executable's FLOP count and bytes-accessed
(``cost_analysis()``), the measured throughput, and where the shape sits
against the chip's two ceilings:

  * compute bound: flops / peak_bf16_flops
  * memory bound:  bytes / hbm_bandwidth

If measured time ~= the memory bound, the forward is HBM-bound and further
kernel work must REDUCE BYTES (fusion), not FLOPs. VERDICT r3 weak #2 asked
for exactly this arithmetic to decide whether the flat ~26 img/s forward is
"done" or "stalled".

Run: ``python tools/roofline.py`` (tunneled TPU).
Env: MDE_BENCH_BATCH (default 8), MDE_BENCH_ENCODER (default base).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# v5e: 197 TFLOP/s bf16 MXU peak, ~819 GB/s HBM
PEAK_FLOPS = 197e12
HBM_GBPS = 819e9


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mde_tpu.core.config import load_config
    from mde_tpu.models import build_model

    encoder_type = os.environ.get("MDE_BENCH_ENCODER", "base")
    batch = int(os.environ.get("MDE_BENCH_BATCH", "8"))
    opt = load_config({
        "model": {
            "name": "oda2_red_order_swin2", "encoder_type": encoder_type,
            "dec_dim": 512, "num_heads": 8, "num_repeats": 3, "num_emb": 128,
            "window_size": 8, "neck_type": "red33",
        },
    })
    model = build_model(opt, 0.001, 80.0, dtype=jnp.bfloat16,
                        use_checkpoint=False)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 352, 704, 3),
                    jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x[:1], train=False))()

    fwd = jax.jit(lambda p, images: model.apply(p, images, train=False)[0])
    compiled = fwd.lower(variables, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byte_keys = [k for k in cost if "bytes accessed" in k]
    bytes_total = float(cost.get("bytes accessed", 0.0))

    # measured time, fori-slope method (see bench.py for the rationale)
    @jax.jit
    def loop(params, images, n):
        def body(_, acc):
            pred = model.apply(params,
                               images + acc * jnp.asarray(1e-12, images.dtype),
                               train=False)[0]
            return jnp.mean(pred).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    def timed(n):
        t0 = time.perf_counter()
        float(loop(variables, x, n))
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(2) for _ in range(2))
    t2 = min(timed(12) for _ in range(2))
    ms = max(t2 - t1, 1e-9) / 10 * 1000

    compute_ms = flops / PEAK_FLOPS * 1000
    memory_ms = bytes_total / HBM_GBPS * 1000
    bound = "memory" if memory_ms > compute_ms else "compute"
    ridge = max(compute_ms, memory_ms)
    print(json.dumps({
        "metric": "flagship_fwd_roofline",
        "batch": batch,
        "measured_ms": round(ms, 1),
        "tflops": round(flops / 1e12, 3),
        "gbytes_accessed": round(bytes_total / 1e9, 2),
        "compute_bound_ms": round(compute_ms, 1),
        "memory_bound_ms": round(memory_ms, 1),
        "bound": bound,
        "pct_of_roofline": round(100 * ridge / ms, 1),
        "byte_keys_present": byte_keys[:3],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
