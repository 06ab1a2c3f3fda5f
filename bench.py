"""Benchmark: flagship model throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measures images/sec of the flagship ``oda2_red_order_swin2`` (dec_dim 512,
num_repeats 3, neck red33 — the reference's best KITTI config,
``json/kitti/oda2/oda2_red_order_swin2_neck_red33.json``) at KITTI train shape
352x704 (internally resized to 448x896), bf16 activations, inference forward.
Encoder defaults to Swin-B (set MDE_BENCH_ENCODER=large for the Swin-L
variant; its first uncached compile over the axon tunnel takes ~1 h).

Baseline: the reference publishes no numbers (BASELINE.md). ``vs_baseline``
is computed against an *estimated* 8 img/s for the same model in torch fp32 on
the reference's dev GPU (RTX 3080 Ti): ~0.5 TFLOP-fwd/img at the ~15% fp32
utilization typical for Swin-style stacks on that part. The estimate is
documented here so the ratio is interpretable, not authoritative.
"""

import json
import time

import numpy as np

BASELINE_IMG_S = 8.0  # estimated reference torch fp32 fwd on RTX 3080 Ti


def main():
    import os
    import jax
    import jax.numpy as jnp
    # persistent compile cache: the first-ever Swin-L compile over the axon
    # tunnel costs minutes; warmed-cache runs take seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mde_tpu.core.config import load_config
    from mde_tpu.models import build_model

    encoder_type = os.environ.get("MDE_BENCH_ENCODER", "base")
    opt = load_config({
        "model": {
            "name": "oda2_red_order_swin2", "encoder_type": encoder_type,
            "dec_dim": 512, "num_heads": 8, "num_repeats": 3, "num_emb": 128,
            "window_size": 8, "neck_type": "red33",
        },
    })
    model = build_model(opt, 0.001, 80.0, dtype=jnp.bfloat16,
                        use_checkpoint=False)

    batch = 4
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 352, 704, 3),
                    jnp.float32)

    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x[:1], train=False))()

    # params as an explicit jit argument: closed-over arrays are embedded in
    # the serialized program as literals, which blows past remote-compile
    # body limits (HTTP 413) and bloats the compile cache
    @jax.jit
    def fwd(params, images):
        pred, _, _ = model.apply(params, images, train=False)
        return pred

    # warmup / compile
    fwd(variables, x).block_until_ready()
    fwd(variables, x).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    img_s = batch * iters / dt
    print(json.dumps({
        "metric": "flagship_fwd_images_per_sec",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 2),
        "model": f"oda2_red_order_swin2(swin-{encoder_type[0].upper()}, dec512, rep3, red33)",
        "shape": [batch, 352, 704, 3],
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
