"""Family benchmarks: AdaBins and NewCRFs forward throughput on the chip.

The reference's headline models beyond the ODA2 flagship (SURVEY §2.2/2.3:
AdaBins' UnetAdaptiveBins on NYU, NewCRFDepth with the Swin window-CRF
decoder on KITTI). One JSON line per model, same fori-slope methodology as
bench.py. Both stacks route their GELUs through ``ops/tnn.gelu`` and their
window attention through the fused Pallas kernels, so kernel-level wins
(e.g. the round-5 dtype-dispatched GELU) propagate here — this tool records
that the framework is fast across the model zoo, not just on the flagship.

Env: MDE_BENCH_BATCH (default 8), MDE_FAMILIES (comma list, default
"adabins,newcrfs").
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def bench_model(name: str, model_cfg: dict, hw, batch, min_d, max_d,
                data_type: str):
    import jax
    import jax.numpy as jnp
    from mde_tpu.core.config import load_config
    from mde_tpu.models import build_model

    opt = load_config({"model": model_cfg,
                       "dataset": {"data_type": data_type}})
    model = build_model(opt, min_d, max_d, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, *hw, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x[:1], train=False))()

    def fwd(params, images):
        out = model.apply(params, images, train=False)
        return out[0] if isinstance(out, tuple) else out

    @jax.jit
    def loop(params, images, n):
        def body(_, acc):
            pred = fwd(params, images + acc * jnp.asarray(1e-12, images.dtype))
            return jnp.mean(pred).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    def timed(n):
        t0 = time.perf_counter()
        r = float(loop(variables, x, n))
        assert np.isfinite(r), r
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(2) for _ in range(2))
    t2 = min(timed(12) for _ in range(2))
    img_s = batch * 10 / max(t2 - t1, 1e-9)

    flops = None
    try:
        cost = jax.jit(fwd).lower(variables, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"]) / batch
    except Exception:
        pass
    mfu = img_s * flops / 197e12 if flops else None

    print(json.dumps({
        "metric": f"{name}_fwd_images_per_sec",
        "value": round(img_s, 2), "unit": "img/s",
        "mfu": round(mfu, 4) if mfu else None,
        "tflops_per_img": round(flops / 1e12, 4) if flops else None,
        "shape": [batch, *hw, 3], "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }), flush=True)


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batch_env = os.environ.get("MDE_BENCH_BATCH", "")
    fams = os.environ.get("MDE_FAMILIES", "adabins,newcrfs").split(",")
    if "adabins" in fams:
        # reference NYU config (json/nyu/adabins/adabins_cham_per_batch.json):
        # UnetAdaptiveBins, 256 bins, NYU train crop 416x544
        bench_model("adabins", {"name": "adabins", "num_bins": 256,
                                "bn_momentum": 0.1},
                    (416, 544), int(batch_env or 8), 1e-3, 10.0, "NYU")
    if "newcrfs" in fams:
        # reference KITTI eval config (json/kitti/newcrfs/newcrfs_github_eval
        # .json): Swin-L (large07) + window-CRF decoder, KB-crop 352x1216.
        # Default batch 4: batch 8 at this shape exhausts the 16 GB HBM and
        # takes the TPU worker down (measured round 5)
        bench_model("newcrfs", {"name": "newcrfs"},
                    (352, 1216), int(batch_env or 4), 1e-3, 80.0, "KITTI")


if __name__ == "__main__":
    main()
