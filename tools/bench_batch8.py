"""Batch-8 train fit/throughput matrix on the single chip.

Round-3 left batch-8 training OOM at 16 GB HBM. Levers to A/B here:
  * optimizer.moment_dtype=bfloat16 (Adam mu in bf16, ~120 MB off)
  * MDE_REMAT_POLICY=save_sa (drop the ~410 MB/FF dw_conv saves — 6x more
    at batch 8 than the mu saving, at the cost of conv recompute)
  * full remat

Prints one JSON line per configuration: fits / step_ms / img/s, plus device
memory stats when the runtime exposes them. Compares against the batch-4
default so the winner is auditable.

Run: MDE_REMAT_POLICY=<policy> python tools/bench_batch8.py  (tunneled TPU)
Env: MDE_BENCH_BATCH (default 8), MDE_BENCH_MOMENT_DTYPE (default bfloat16).
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
    from mde_tpu.core.config import load_config
    from mde_tpu.models import build_model
    from mde_tpu.train.optim import build_optimizer
    from mde_tpu.train.state import TrainState
    from mde_tpu.train.step import make_train_step

    batch = int(os.environ.get("MDE_BENCH_BATCH", "8"))
    moment_dtype = os.environ.get("MDE_BENCH_MOMENT_DTYPE", "bfloat16")
    policy = os.environ.get("MDE_REMAT_POLICY", "save_sa_conv")

    opt = load_config({
        "model": {
            "name": "oda2_red_order_swin2", "encoder_type": "base",
            "dec_dim": 512, "num_heads": 8, "num_repeats": 3, "num_emb": 128,
            "window_size": 8, "neck_type": "red33",
        },
        "loss": {"alpha": 10.0, "beta": 0.15, "per_image": True,
                 "si_weight": 1.0},
        "optimizer": {"lr": 1e-4, "betas": [0.9, 0.999], "weight_decay": 0.1,
                      "eps": 1e-6, "same_lr": True,
                      **({"moment_dtype": moment_dtype}
                         if moment_dtype != "float32" else {})},
        "scheduler": {"name": "onecycle"},
        "train": {"num_accum": 1, "grad_norm": 0.1},
    })
    model = build_model(opt, 0.001, 80.0, dtype=jnp.bfloat16,
                        use_checkpoint=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 352, 704, 3), jnp.float32)
    d = jnp.asarray(rng.uniform(0.5, 60.0, (batch, 352, 704, 1)), jnp.float32)

    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x[:1], train=False))()
    tx = build_optimizer(opt, total_steps=1000)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=1,
                           donate=True)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(state, n):
        def body(i, carry):
            s, acc = carry
            s2, logs = step(s, {"image": x, "depth": d},
                            jax.random.fold_in(jax.random.PRNGKey(1), i))
            return (s2, acc + logs["loss"])
        return jax.lax.fori_loop(0, n, body, (state, jnp.zeros(())))

    out = {"metric": "flagship_train_batch_fit", "batch": batch,
           "remat_policy": policy, "moment_dtype": moment_dtype}
    try:
        def timed(n):
            nonlocal state
            t0 = time.perf_counter()
            state, acc = chained(state, n)
            assert np.isfinite(float(acc))
            return time.perf_counter() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(2))
        t2 = min(timed(5) for _ in range(2))
        step_s = max(t2 - t1, 1e-9) / 4
        out.update(fits=True, step_ms=round(step_s * 1000, 1),
                   img_s=round(batch / step_s, 2))
    except Exception as e:  # noqa: BLE001 — report OOMs as data
        msg = str(e)
        out.update(fits=False,
                   error=("RESOURCE_EXHAUSTED" if "RESOURCE_EXHAUSTED" in msg
                          or "Out of memory" in msg else msg[:200]))

    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            out["peak_bytes_in_use_gb"] = round(
                stats.get("peak_bytes_in_use", 0) / 2 ** 30, 2)
            out["bytes_limit_gb"] = round(
                stats.get("bytes_limit", 0) / 2 ** 30, 2)
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
