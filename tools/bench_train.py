"""Train-step benchmark: flagship fwd+loss+bwd+clip+AdamW on the local chip.

Prints ONE JSON line {"metric": "flagship_train_images_per_sec", ...} plus a
context line with the paired inference-forward time so the fwd:train ratio is
measured in the same process (same axon-tunnel methodology as bench.py:
iterations chained inside jit, per-iter time from the slope between two trip
counts).

Round-1 baseline (XLA-recompute attention backwards): 1188 ms/step at
batch 4 -> 3.4 img/s, fwd:train ~ 1:6.5 (BASELINE.md).
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

    encoder_type = os.environ.get("MDE_BENCH_ENCODER", "base")
    opt = load_config({
        "model": {
            "name": "oda2_red_order_swin2", "encoder_type": encoder_type,
            "dec_dim": 512, "num_heads": 8, "num_repeats": 3, "num_emb": 128,
            "window_size": 8, "neck_type": "red33",
            # unrolled repeats are the production default (8% faster step);
            # MDE_BENCH_SCAN=1 A/Bs the nn.scan layout
            "scan_repeats": os.environ.get("MDE_BENCH_SCAN", "0") != "0",
        },
        "loss": {"alpha": 10.0, "beta": 0.15, "per_image": True,
                 "si_weight": 1.0},
        "optimizer": {"lr": 1e-4, "betas": [0.9, 0.999], "weight_decay": 0.1,
                      "eps": 1e-6, "same_lr": True},
        "scheduler": {"name": "onecycle"},
        "train": {"num_accum": 1, "grad_norm": 0.1},
    })
    # MDE_BENCH_REMAT=0 disables remat (fits only if the fused-backward
    # attention freed enough HBM); default keeps the production remat
    model = build_model(opt, 0.001, 80.0, dtype=jnp.bfloat16,
                        use_checkpoint=os.environ.get(
                            "MDE_BENCH_REMAT", "1") != "0")

    batch = int(os.environ.get("MDE_BENCH_BATCH", "4"))
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

    # chain n full steps (fwd+loss+bwd+clip+AdamW+state swap) inside ONE jit:
    # a single dispatch per timed call, so the measurement is device time.
    # The per-call Python-dispatch loop below it measures the same step the
    # way the driver issues it — on the tunneled chip that adds ~170 ms/call
    # of request overhead that does not exist on a directly-attached TPU
    # (~100 us/dispatch), so the chained number is the deployment one.
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(state, n):
        def body(i, carry):
            s, acc = carry
            s2, logs = step(s, {"image": x, "depth": d},
                            jax.random.fold_in(jax.random.PRNGKey(1), i))
            return (s2, acc + logs["loss"])
        return jax.lax.fori_loop(0, n, body, (state, jnp.zeros(())))

    def timed_chain(n):
        nonlocal state
        t0 = time.perf_counter()
        state, acc = chained(state, n)
        loss = float(acc)  # sync point
        assert np.isfinite(loss), loss
        return time.perf_counter() - t0

    timed_chain(1)  # compile + warmup
    n1, n2 = 1, 5
    t1 = min(timed_chain(n1) for _ in range(2))
    t2 = min(timed_chain(n2) for _ in range(2))
    step_s = max(t2 - t1, 1e-9) / (n2 - n1)
    train_img_s = batch / step_s

    def timed_train(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, logs = step(state, {"image": x, "depth": d},
                               jax.random.PRNGKey(1))
        loss = float(logs["loss"])  # sync point
        assert np.isfinite(loss), loss
        return time.perf_counter() - t0

    timed_train(1)  # untimed warmup: primes the per-dispatch execute path
    # 3 repetitions per trip count: per-call tunnel overhead (~170 ms) makes
    # the dispatched path much noisier than the chained number it
    # contextualizes, so min-of-3 instead of min-of-2 (ADVICE r3)
    t1 = min(timed_train(n1) for _ in range(3))
    t2 = min(timed_train(n2) for _ in range(3))
    dispatch_step_s = max(t2 - t1, 1e-9) / (n2 - n1)

    # paired inference forward, same process/method as bench.py
    @jax.jit
    def loop(params, images, n):
        def body(_, acc):
            pred, _, _ = model.apply(
                params, images + acc * jnp.asarray(1e-12, images.dtype),
                train=False)
            return jnp.mean(pred).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    fwd_vars = {"params": state.params, "batch_stats": state.batch_stats}

    def timed_fwd(n):
        t0 = time.perf_counter()
        float(loop(fwd_vars, x, n))
        return time.perf_counter() - t0

    timed_fwd(1)
    f1 = min(timed_fwd(2) for _ in range(2))
    f2 = min(timed_fwd(12) for _ in range(2))
    fwd_s = max(f2 - f1, 1e-9) / 10

    print(json.dumps({
        "metric": "flagship_train_images_per_sec",
        "value": round(train_img_s, 2),
        "unit": "img/s",
        "step_ms": round(step_s * 1000, 1),
        "dispatched_step_ms": round(dispatch_step_s * 1000, 1),
        "fwd_ms": round(fwd_s * 1000, 1),
        "fwd_train_ratio": round(step_s / fwd_s, 2),
        "model": f"oda2_red_order_swin2(swin-{encoder_type[0].upper()}, dec512, rep3, red33)",
        "shape": [batch, 352, 704, 3],
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
