"""Train-step ablation: where do the ~680 ms at batch 4 actually go?

Times, with the same slope method as bench_train.py:

  fwd_eval        model.apply(train=False) (the bench.py forward)
  fwd_train       model.apply(train=True) + SILog loss (no backward)
  vag             value_and_grad of the loss (no clip/optimizer)
  full_step       make_train_step (vag + global-norm clip + AdamW + BN swap)

full_step - vag isolates clip+optimizer; vag - fwd_train isolates the
backward; fwd_train - fwd_eval isolates BN-train/dropout/loss overheads.

Run: ``python tools/bench_step_ablate.py`` (tunneled TPU).
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
    from mde_tpu.train.loss import DepthLoss
    from mde_tpu.train.optim import build_optimizer
    from mde_tpu.train.state import TrainState
    from mde_tpu.train.step import make_train_step, make_adapter

    opt = load_config({
        "model": {
            "name": "oda2_red_order_swin2", "encoder_type": "base",
            "dec_dim": 512, "num_heads": 8, "num_repeats": 3, "num_emb": 128,
            "window_size": 8, "neck_type": "red33",
        },
        "loss": {"alpha": 10.0, "beta": 0.15, "per_image": True,
                 "si_weight": 1.0},
        "optimizer": {"lr": 1e-4, "betas": [0.9, 0.999], "weight_decay": 0.1,
                      "eps": 1e-6, "same_lr": True},
        "scheduler": {"name": "onecycle"},
        "train": {"num_accum": 1, "grad_norm": 0.1},
    })
    model = build_model(opt, 0.001, 80.0, dtype=jnp.bfloat16,
                        use_checkpoint=True)
    depth_loss = DepthLoss(opt["loss"], 0.001, 80.0)
    adapter = make_adapter("oda2_red_order_swin2")

    batch = int(os.environ.get("MDE_BENCH_BATCH", "4"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 352, 704, 3), jnp.float32)
    d = jnp.asarray(rng.uniform(0.5, 60.0, (batch, 352, 704, 1)), jnp.float32)

    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x[:1], train=False))()
    tx = build_optimizer(opt, total_steps=1000)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)

    def slope(fn, n1=1, n2=5, reps=2):
        fn(1)
        t1 = min(fn(n1) for _ in range(reps))
        t2 = min(fn(n2) for _ in range(reps))
        return max(t2 - t1, 1e-9) / (n2 - n1)

    def report(name, ms):
        print(json.dumps({"part": name, "ms": round(ms, 1)}), flush=True)

    dkey = jax.random.PRNGKey(1)

    def loss_of(params, batch_stats, xin):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, xin,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": dkey})
        outs, centers = adapter(out)
        loss, _ = depth_loss(outs, d, bin_centers=centers)
        return loss

    @jax.jit
    def fwd_eval_loop(params, batch_stats, n):
        def body(_, acc):
            pred, *_ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x + acc * jnp.asarray(1e-12, x.dtype), train=False)
            return jnp.mean(pred).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def fwd_train_loop(params, batch_stats, n):
        def body(_, acc):
            return loss_of(params, batch_stats,
                           x + acc * jnp.asarray(1e-12, x.dtype))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def vag_loop(params, batch_stats, n):
        # consume EVERY gradient leaf: touching only one lets XLA dead-code
        # -eliminate the other weight-grad contractions (this tool shipped
        # round 3 with exactly that bug — vag read ~50 ms low)
        def body(_, acc):
            l, g = jax.value_and_grad(loss_of)(
                params, batch_stats, x + acc * jnp.asarray(1e-12, x.dtype))
            s = l
            for leaf in jax.tree_util.tree_leaves(g):
                s = s + jnp.mean(leaf.astype(jnp.float32))
            return s
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    def t_of(loop):
        def t(n):
            t0 = time.perf_counter()
            float(loop(state.params, state.batch_stats, n))
            return time.perf_counter() - t0
        return t

    report("fwd_eval", slope(t_of(fwd_eval_loop)) * 1000)
    report("fwd_train(+loss)", slope(t_of(fwd_train_loop)) * 1000)
    report("value_and_grad", slope(t_of(vag_loop)) * 1000)

    # optimizer in isolation: clip + AdamW + apply on fixed grads
    fixed_grads = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda l: jnp.full_like(l, 1e-6), p))(state.params)

    @jax.jit
    def opt_loop(params, opt_state, n):
        def body(_, carry):
            p, s = carry
            updates, s2 = tx.update(fixed_grads, s, p)
            import optax as _ox
            return (_ox.apply_updates(p, updates), s2)
        return jax.lax.fori_loop(0, n, body, (params, opt_state))

    def t_opt(n):
        t0 = time.perf_counter()
        p, s = opt_loop(state.params, state.opt_state, n)
        jax.block_until_ready(jax.tree_util.tree_leaves(p)[0])
        float(jnp.mean(jax.tree_util.tree_leaves(p)[0]))
        return time.perf_counter() - t0

    report("optimizer(clip+adamw+apply)", slope(t_opt) * 1000)

    step = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=1,
                           donate=True)

    def timed_step(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, logs = step(state, {"image": x, "depth": d},
                               jax.random.PRNGKey(1))
        float(logs["loss"])
        return time.perf_counter() - t0

    report("full_step", slope(timed_step) * 1000)


if __name__ == "__main__":
    main()
