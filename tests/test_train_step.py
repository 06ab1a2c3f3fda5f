"""End-to-end train/eval step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import optax
import jax.numpy as jnp

from mde_tpu.core.config import load_config
from mde_tpu.models import build_model
from mde_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from mde_tpu.train.optim import build_optimizer, build_lr_schedule
from mde_tpu.train.state import TrainState
from mde_tpu.train.step import make_train_step, make_eval_step

TINY_OPT = {
    "model": {
        "name": "oda2_red_order_swin2", "encoder_type": "custom",
        "dec_dim": 32, "num_heads": 4, "num_repeats": 2, "num_emb": 16,
        "window_size": 4, "neck_type": "red33",
    },
    "loss": {"alpha": 10.0, "beta": 0.15, "per_image": True, "si_weight": 1.0},
    "optimizer": {"lr": 1e-4, "betas": [0.9, 0.999], "weight_decay": 0.1,
                  "eps": 1e-6, "same_lr": True},
    "scheduler": {"name": "onecycle", "pct_start": 0.25, "div_factor": 25,
                  "final_div_factor": 100},
    "train": {"num_accum": 2, "grad_norm": 0.1},
    "eval": {"garg_crop": True, "eigen_crop": False, "flip_eval": False,
             "min_depth_eval": 0.001, "max_depth_eval": 80.0},
}

TINY_ENC = dict(embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                window_size=4)


def _build_tiny():
    opt = load_config(TINY_OPT)
    model = build_model(opt, 0.001, 80.0,
                        use_checkpoint=False, resize_to_multiple=False,
                        encoder_kwargs=TINY_ENC)
    return opt, model


def _fake_batch(b, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 60.0, (b, h, w, 1)), jnp.float32),
    }


@pytest.fixture(scope="module")
def tiny_setup():
    opt, model = _build_tiny()
    batch = _fake_batch(8, 32, 32)
    vs = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)},
                                    batch["image"][:1]))()
    tx = build_optimizer(opt, total_steps=10)
    state = TrainState.create(vs["params"], vs.get("batch_stats", {}), tx)
    return opt, model, batch, tx, state


def test_train_step_runs_and_decreases_nothing_nan(tiny_setup):
    opt, model, batch, tx, state = tiny_setup
    step = make_train_step(model, opt, 0.001, 80.0, tx,
                           num_accum=opt.train.num_accum, donate=False)
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(logs["loss"]))
    assert np.isfinite(float(logs["grad_norm"]))
    # params actually changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # loss goes down over a few steps on a fixed batch
    s, first = state2, float(logs["loss"])
    for i in range(4):
        s, logs = step(s, batch, jax.random.PRNGKey(2 + i))
    assert float(logs["loss"]) < first


@pytest.mark.heavy
def test_grad_accum_matches_single_batch(tiny_setup):
    """num_accum=2 over batch B must equal num_accum=1 over the same batch
    (up to BN-stat ordering differences; we freeze BN to compare exactly)."""
    opt, model, batch, tx, state = tiny_setup
    step1 = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=1,
                            freeze_bn=True, donate=False)
    step2 = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=2,
                            freeze_bn=True, donate=False)
    rng = jax.random.PRNGKey(3)
    sa, la = step1(state, batch, rng)
    sb, lb = step2(state, batch, rng)
    # different microbatch statistics => not bitwise equal, but the gradient
    # direction must be consistent: compare updated params loosely
    da = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(sa.params)])
    db = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(sb.params)])
    cos = float(jnp.dot(da, db) / (jnp.linalg.norm(da) * jnp.linalg.norm(db)))
    assert cos > 0.99


def test_train_step_sharded_over_mesh(tiny_setup):
    """The same train step must run with the batch sharded over 8 devices."""
    opt, model, batch, tx, state = tiny_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    step = make_train_step(model, opt, 0.001, 80.0, tx,
                           num_accum=2, donate=False)
    sharded_batch = shard_batch(mesh, batch)
    sharded_state = replicate(mesh, state)
    with mesh:
        state2, logs = step(sharded_state, sharded_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    # result equals the unsharded run (global-array semantics)
    state_ref, logs_ref = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(logs["loss"]), float(logs_ref["loss"]),
                               rtol=1e-4)


def test_eval_step(tiny_setup):
    opt, model, batch, tx, state = tiny_setup
    ev = make_eval_step(model, opt, 0.001, 80.0, data_type="KITTI")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    m = ev(variables, batch)
    b = batch["image"].shape[0]
    for k in ("a1", "abs_rel", "rmse", "silog"):
        assert m[k].shape == (b,), k  # per-image metrics (batched eval)
        assert np.isfinite(np.asarray(m[k])).all(), k
    assert ((0.0 <= np.asarray(m["a1"])) & (np.asarray(m["a1"]) <= 1.0)).all()


def test_eval_step_batched_matches_per_image(tiny_setup):
    """Batch-of-4 eval == four single-image evals (the reference's
    per-image-then-average protocol survives batching)."""
    opt, model, batch, tx, state = tiny_setup
    ev = make_eval_step(model, opt, 0.001, 80.0, data_type="KITTI")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sub = {k: v[:4] for k, v in batch.items()}
    m_batched = ev(variables, sub)
    for i in range(4):
        one = {k: v[i:i + 1] for k, v in sub.items()}
        m_one = ev(variables, one)
        for k in m_batched:
            np.testing.assert_allclose(float(m_batched[k][i]),
                                       float(m_one[k][0]), rtol=1e-5,
                                       atol=1e-6)


def test_lr_schedule_onecycle_shape():
    opt = load_config(TINY_OPT)
    sched = build_lr_schedule(opt, total_steps=100)
    lr0 = float(sched(0))
    lr_peak = float(sched(25))
    lr_end = float(sched(100))
    assert lr0 == pytest.approx(1e-4 / 25, rel=1e-3)
    assert lr_peak == pytest.approx(1e-4, rel=1e-2)
    assert lr_end == pytest.approx(1e-4 / 25 / 100, rel=0.1)
    assert lr_peak > lr0 > lr_end


def test_freeze_encoder_bn_pins_encoder_stats():
    """train.freeze_encoder_bn switches encoder BNs to eval mode — they
    normalize with running stats and stop updating them — while the rest of
    the batch_stats update (reference utils/common_utils.py:78-81)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from mde_tpu.core.config import load_config
    from mde_tpu.ops import tnn
    from mde_tpu.train.optim import build_optimizer
    from mde_tpu.train.state import TrainState
    from mde_tpu.train.step import make_train_step

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.BatchNorm(
                use_running_average=tnn.bn_use_running_average(self, train),
                name="bn")(x)

    class Model(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = Enc(name="encoder")(x, train)
            h = nn.BatchNorm(
                use_running_average=tnn.bn_use_running_average(self, train),
                name="bn_dec")(h)
            return (nn.sigmoid(nn.Dense(1)(h).mean(axis=-1, keepdims=True)),)

    model = Model()
    opt = load_config({"loss": {"alpha": 10.0, "beta": 0.15},
                       "optimizer": {"lr": 1e-3, "weight_decay": 0.0},
                       "train": {}})
    x = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 3), jnp.float32)
    d = jnp.asarray(np.random.RandomState(1).uniform(1, 5, (4, 8, 8, 1)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = build_optimizer(opt, total_steps=10)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    step = make_train_step(model, opt, 0.1, 10.0, tx, freeze_encoder_bn=True,
                           donate=False)
    new_state, _ = step(state, {"image": x, "depth": d}, jax.random.PRNGKey(1))

    enc_before = jax.tree_util.tree_leaves(state.batch_stats["encoder"])
    enc_after = jax.tree_util.tree_leaves(new_state.batch_stats["encoder"])
    for a, b in zip(enc_before, enc_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    dec_before = jax.tree_util.tree_leaves(state.batch_stats["bn_dec"])
    dec_after = jax.tree_util.tree_leaves(new_state.batch_stats["bn_dec"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(dec_before, dec_after))


def test_bn_freeze_scope_normalizes_with_running_stats():
    """Inside bn_freeze_scope, a BN call with train=True behaves exactly like
    eval mode: it normalizes with RUNNING stats (reference freeze_bn =
    m.eval(), utils/common_utils.py:78-81), not batch statistics."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from mde_tpu.ops import tnn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.BatchNorm(
                use_running_average=tnn.bn_use_running_average(self, train),
                name="bn")(x)

    m = M()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 3) * 3 + 1,
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    # make the running stats distinct from the batch statistics
    variables = jax.device_get(variables)
    variables["batch_stats"]["bn"]["mean"] = np.full(3, 0.5, np.float32)
    variables["batch_stats"]["bn"]["var"] = np.full(3, 4.0, np.float32)

    eval_out = m.apply(variables, x, train=False)
    with tnn.bn_freeze_scope():
        frozen_out, updates = m.apply(variables, x, train=True,
                                      mutable=["batch_stats"])
    live_out = m.apply(variables, x, train=True, mutable=["batch_stats"])[0]

    np.testing.assert_allclose(np.asarray(frozen_out), np.asarray(eval_out),
                               rtol=1e-6)
    assert np.abs(np.asarray(live_out) - np.asarray(eval_out)).max() > 1e-3
    # frozen stats unchanged
    np.testing.assert_array_equal(
        np.asarray(updates["batch_stats"]["bn"]["mean"]),
        variables["batch_stats"]["bn"]["mean"])


def test_zero_grad_bn_pins_bn_params():
    """train.zero_grad_bn (reference utils/common_utils.py:84-89, p.grad=None
    on BN modules): BN scale/bias never update while other params do. BN
    leaves are identified by their module owning mean/var batch stats."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from mde_tpu.core.config import load_config
    from mde_tpu.ops import tnn
    from mde_tpu.train.optim import build_optimizer, bn_label_fn
    from mde_tpu.train.state import TrainState
    from mde_tpu.train.step import make_train_step

    class Model(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.BatchNorm(
                use_running_average=tnn.bn_use_running_average(self, train),
                name="bn")(x)
            h = nn.LayerNorm(name="ln")(h)
            return (nn.sigmoid(nn.Dense(1)(h).mean(axis=-1, keepdims=True)),)

    model = Model()
    opt = load_config({"loss": {"alpha": 10.0, "beta": 0.15},
                       "optimizer": {"lr": 1e-3, "weight_decay": 0.0},
                       "train": {"zero_grad_bn": True}})
    x = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 3), jnp.float32)
    d = jnp.asarray(np.random.RandomState(1).uniform(1, 5, (4, 8, 8, 1)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    labels = bn_label_fn(jax.device_get(variables["params"]),
                         jax.device_get(variables["batch_stats"]))
    # sanity: BN leaves labelled bn, LayerNorm (also scale/bias) stays rest
    assert labels["bn"] == {"scale": "bn", "bias": "bn"}
    assert labels["ln"] == {"scale": "rest", "bias": "rest"}

    tx = build_optimizer(opt, total_steps=10, bn_labels=labels)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = make_train_step(model, opt, 0.1, 10.0, tx, donate=False)
    new_state, _ = step(state, {"image": x, "depth": d}, jax.random.PRNGKey(1))

    np.testing.assert_array_equal(np.asarray(new_state.params["bn"]["scale"]),
                                  np.asarray(state.params["bn"]["scale"]))
    np.testing.assert_array_equal(np.asarray(new_state.params["bn"]["bias"]),
                                  np.asarray(state.params["bn"]["bias"]))
    assert np.abs(np.asarray(new_state.params["ln"]["scale"])
                  - np.asarray(state.params["ln"]["scale"])).max() > 0
    assert np.abs(np.asarray(new_state.params["Dense_0"]["kernel"])
                  - np.asarray(state.params["Dense_0"]["kernel"])).max() > 0


def test_adapter_derives_centers_from_edges():
    """Regression for the chamfer edges-vs-centers bug: edge-emitting families
    (adabins, oda_bins, depthformer_v3) must have bin CENTERS derived before
    chamfer_bin_loss; center-emitting families pass through unchanged, and the
    oda_luna_cls 4-tuple contract must surface its centers (index 2)."""
    from mde_tpu.train.step import make_adapter, bin_edges_to_centers

    n_bins = 8
    pred = jnp.ones((2, 4, 4, 1))
    edges = jnp.cumsum(jnp.ones((2, n_bins + 1)), axis=1)  # (B, n_bins+1)
    centers_true = 0.5 * (edges[:, :-1] + edges[:, 1:])

    # adabins: (pred, edges)
    outs, bins = make_adapter("adabins")((pred, edges))
    assert bins.shape == (2, n_bins)
    np.testing.assert_allclose(np.asarray(bins), np.asarray(centers_true))

    # depthformer_v3: (pred, edges, attn)
    outs, bins = make_adapter("depthformer_v3")((pred, edges, None))
    assert bins.shape == (2, n_bins)

    # depthformer_v7: (pred, centers, attn) — already centers, no conversion
    centers = jnp.linspace(0.0, 1.0, n_bins)[None].repeat(2, 0)
    outs, bins = make_adapter("depthformer_v7")((pred, centers, None))
    np.testing.assert_allclose(np.asarray(bins), np.asarray(centers))

    # oda_luna_cls: (pred, aux, centers, attns) — centers at index 2
    aux = jnp.zeros((2, 5, 16))
    outs, bins = make_adapter("oda_luna_cls")((pred, aux, centers, ()))
    assert bins is not None and bins.shape == (2, n_bins)
    np.testing.assert_allclose(np.asarray(bins), np.asarray(centers))

    # helper itself
    np.testing.assert_allclose(np.asarray(bin_edges_to_centers(edges)),
                               np.asarray(centers_true))


def test_chamfer_loss_wired_through_train_step():
    """A train step on an adabins-like contract with chamfer_weight>0 must log
    a chamfer term computed on (B, n_bins) centers (would previously get the
    (B, n_bins+1) edges)."""
    from mde_tpu.train.loss import DepthLoss
    from mde_tpu.train.step import make_adapter

    opt_loss = {"alpha": 10.0, "beta": 0.15, "per_image": False,
                "si_weight": 1.0, "chamfer_weight": 0.1}
    loss = DepthLoss(opt_loss, 0.001, 80.0)
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.uniform(0.5, 60.0, (2, 8, 8, 1)), jnp.float32)
    pred = jnp.asarray(rng.uniform(0.5, 60.0, (2, 8, 8, 1)), jnp.float32)
    edges = jnp.sort(jnp.asarray(rng.uniform(0.001, 80.0, (2, 9)),
                                 jnp.float32), axis=1)

    outs, bins = make_adapter("adabins")((pred, edges))
    total, logs = loss(outs, gt, bin_centers=bins)
    assert "loss_chamfer" in logs
    # value must equal chamfer on centers, not on edges
    from mde_tpu.train.loss import chamfer_bin_loss
    mask = (gt > 0.001) & (gt <= 80.0)
    want = chamfer_bin_loss(0.5 * (edges[:, :-1] + edges[:, 1:]), gt, mask)
    np.testing.assert_allclose(float(logs["loss_chamfer"]), float(want),
                               rtol=1e-6)


def test_cycle_momentum_schedule():
    """scheduler.cycle_momentum=true cycles AdamW b1 0.95->0.85->0.95 inverse
    to the LR (torch OneCycleLR semantics; exactly one reference config sets
    it true)."""
    from mde_tpu.train.optim import build_momentum_schedule, build_optimizer

    opt = {
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.999], "weight_decay": 0.0},
        "scheduler": {"name": "onecycle", "pct_start": 0.25, "div_factor": 25,
                      "final_div_factor": 100, "cycle_momentum": True},
        "train": {"grad_norm": 0.1},
    }
    sched = build_momentum_schedule(opt, 100)
    assert sched is not None
    np.testing.assert_allclose(float(sched(0)), 0.95, atol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.85, atol=1e-3)
    np.testing.assert_allclose(float(sched(100)), 0.95, atol=1e-3)
    # mid-warmup must sit strictly between
    assert 0.85 < float(sched(12)) < 0.95

    # off by default
    opt["scheduler"]["cycle_momentum"] = False
    assert build_momentum_schedule(opt, 100) is None

    # the injected optimizer still steps
    opt["scheduler"]["cycle_momentum"] = True
    tx = build_optimizer(opt, total_steps=100)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    for _ in range(3):
        upd, st = tx.update({"w": jnp.ones((3,)) * 0.1}, st, params)
        params = optax.apply_updates(params, upd)
    assert np.isfinite(np.asarray(params["w"])).all()


@pytest.mark.heavy
def test_bf16_adam_moments_overfit_drift():
    """optimizer.moment_dtype='bfloat16' (optax mu_dtype) must track the f32
    optimizer closely on a short overfit run — the knob that frees optimizer
    HBM for batch-8 training (VERDICT r3 weak #6)."""
    losses = {}
    for md in ("float32", "bfloat16"):
        cfg = dict(TINY_OPT)
        cfg["optimizer"] = dict(TINY_OPT["optimizer"], lr=3e-3,
                                moment_dtype=md)
        opt = load_config(cfg)
        model = build_model(opt, 0.001, 80.0, use_checkpoint=False,
                            resize_to_multiple=False, encoder_kwargs=TINY_ENC)
        batch = _fake_batch(2, 32, 32, seed=5)
        vs = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)},
                                        batch["image"][:1]))()
        tx = build_optimizer(opt, total_steps=30)
        state = TrainState.create(vs["params"], vs.get("batch_stats", {}), tx)
        step = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=1,
                               donate=False)
        traj = []
        for i in range(12):
            state, logs = step(state, batch, jax.random.PRNGKey(10 + i))
            traj.append(float(logs["loss"]))
        losses[md] = traj
        # mu really is stored in bf16
        mu_leaves = [l for l in jax.tree_util.tree_leaves(state.opt_state)
                     if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
        assert (len(mu_leaves) > 0) == (md == "bfloat16")

    f32, bf16 = np.asarray(losses["float32"]), np.asarray(losses["bfloat16"])
    assert bf16[-1] < bf16[0]  # it still learns
    # trajectories agree to a few percent over the short run
    rel = np.abs(f32 - bf16) / np.maximum(np.abs(f32), 1e-6)
    assert rel.max() < 0.05, (rel.max(), f32[-1], bf16[-1])


def test_resume_across_scan_layout_flip(tmp_path):
    """Save a checkpoint from a scan-layout run, resume into an
    unrolled-layout state (and the reverse): restore_checkpoint_migrating
    converts params, batch_stats AND Adam moments between the layouts
    (ADVICE r3 medium #2 — the driver's resume path uses this helper)."""
    from mde_tpu.core.checkpoint import (save_checkpoint,
                                         restore_checkpoint_migrating)

    def build(scan):
        cfg = dict(TINY_OPT)
        cfg["model"] = dict(TINY_OPT["model"], scan_repeats=scan)
        opt = load_config(cfg)
        model = build_model(opt, 0.001, 80.0, use_checkpoint=False,
                            resize_to_multiple=False, encoder_kwargs=TINY_ENC)
        batch = _fake_batch(2, 32, 32, seed=9)
        vs = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(4)},
                                        batch["image"][:1]))()
        tx = build_optimizer(opt, total_steps=10)
        state = TrainState.create(vs["params"], vs.get("batch_stats", {}), tx)
        step = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=1,
                               donate=False)
        return opt, model, batch, state, step

    # train one step under the SCAN layout and checkpoint it
    _, model_s, batch, state_s, step_s = build(scan=True)
    state_s, _ = step_s(state_s, batch, jax.random.PRNGKey(5))
    path = save_checkpoint(str(tmp_path / "ck"), state_s, step=1)

    # resume into the UNROLLED layout
    _, model_u, _, state_u, step_u = build(scan=False)
    payload = restore_checkpoint_migrating(path, state_u)
    restored = jax.tree_util.tree_map(jnp.asarray, payload["state"])
    # same forward outputs as the scan-layout state
    out_s, _, _ = model_s.apply({"params": state_s.params,
                                 "batch_stats": state_s.batch_stats},
                                batch["image"], train=False)
    out_u, _, _ = model_u.apply({"params": restored.params,
                                 "batch_stats": restored.batch_stats},
                                batch["image"], train=False)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)
    # training continues from the restored state (moments migrated too)
    next_state, logs = step_u(restored, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(logs["loss"]))

    # and the same-layout restore still round-trips untouched
    payload2 = restore_checkpoint_migrating(path, state_s)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        payload2["state"].params, state_s.params)


def test_tensor_parallel_2d_mesh_matches_replicated():
    """Optional tensor parallelism (model.tp_axis): a (data=2, model=4) mesh
    shards the FF hot path (GLU/conv/BN/GELU activations by channel; the
    depthwise conv and BN are exactly channel-parallel) with GSPMD inserting
    the lin3 psum. The sharded train step must reproduce the replicated
    1D-mesh loss (beyond-reference scaling — SURVEY §2.8 marks TP optional)."""
    from mde_tpu.parallel.mesh import MODEL_AXIS

    cfg = dict(TINY_OPT)
    cfg["model"] = dict(TINY_OPT["model"], tp_axis=MODEL_AXIS)
    opt = load_config(cfg)
    model = build_model(opt, 0.001, 80.0, use_checkpoint=False,
                        resize_to_multiple=False, encoder_kwargs=TINY_ENC)
    batch = _fake_batch(4, 32, 32, seed=11)
    vs = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(7)},
                                    batch["image"][:1]))()
    tx = build_optimizer(opt, total_steps=10)
    state = TrainState.create(vs["params"], vs.get("batch_stats", {}), tx)
    step = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=1,
                           donate=False)

    mesh2d = make_mesh(n_data=2, n_model=4)
    assert mesh2d.devices.shape == (2, 4)
    with mesh2d:
        # the constraint must actually APPLY under a plain `with mesh:`
        # context (ADVICE r4 medium #1: the old abstract-mesh guard silently
        # no-oped here, making this test pass vacuously)
        from mde_tpu.ops.mlp import _tp_shard_channels
        act = jax.jit(lambda a: _tp_shard_channels(a, MODEL_AXIS))(
            jnp.ones((2, 4, 4, 8)))
        tp_spec = act.sharding.spec
        assert tuple(tp_spec) and tp_spec[-1] == MODEL_AXIS, tp_spec

        s2d = replicate(mesh2d, state)
        b2d = shard_batch(mesh2d, batch)
        # and the jitted step's program must carry MORE sharding
        # annotations than the tp-less model's (the GLU/conv activation
        # constraints), proving the constraint survives into the traced step
        opt_notp = load_config(TINY_OPT)
        model_notp = build_model(opt_notp, 0.001, 80.0, use_checkpoint=False,
                                 resize_to_multiple=False,
                                 encoder_kwargs=TINY_ENC)
        step_notp = make_train_step(model_notp, opt_notp, 0.001, 80.0, tx,
                                    num_accum=1, donate=False)
        rng8 = jax.random.PRNGKey(8)
        n_tp = step.lower(s2d, b2d, rng8).as_text().count("sharding")
        n_notp = step_notp.lower(s2d, b2d, rng8).as_text().count("sharding")
        assert n_tp > n_notp, (n_tp, n_notp)
        new2d, logs2d = step(s2d, b2d, rng8)
        loss2d = float(logs2d["loss"])

    # reference: same step on a plain data-only mesh (batch 4 -> 4-way)
    mesh1d = make_mesh(n_data=4)
    with mesh1d:
        s1d = replicate(mesh1d, state)
        b1d = shard_batch(mesh1d, batch)
        _, logs1d = step(s1d, b1d, jax.random.PRNGKey(8))
        loss1d = float(logs1d["loss"])

    assert np.isfinite(loss2d)
    np.testing.assert_allclose(loss2d, loss1d, rtol=1e-4)


def test_shard_map_step_matches_gspmd():
    """The explicit-SPMD step (shard_map + pmean — the mode where Pallas
    kernels run per shard on real multi-chip hardware) reproduces the GSPMD
    global-array step exactly under frozen BN, and trains (finite loss,
    stats updated) with BN live (per-shard stats + pmean'd updates — the
    reference's own DDP-without-SyncBN semantics)."""
    from mde_tpu.train.step import make_train_step_shard_map

    opt = load_config(TINY_OPT)
    # path_drop_prob=0: stochastic depth draws from the dropout rng, which
    # the two modes split differently (per-shard fold_in) — everything else
    # is deterministic, so the frozen-BN comparison is exact
    model = build_model(opt, 0.001, 80.0, use_checkpoint=False,
                        resize_to_multiple=False,
                        encoder_kwargs=dict(TINY_ENC, path_drop_prob=0.0))
    # per-shard batch must divide num_accum: 16 images over 8 shards -> 2
    # per shard, 1 per microbatch
    batch = _fake_batch(16, 32, 32, seed=13)
    vs = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(14)},
                                    batch["image"][:1]))()
    tx = build_optimizer(opt, total_steps=10)
    state = TrainState.create(vs["params"], vs.get("batch_stats", {}), tx)
    mesh = make_mesh(n_data=8)

    # frozen BN: bitwise-comparable semantics between the two modes
    step_g = make_train_step(model, opt, 0.001, 80.0, tx, num_accum=2,
                             freeze_bn=True, donate=False)
    step_s = make_train_step_shard_map(model, opt, 0.001, 80.0, tx, mesh,
                                       num_accum=2, freeze_bn=True)
    with mesh:
        sb = shard_batch(mesh, batch)
        st = replicate(mesh, state)
        sg, lg = step_g(st, sb, jax.random.PRNGKey(15))
        ss, ls = step_s(st, sb, jax.random.PRNGKey(15))
    np.testing.assert_allclose(float(ls["loss"]), float(lg["loss"]),
                               rtol=1e-5)
    da = jnp.concatenate([x.ravel() for x in
                          jax.tree_util.tree_leaves(sg.params)])
    db = jnp.concatenate([x.ravel() for x in
                          jax.tree_util.tree_leaves(ss.params)])
    np.testing.assert_allclose(np.asarray(db), np.asarray(da),
                               rtol=1e-4, atol=1e-6)

    # live BN: runs, finite, stats move
    step_live = make_train_step_shard_map(model, opt, 0.001, 80.0, tx, mesh,
                                          num_accum=1)
    with mesh:
        s2, l2 = step_live(st, sb, jax.random.PRNGKey(16))
    assert np.isfinite(float(l2["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        st.batch_stats, s2.batch_stats)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
