import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mde_tpu.train.loss import silog_loss, chamfer_bin_loss, sog_loss, DepthLoss


def test_silog_zero_for_perfect_pred():
    gt = jnp.asarray(np.random.RandomState(0).uniform(1, 10, (2, 8, 8, 1)),
                     jnp.float32)
    mask = jnp.ones_like(gt, bool)
    loss = jax.jit(lambda: silog_loss(gt, gt, mask))()
    # sqrt(eps) floor only
    assert float(loss) < 1e-2


def test_silog_matches_manual_formula():
    rng = np.random.RandomState(1)
    gt = rng.uniform(1, 10, (3, 16)).astype(np.float32)
    pred = gt * rng.uniform(0.8, 1.2, gt.shape).astype(np.float32)
    mask = rng.rand(*gt.shape) > 0.3

    got = float(jax.jit(
        lambda: silog_loss(jnp.asarray(pred)[:, :, None, None],
                           jnp.asarray(gt)[:, :, None, None],
                           jnp.asarray(mask)[:, :, None, None],
                           alpha=10.0, beta=0.15, per_image=False))())
    d = (np.log(pred) - np.log(gt))[mask]
    want = 10.0 * np.sqrt(np.mean(d ** 2) - 0.15 * np.mean(d) ** 2)
    assert got == pytest.approx(want, rel=1e-4)


def test_silog_per_image_vs_batch_differ():
    rng = np.random.RandomState(2)
    gt = jnp.asarray(rng.uniform(1, 10, (4, 8, 8, 1)), jnp.float32)
    pred = gt * jnp.asarray(rng.uniform(0.5, 2.0, gt.shape), jnp.float32)
    mask = jnp.ones_like(gt, bool)
    a = float(jax.jit(lambda: silog_loss(pred, gt, mask, per_image=True))())
    b = float(jax.jit(lambda: silog_loss(pred, gt, mask, per_image=False))())
    assert a != pytest.approx(b, rel=1e-6)


def test_chamfer_zero_when_bins_equal_gt_values():
    # single image where gt takes exactly the bin center values
    centers = jnp.asarray([[1.0, 2.0, 3.0]])
    gt = jnp.asarray([1.0, 2.0, 3.0, 2.0]).reshape(1, 2, 2, 1)
    mask = jnp.ones_like(gt, bool)
    loss = float(jax.jit(lambda: chamfer_bin_loss(centers, gt, mask))())
    assert loss == pytest.approx(0.0, abs=1e-6)


def test_chamfer_penalizes_uncovered_gt():
    centers = jnp.asarray([[5.0]])
    gt = jnp.asarray([1.0, 1.0, 1.0, 1.0]).reshape(1, 2, 2, 1)
    mask = jnp.ones_like(gt, bool)
    loss = float(jax.jit(lambda: chamfer_bin_loss(centers, gt, mask))())
    assert loss == pytest.approx(32.0, rel=1e-5)  # 16 (gt->bin) + 16 (bin->gt)


def test_sog_zero_for_scaled_pred():
    """Gradient of log depth is scale invariant -> scaled pred has 0 sog."""
    rng = np.random.RandomState(3)
    gt = jnp.asarray(rng.uniform(1, 10, (1, 8, 8)), jnp.float32)
    mask = jnp.ones_like(gt, bool)
    loss = float(jax.jit(lambda: sog_loss(2.0 * gt, gt, mask))())
    assert loss == pytest.approx(0.0, abs=1e-5)


def test_depth_loss_composite_multi_output():
    opt_loss = {"alpha": 10.0, "beta": 0.15, "per_image": True,
                "si_weight": 1.0, "sog_weight": 0.1, "chamfer_weight": 0.0}
    dl = DepthLoss(opt_loss, 0.001, 80.0)
    rng = np.random.RandomState(4)
    gt = jnp.asarray(rng.uniform(1, 60, (2, 16, 16, 1)), jnp.float32)
    outs = tuple(jnp.asarray(rng.uniform(1, 60, (2, 4, 4, 1)), jnp.float32)
                 for _ in range(3))
    total, logs = jax.jit(lambda: dl(outs, gt))()
    assert float(total) > 0
    assert "loss_si" in logs and "loss_sog" in logs
    assert float(logs["loss"]) == pytest.approx(float(total))
