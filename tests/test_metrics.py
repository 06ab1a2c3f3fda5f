import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mde_tpu.core import metrics
from mde_tpu.core.averages import RunningAverage, RunningAverageDict


def _rand_depths(n=5000, seed=0):
    rng = np.random.RandomState(seed)
    gt = rng.uniform(0.5, 80.0, size=n).astype(np.float64)
    pred = gt * rng.uniform(0.7, 1.4, size=n)
    return gt, pred


def test_compute_errors_formulas():
    gt, pred = _rand_depths()
    m = metrics.compute_errors(gt, pred)
    # independent recomputation of two metrics
    assert m["abs_rel"] == pytest.approx(np.mean(np.abs(gt - pred) / gt))
    err = np.log(pred) - np.log(gt)
    assert m["silog"] == pytest.approx(
        np.sqrt(np.mean(err ** 2) - np.mean(err) ** 2) * 100)
    assert 0.0 <= m["a1"] <= 1.0
    assert set(m) == set(metrics.METRIC_NAMES)


def test_jax_matches_numpy_with_mask():
    gt, pred = _rand_depths(n=4096, seed=1)
    mask = np.zeros_like(gt, dtype=bool)
    mask[::3] = True

    ref = metrics.compute_errors(gt[mask], pred[mask])
    got = jax.jit(metrics.compute_errors_jax)(
        jnp.asarray(gt, jnp.float32), jnp.asarray(pred, jnp.float32),
        jnp.asarray(mask))
    for k in metrics.METRIC_NAMES:
        assert float(got[k]) == pytest.approx(ref[k], rel=2e-3, abs=2e-3), k


def test_eval_masks():
    opt_garg = {"garg_crop": True, "eigen_crop": False}
    m = metrics.eval_mask(opt_garg, (352, 1216), "KITTI")
    # exact crop bounds from reference fractions (utils/depth_utils.py:9-13)
    assert m[int(0.40810811 * 352), int(0.03594771 * 1216)]
    assert not m[0, 0]
    rows = np.where(m.any(axis=1))[0]
    assert rows[0] == int(0.40810811 * 352)
    assert rows[-1] == int(0.99189189 * 352) - 1

    opt_eigen = {"garg_crop": False, "eigen_crop": True}
    m2 = metrics.eval_mask(opt_eigen, (480, 640), "NYU")
    assert m2[45:471, 41:601].all()
    assert m2.sum() == (471 - 45) * (601 - 41)

    with pytest.raises(ValueError):
        metrics.eval_mask({"garg_crop": False, "eigen_crop": False}, (10, 10), "KITTI")


def test_running_average_semantics():
    ra = RunningAverage()
    vals = [1.0, 2.0, 6.0]
    for v in vals:
        ra.append(v)
    assert ra.get_value() == pytest.approx(np.mean(vals))
    assert ra.count == 3

    rad = RunningAverageDict()
    rad.update({"a": 1.0, "b": 2.0})
    rad.update({"a": 3.0, "b": 4.0})
    got = rad.get_value()
    assert got["a"] == pytest.approx(2.0)
    assert got["b"] == pytest.approx(3.0)
