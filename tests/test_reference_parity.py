"""Direct numerical parity against the reference's own metric code.

Imports ``/root/reference/utils/depth_utils.py`` at test time (read-only
public mount; skipped when absent) and checks our ``core/metrics.py`` against
it on random data — the strongest evidence the 9 eval metrics and crop masks
match bit-for-bit. ``cal_eval_mask`` uses the removed ``np.bool`` alias and
cannot run under numpy 2, so the mask comparison recomputes its documented
fraction arithmetic (``utils/depth_utils.py:9-24``) instead of calling it.
"""

import importlib.util
import os

import numpy as np
import pytest

from mde_tpu.core.metrics import compute_errors, compute_errors_jax, eval_mask

REF = "/root/reference/utils/depth_utils.py"


def _load_reference_metrics():
    spec = importlib.util.spec_from_file_location("ref_depth_utils", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isfile(REF), reason="reference not mounted")
def test_compute_errors_matches_reference():
    ref = _load_reference_metrics()
    rng = np.random.RandomState(0)
    gt = rng.uniform(0.5, 60.0, size=20000)
    pred = gt * rng.uniform(0.7, 1.4, size=gt.shape)

    theirs = ref.tcompute_errors(gt, pred)
    ours = compute_errors(gt, pred)
    for k, v in theirs.items():
        assert k in ours, k
        np.testing.assert_allclose(ours[k], v, rtol=1e-10, err_msg=k)

    # the jitted f32 variant flips a handful of pixels at the 1.25^k
    # threshold boundaries vs the f64 reference — tolerate ~1e-4 relative
    jax_vals = compute_errors_jax(gt, pred, np.ones_like(gt, bool))
    for k, v in theirs.items():
        np.testing.assert_allclose(float(jax_vals[k]), v, rtol=3e-4,
                                   err_msg=k)


@pytest.mark.skipif(not os.path.isfile(REF), reason="reference not mounted")
def test_eval_masks_match_reference_fractions():
    """Fraction arithmetic copied from utils/depth_utils.py:9-24 (the
    function itself crashes on numpy>=1.24)."""
    for h, w, data_type in ((375, 1242, "KITTI"), (480, 640, "NYU"),
                            (352, 1216, "ONLINE")):
        garg = np.zeros((h, w), bool)
        garg[int(0.40810811 * h):int(0.99189189 * h),
             int(0.03594771 * w):int(0.96405229 * w)] = 1
        ours = eval_mask({"garg_crop": True, "eigen_crop": False}, (h, w),
                         data_type)
        np.testing.assert_array_equal(np.asarray(ours, bool), garg)

        eigen = np.zeros((h, w), bool)
        if data_type in ("KITTI", "ONLINE"):
            eigen[int(0.3324324 * h):int(0.91351351 * h),
                  int(0.0359477 * w):int(0.96405229 * w)] = 1
        else:
            eigen[45:471, 41:601] = 1
        ours = eval_mask({"garg_crop": False, "eigen_crop": True}, (h, w),
                         data_type)
        np.testing.assert_array_equal(np.asarray(ours, bool), eigen)
