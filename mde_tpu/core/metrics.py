"""Depth evaluation metrics and eval-crop masks.

Reimplements the reference metric semantics (``utils/depth_utils.py:4-54``)
with two entry points each:

* numpy versions (``compute_errors``, ``eval_mask``) — bit-compatible with the
  reference for offline eval;
* jax versions (``compute_errors_jax``) — masked, jit-friendly (static shapes,
  mask-weighted means) so the whole eval step can stay on-device and be
  ``psum``-reduced across the data mesh.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

METRIC_NAMES = (
    "a1", "a2", "a3", "abs_rel", "sq_rel", "rmse", "rmse_log", "silog", "log_10",
)

# Garg / Eigen crop fractions (reference utils/depth_utils.py:9-24).
GARG_CROP = (0.40810811, 0.99189189, 0.03594771, 0.96405229)
EIGEN_CROP_KITTI = (0.3324324, 0.91351351, 0.0359477, 0.96405229)
EIGEN_CROP_NYU = (45, 471, 41, 601)  # absolute rows/cols


def eval_mask(opt_eval, shape: Tuple[int, int], data_type: str) -> np.ndarray:
    """Boolean eval-region mask (reference ``cal_eval_mask``).

    ``opt_eval`` is the config's ``eval`` section (needs ``garg_crop`` /
    ``eigen_crop`` booleans); ``shape`` is (H, W) of the GT depth map.
    """
    gt_height, gt_width = shape
    mask = np.zeros((gt_height, gt_width), dtype=bool)

    if opt_eval["garg_crop"]:
        t, b, l, r = GARG_CROP
        mask[int(t * gt_height):int(b * gt_height),
             int(l * gt_width):int(r * gt_width)] = True
    elif opt_eval["eigen_crop"]:
        if data_type in ("KITTI", "ONLINE"):
            t, b, l, r = EIGEN_CROP_KITTI
            mask[int(t * gt_height):int(b * gt_height),
                 int(l * gt_width):int(r * gt_width)] = True
        elif data_type == "NYU":
            t, b, l, r = EIGEN_CROP_NYU
            mask[t:b, l:r] = True
        else:
            raise ValueError(f"Unsupported data_type {data_type}.")
    else:
        raise ValueError("Unsupported crop configuration.")
    return mask


def compute_errors(gt: np.ndarray, pred: np.ndarray) -> Dict[str, float]:
    """The 9 standard depth metrics over pre-masked flat arrays.

    Matches reference ``tcompute_errors`` (utils/depth_utils.py:32-54):
    a1/a2/a3 threshold accuracies, abs_rel, sq_rel, rmse, rmse_log,
    silog (x100), log_10.
    """
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = float((thresh < 1.25).mean())
    a2 = float((thresh < 1.25 ** 2).mean())
    a3 = float((thresh < 1.25 ** 3).mean())

    abs_rel = float(np.mean(np.abs(gt - pred) / gt))
    sq_rel = float(np.mean(((gt - pred) ** 2) / gt))
    rmse = float(np.sqrt(((gt - pred) ** 2).mean()))
    rmse_log = float(np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean()))

    err = np.log(pred) - np.log(gt)
    silog = float(np.sqrt(np.mean(err ** 2) - np.mean(err) ** 2) * 100)
    log_10 = float(np.abs(np.log10(gt) - np.log10(pred)).mean())

    return dict(a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, sq_rel=sq_rel,
                rmse=rmse, rmse_log=rmse_log, silog=silog, log_10=log_10)


def compute_errors_jax(gt: jnp.ndarray, pred: jnp.ndarray,
                       mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Masked on-device metrics, jit/pmap friendly.

    Unlike the numpy path (which indexes with a boolean mask and therefore has
    dynamic shapes), this computes mask-weighted means over the full static
    array — the standard TPU formulation. ``mask`` is the validity mask
    (gt in range AND eval crop). Returns per-image-batch aggregate values; the
    caller is responsible for cross-device reduction.

    Note: ``silog`` here is the *metric* silog (x100), not the training loss.
    """
    mask = mask.astype(jnp.float32)
    count = jnp.maximum(mask.sum(), 1.0)

    gt_safe = jnp.where(mask > 0, gt, 1.0)
    pred_safe = jnp.where(mask > 0, pred, 1.0)

    def mmean(x):
        return (x * mask).sum() / count

    thresh = jnp.maximum(gt_safe / pred_safe, pred_safe / gt_safe)
    a1 = mmean((thresh < 1.25).astype(jnp.float32))
    a2 = mmean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = mmean((thresh < 1.25 ** 3).astype(jnp.float32))

    diff = gt_safe - pred_safe
    abs_rel = mmean(jnp.abs(diff) / gt_safe)
    sq_rel = mmean(diff ** 2 / gt_safe)
    rmse = jnp.sqrt(mmean(diff ** 2))

    log_gt = jnp.log(gt_safe)
    log_pred = jnp.log(pred_safe)
    rmse_log = jnp.sqrt(mmean((log_gt - log_pred) ** 2))

    err = log_pred - log_gt
    silog = jnp.sqrt(jnp.maximum(mmean(err ** 2) - mmean(err) ** 2, 0.0)) * 100
    log_10 = mmean(jnp.abs(jnp.log10(gt_safe) - jnp.log10(pred_safe)))

    return dict(a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, sq_rel=sq_rel,
                rmse=rmse, rmse_log=rmse_log, silog=silog, log_10=log_10,
                count=count)


def compute_errors_jax_per_image(gt: jnp.ndarray, pred: jnp.ndarray,
                                 mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-IMAGE masked metrics for batched eval: each entry is a (B,) array.

    The reference protocol computes ``tcompute_errors`` per image and averages
    across images (``RunningAverageDict``, SURVEY.md §3.2) — pooling pixels
    across a batch would weight images by their valid-pixel counts instead.
    ``count`` is the per-image valid-pixel count; images with count == 0 must
    be excluded by the caller (their metric entries are well-defined zeros/
    ones from the count floor, not real measurements).
    """
    b = gt.shape[0]
    mask = mask.astype(jnp.float32).reshape(b, -1)
    gt = gt.reshape(b, -1)
    pred = pred.reshape(b, -1)
    count = mask.sum(axis=1)
    denom = jnp.maximum(count, 1.0)

    gt_safe = jnp.where(mask > 0, gt, 1.0)
    pred_safe = jnp.where(mask > 0, pred, 1.0)

    def mmean(x):
        return (x * mask).sum(axis=1) / denom

    thresh = jnp.maximum(gt_safe / pred_safe, pred_safe / gt_safe)
    a1 = mmean((thresh < 1.25).astype(jnp.float32))
    a2 = mmean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = mmean((thresh < 1.25 ** 3).astype(jnp.float32))

    diff = gt_safe - pred_safe
    abs_rel = mmean(jnp.abs(diff) / gt_safe)
    sq_rel = mmean(diff ** 2 / gt_safe)
    rmse = jnp.sqrt(mmean(diff ** 2))

    log_gt = jnp.log(gt_safe)
    log_pred = jnp.log(pred_safe)
    rmse_log = jnp.sqrt(mmean((log_gt - log_pred) ** 2))

    err = log_pred - log_gt
    silog = jnp.sqrt(jnp.maximum(mmean(err ** 2) - mmean(err) ** 2, 0.0)) * 100
    log_10 = mmean(jnp.abs(jnp.log10(gt_safe) - jnp.log10(pred_safe)))

    return dict(a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, sq_rel=sq_rel,
                rmse=rmse, rmse_log=rmse_log, silog=silog, log_10=log_10,
                count=count)
