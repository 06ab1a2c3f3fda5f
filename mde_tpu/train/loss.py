"""Training losses — reconstructed.

The reference's training entry point (``run.py``) is absent from its snapshot;
the losses are reconstructed from three sources (SURVEY.md §0, §3.1): the
config schema (``loss: {alpha, beta, per_image, chamfer_weight, si_weight,
sog_weight, oda_weight}``), the model output contracts (multi-output ordered
heads; AdaBins-style bin centers), and the standard formulations used by the
upstream papers of the implemented models (BTS/AdaBins SILog; AdaBins
bidirectional chamfer bin-center loss).

* SILog (scale-invariant log): ``alpha * sqrt(mean(d^2) - beta * mean(d)^2)``
  with ``d = log(pred) - log(gt)`` over valid pixels; ``per_image`` computes
  per-image-then-mean vs over the flattened batch.
* sog ("sum of gradients"): log-depth gradient-matching smoothness term.
* chamfer: bidirectional chamfer distance between predicted bin centers and
  the set of GT depths present in each image (AdaBins, arXiv 2011.14141 §3.4),
  computed with a chunked pairwise-min so it stays O(n_bins x n_pix) on MXU.

Everything is masked-mean based (static shapes, jit/TPU friendly).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear

_EPS = 1e-7


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray,
                 axis=None) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return (x * m).sum(axis=axis) / jnp.maximum(m.sum(axis=axis), 1.0)


def silog_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
               alpha: float = 10.0, beta: float = 0.15,
               per_image: bool = True) -> jnp.ndarray:
    """Scale-invariant log loss. pred/gt/mask: (B, H, W[, 1])."""
    pred = pred.reshape(pred.shape[0], -1)
    gt = gt.reshape(gt.shape[0], -1)
    mask = mask.reshape(mask.shape[0], -1)

    pred = jnp.clip(pred, _EPS, None)
    gt_safe = jnp.where(mask, gt, 1.0)
    d = jnp.where(mask, jnp.log(pred) - jnp.log(gt_safe), 0.0)

    if per_image:
        d2 = _masked_mean(d ** 2, mask, axis=1)
        d1 = _masked_mean(d, mask, axis=1)
        val = jnp.sqrt(jnp.maximum(d2 - beta * d1 ** 2, _EPS))
        return alpha * val.mean()
    d2 = _masked_mean(d ** 2, mask)
    d1 = _masked_mean(d, mask)
    return alpha * jnp.sqrt(jnp.maximum(d2 - beta * d1 ** 2, _EPS))


def sog_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Gradient-matching smoothness on log depth (reconstruction of the
    config's ``sog_weight`` term; 0.0 in every surviving config)."""
    pred = jnp.clip(pred.reshape(pred.shape[0], pred.shape[1], -1), _EPS, None)
    gt = jnp.clip(gt.reshape(gt.shape[0], gt.shape[1], -1), _EPS, None)
    mask = mask.reshape(mask.shape[0], mask.shape[1], -1)

    lp, lg = jnp.log(pred), jnp.log(gt)
    gx_p = lp[:, :, 1:] - lp[:, :, :-1]
    gx_g = lg[:, :, 1:] - lg[:, :, :-1]
    mx = mask[:, :, 1:] & mask[:, :, :-1]
    gy_p = lp[:, 1:, :] - lp[:, :-1, :]
    gy_g = lg[:, 1:, :] - lg[:, :-1, :]
    my = mask[:, 1:, :] & mask[:, :-1, :]
    return _masked_mean(jnp.abs(gx_p - gx_g), mx) + \
        _masked_mean(jnp.abs(gy_p - gy_g), my)


def chamfer_bin_loss(bin_centers: jnp.ndarray, gt: jnp.ndarray,
                     mask: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """Bidirectional chamfer between per-image bin centers and GT depth set.

    bin_centers: (B, n_bins); gt/mask: (B, H, W[, 1]). Invalid pixels are
    excluded from the gt->bins direction and masked out of the bins->gt min by
    being pushed to +inf distance.

    The pairwise (B, n_pix, n_bins) distance tensor would be ~2 GB at KITTI
    train shapes (SURVEY.md §7.3 item 6), so pixels stream through a
    ``lax.scan`` in ``chunk``-sized tiles, carrying the running masked sum
    (gt->bin direction) and the running per-bin min (bin->gt direction) —
    peak memory is one (B, chunk, n_bins) tile.
    """
    b, nb = bin_centers.shape
    gt = gt.reshape(b, -1)
    mask = mask.reshape(b, -1)
    p = gt.shape[1]

    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    if pad:
        gt = jnp.pad(gt, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    gt_c = gt.reshape(b, n_chunks, chunk).transpose(1, 0, 2)      # (nc, B, chunk)
    mask_c = mask.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

    big = jnp.asarray(1e10, jnp.float32)

    def body(carry, xs):
        sum_dgt, cnt, min_dbin = carry
        g, m = xs                                   # (B, chunk)
        dist2 = (g[:, :, None].astype(jnp.float32)
                 - bin_centers[:, None, :].astype(jnp.float32)) ** 2
        d_gt = dist2.min(axis=2)                    # (B, chunk)
        sum_dgt = sum_dgt + (d_gt * m).sum(axis=1)
        cnt = cnt + m.sum(axis=1)
        d_bin = jnp.where(m[:, :, None] > 0, dist2, big).min(axis=1)  # (B, nb)
        return (sum_dgt, cnt, jnp.minimum(min_dbin, d_bin)), None

    init = (jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.float32),
            jnp.full((b, nb), big, jnp.float32))
    (sum_dgt, cnt, min_dbin), _ = jax.lax.scan(body, init, (gt_c, mask_c))

    any_valid = cnt > 0
    loss_gt = jnp.where(any_valid, sum_dgt / jnp.maximum(cnt, 1.0), 0.0)
    loss_bin = jnp.where(any_valid, min_dbin.mean(axis=1), 0.0)
    return (loss_gt + loss_bin).mean()


class DepthLoss:
    """Config-driven composite loss for every model family.

    Applies SILog to each supervised output map (the ordered heads return
    ``num_repeats + 1`` maps — all supervised, matching the multi-output
    contract of ``oda2_red_order*``), after bilinear-upsampling each map to GT
    resolution (align_corners=True, the reference's universal resize mode).
    """

    def __init__(self, opt_loss, min_depth: float, max_depth: float):
        self.alpha = float(opt_loss.get("alpha", 10.0))
        self.beta = float(opt_loss.get("beta", 0.15))
        self.per_image = bool(opt_loss.get("per_image", True))
        self.si_weight = float(opt_loss.get("si_weight", 1.0))
        self.sog_weight = float(opt_loss.get("sog_weight", 0.0))
        self.chamfer_weight = float(opt_loss.get("chamfer_weight", 0.0))
        self.oda_weight = float(opt_loss.get("oda_weight", 0.0))
        self.min_depth = min_depth
        self.max_depth = max_depth

    def valid_mask(self, gt: jnp.ndarray) -> jnp.ndarray:
        return (gt > self.min_depth) & (gt <= self.max_depth)

    def __call__(self, outputs: Sequence[jnp.ndarray], gt: jnp.ndarray,
                 bin_centers: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """outputs: tuple of (B, h, w, 1) depth maps (last = main prediction);
        gt: (B, H, W, 1). Returns (total_loss, metrics_dict)."""
        gt_hw = gt.shape[1:3]
        mask = self.valid_mask(gt)

        si_terms = []
        for out in outputs:
            pred = resize_bilinear(out, gt_hw, align_corners=True)
            si_terms.append(silog_loss(pred, gt, mask, self.alpha, self.beta,
                                       self.per_image))
        # final map at full weight; auxiliary (earlier) maps at oda_weight if
        # configured, else uniform averaging over all maps
        if len(si_terms) > 1 and self.oda_weight > 0:
            si = si_terms[-1] + self.oda_weight * sum(si_terms[:-1]) / (len(si_terms) - 1)
        else:
            si = sum(si_terms) / len(si_terms)

        total = self.si_weight * si
        logs = {"loss_si": si}

        if self.sog_weight > 0:
            pred = resize_bilinear(outputs[-1], gt_hw, align_corners=True)
            sog = sog_loss(pred[..., 0], gt[..., 0], mask[..., 0])
            total = total + self.sog_weight * sog
            logs["loss_sog"] = sog

        if self.chamfer_weight > 0 and bin_centers is not None:
            cham = chamfer_bin_loss(bin_centers, gt, mask)
            total = total + self.chamfer_weight * cham
            logs["loss_chamfer"] = cham

        logs["loss"] = total
        return total, logs
