"""Jitted train / eval steps with data-parallel sharding.

Reconstruction of the reference's missing ``run.py`` hot loop (SURVEY.md §3.1)
the TPU way: ONE jitted function per step containing forward, loss, backward,
gradient accumulation (``lax.scan`` over microbatches — ``train.num_accum``),
global-norm clipping and the optimizer update. Under a ``Mesh`` with the batch
sharded over the ``data`` axis and params replicated, XLA inserts the gradient
all-reduce over ICI automatically — the DDP/NCCL layer of the reference
becomes zero lines of code here.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .state import TrainState
from .loss import DepthLoss


# A model adapter normalizes each family's output contract:
#   apply(variables, images, train, rngs, mutable) -> family-specific
# into: (outputs_tuple, bin_centers | None)
ModelAdapter = Callable[..., Tuple[Tuple[jnp.ndarray, ...], Optional[jnp.ndarray]]]


def default_adapter(model_out) -> Tuple[Tuple[jnp.ndarray, ...], Optional[jnp.ndarray]]:
    """Handles the common contracts:
    - (pred, outs_tuple, attn)      [ODA2 ordered heads]
    - (pred, aux, centers, attns)   [oda_luna_cls — centers at index 2]
    - (pred, bin_edges/centers)     [AdaBins-style]
    - pred                          [plain regression]
    """
    if isinstance(model_out, tuple):
        if len(model_out) >= 2 and isinstance(model_out[1], (tuple, list)) \
                and len(model_out[1]) > 0 \
                and getattr(model_out[1][0], "ndim", 0) == 4:
            # (pred, outs_tuple, attn) [ODA2 ordered heads]
            return tuple(model_out[1]), None
        if len(model_out) == 4 and getattr(model_out[2], "ndim", 0) == 2:
            # (pred, aux, centers, attns) [oda_luna_cls,
            # reference oda_luna_cls.py:91-117 — aux tokens are 3-D, the
            # 2-D bin centers sit at index 2]
            return (model_out[0],), model_out[2]
        second = model_out[1] if len(model_out) >= 2 else None
        if second is not None and getattr(second, "ndim", 0) == 2:
            # (pred, bin_edges/centers[, attn]) [AdaBins, Depthformer v7/v8]
            return (model_out[0],), second
        return (model_out[0],), None
    return (model_out,), None


# Families whose second output is bin EDGES (shape (B, n_bins+1)) rather than
# centers. AdaBins' chamfer loss is defined on bin CENTERS — the official
# AdaBins BinsChamferLoss derives ``0.5*(edges[1:]+edges[:-1])`` from the edges
# the model returns (arXiv 2011.14141 §3.4; reference model contract at
# /root/reference/model/Adabins/unet_adaptive_bins.py:101-109). Depthformer
# v7/v8 and the oda*_luna_cls heads already return centers.
_EDGE_EMITTERS = frozenset({"adabins", "oda_bins", "depthformer_v3"})


def bin_edges_to_centers(edges: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (edges[:, :-1] + edges[:, 1:])


def make_adapter(model_name: str) -> ModelAdapter:
    """Model-aware adapter: normalizes every family's output contract AND
    guarantees the bins handed to ``chamfer_bin_loss`` are centers."""
    def adapter(model_out):
        outs, bins = default_adapter(model_out)
        if bins is not None and model_name in _EDGE_EMITTERS:
            bins = bin_edges_to_centers(bins)
        return outs, bins
    return adapter


def make_train_step(model, opt, min_depth: float, max_depth: float,
                    tx: optax.GradientTransformation,
                    adapter: Optional[ModelAdapter] = None,
                    num_accum: int = 1,
                    freeze_bn: bool = False,
                    freeze_encoder_bn: bool = False,
                    donate: bool = True):
    """Build the jitted train step.

    The step receives ``num_accum`` loader batches stacked along the batch
    axis (the reference accumulates gradients over ``num_accum`` *loader
    batches* before each optimizer step, so the effective batch is
    ``batch_size * num_accum`` — SURVEY.md §3.1) and scans over them as
    microbatches. Each microbatch is still sharded over the data mesh axis.
    BN stats update on each microbatch (carried through the scan) unless
    frozen.
    """
    from ..ops import tnn

    if adapter is None:
        adapter = make_adapter(opt.get("model", {}).get("name", ""))
    depth_loss = DepthLoss(opt["loss"], min_depth, max_depth)

    def _freeze_ctx():
        # reference freeze_bn = m.eval(): BN normalizes with RUNNING stats
        # and stops updating them from the freeze epoch on
        # (utils/common_utils.py:78-81); freeze_encoder_bn applies the same
        # to the encoder subtree only (config train.freeze_encoder_bn)
        if freeze_bn:
            return tnn.bn_freeze_scope()
        if freeze_encoder_bn:
            return tnn.bn_freeze_scope(tnn.encoder_only)
        import contextlib
        return contextlib.nullcontext()

    def loss_fn(params, batch_stats, images, depths, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        with _freeze_ctx():
            out, updates = model.apply(variables, images, train=True,
                                       rngs={"dropout": rng},
                                       mutable=["batch_stats"])
        # frozen BNs run with use_running_average=True inside the scope, so
        # their entries in updates["batch_stats"] are already unchanged
        new_stats = updates["batch_stats"]
        outs, centers = adapter(out)
        loss, logs = depth_loss(outs, depths, bin_centers=centers)
        return loss, (new_stats, logs)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        images, depths = batch["image"], batch["depth"]
        b = images.shape[0]
        assert b % num_accum == 0, (b, num_accum)
        micro = b // num_accum

        if num_accum == 1:
            # fast path: no microbatch scan, no zero-grad tree init/add —
            # the accumulate machinery costs a few ms of pure HBM traffic
            # on an 88M-param tree
            (loss, (batch_stats, logs)), grads = grad_fn(
                state.params, state.batch_stats, images, depths, rng)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            logs["loss"] = loss
            logs["grad_norm"] = optax.global_norm(grads)
            logs["param_norm"] = optax.global_norm(params)
            new_state = state.replace(step=state.step + 1, params=params,
                                      batch_stats=batch_stats,
                                      opt_state=opt_state)
            return new_state, logs

        def micro_body(carry, xs):
            batch_stats, grad_acc, loss_acc, logs_acc = carry
            mi, md, mrng = xs
            (loss, (batch_stats, logs)), grads = grad_fn(
                state.params, batch_stats, mi, md, mrng)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            logs_acc = jax.tree_util.tree_map(jnp.add, logs_acc, logs)
            return (batch_stats, grad_acc, loss_acc + loss, logs_acc), None

        rngs = jax.random.split(rng, num_accum)
        im_s = images.reshape(num_accum, micro, *images.shape[1:])
        de_s = depths.reshape(num_accum, micro, *depths.shape[1:])

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        # one traced microstep to get the logs structure
        zero_logs = {"loss": jnp.zeros(()), "loss_si": jnp.zeros(())}
        if depth_loss.sog_weight > 0:
            zero_logs["loss_sog"] = jnp.zeros(())
        if depth_loss.chamfer_weight > 0:
            zero_logs["loss_chamfer"] = jnp.zeros(())

        (batch_stats, grads, loss_sum, logs_sum), _ = jax.lax.scan(
            micro_body,
            (state.batch_stats, zero_grads, jnp.zeros(()), zero_logs),
            (im_s, de_s, rngs),
        )

        grads = jax.tree_util.tree_map(lambda g: g / num_accum, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        logs = jax.tree_util.tree_map(lambda x: x / num_accum, logs_sum)
        logs["grad_norm"] = optax.global_norm(grads)
        logs["param_norm"] = optax.global_norm(params)

        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats, opt_state=opt_state)
        return new_state, logs

    return train_step


def make_train_step_shard_map(model, opt, min_depth: float, max_depth: float,
                              tx: optax.GradientTransformation, mesh,
                              adapter: Optional[ModelAdapter] = None,
                              num_accum: int = 1,
                              freeze_bn: bool = False,
                              freeze_encoder_bn: bool = False,
                              donate: bool = False,
                              data_axis: str = "data"):
    """Explicit-SPMD train step: ``shard_map`` over the data axis with
    ``pmean`` for gradients/stats/logs instead of GSPMD global arrays.

    Why it exists: GSPMD has no partitioning rule for ``pallas_call``, so on
    real multi-chip hardware the fused attention/conv kernels inside the
    global-array step risk being replicated (gathering the full batch per
    chip). Under ``shard_map`` every op — including the Pallas kernels —
    runs per shard on its local batch slice, and the cross-chip collectives
    are the explicit ``pmean``s here, riding ICI.

    Semantics vs the GSPMD step (equal when BN is frozen; both tested):
    * BN train stats are per-shard with pmean'd running-stat updates —
      torch-DDP-without-SyncBN behavior, i.e. the reference's own default
      (SURVEY 2.8). The GSPMD step computes global-batch stats (SyncBN).
    * dropout rngs are decorrelated per shard via ``fold_in(axis_index)``.
    """
    from jax.sharding import PartitionSpec
    try:
        from jax import shard_map as _sm  # jax >= 0.8 home
        # the stable API renamed check_rep -> check_vma
        def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_vma=check_rep)
    except ImportError:  # older jax: deprecated experimental home
        from jax.experimental.shard_map import shard_map  # type: ignore

    if adapter is None:
        adapter = make_adapter(opt.get("model", {}).get("name", ""))
    depth_loss = DepthLoss(opt["loss"], min_depth, max_depth)
    from ..ops import tnn

    def loss_fn(params, batch_stats, images, depths, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        import contextlib
        # same freeze semantics as the GSPMD step's _freeze_ctx (ADVICE r4
        # medium #2 — the driver's freeze_encoder_bn schedule must not be
        # dropped under train.spmd=shard_map)
        if freeze_bn:
            ctx = tnn.bn_freeze_scope()
        elif freeze_encoder_bn:
            ctx = tnn.bn_freeze_scope(tnn.encoder_only)
        else:
            ctx = contextlib.nullcontext()
        with ctx:
            out, updates = model.apply(variables, images, train=True,
                                       rngs={"dropout": rng},
                                       mutable=["batch_stats"])
        outs, centers = adapter(out)
        loss, logs = depth_loss(outs, depths, bin_centers=centers)
        return loss, (updates["batch_stats"], logs)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def per_shard(params, batch_stats, opt_state, step_no, images, depths,
                  rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        b = images.shape[0]
        micro = b // num_accum

        def micro_body(carry, xs):
            stats, grad_acc, loss_acc, logs_acc = carry
            mi, md, mrng = xs
            (loss, (stats, logs)), grads = grad_fn(params, stats, mi, md,
                                                   mrng)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            logs_acc = jax.tree_util.tree_map(jnp.add, logs_acc, logs)
            return (stats, grad_acc, loss_acc + loss, logs_acc), None

        rngs = jax.random.split(rng, num_accum)
        im_s = images.reshape(num_accum, micro, *images.shape[1:])
        de_s = depths.reshape(num_accum, micro, *depths.shape[1:])
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        zero_logs = {"loss": jnp.zeros(()), "loss_si": jnp.zeros(())}
        if depth_loss.sog_weight > 0:
            zero_logs["loss_sog"] = jnp.zeros(())
        if depth_loss.chamfer_weight > 0:
            zero_logs["loss_chamfer"] = jnp.zeros(())
        (batch_stats, grads, _, logs_sum), _ = jax.lax.scan(
            micro_body, (batch_stats, zero_grads, jnp.zeros(()), zero_logs),
            (im_s, de_s, rngs))

        # explicit ICI collectives — the DDP all-reduce, spelled out
        grads = jax.lax.pmean(
            jax.tree_util.tree_map(lambda g: g / num_accum, grads),
            data_axis)
        batch_stats = jax.lax.pmean(batch_stats, data_axis)
        logs = jax.lax.pmean(
            jax.tree_util.tree_map(lambda x: x / num_accum, logs_sum),
            data_axis)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        logs["grad_norm"] = optax.global_norm(grads)
        logs["param_norm"] = optax.global_norm(params)
        return params, batch_stats, opt_state, step_no + 1, logs

    rep = PartitionSpec()
    dat = PartitionSpec(data_axis)
    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(rep, rep, rep, rep, dat, dat, rep),
        out_specs=(rep, rep, rep, rep, rep),
        check_rep=False)

    # donate=True reuses the incoming TrainState's buffers in place, halving
    # peak HBM — the driver opts in (ADVICE r4 medium #2); default stays
    # False because donation invalidates the caller's state reference
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, rng):
        params, batch_stats, opt_state, step_no, logs = mapped(
            state.params, state.batch_stats, state.opt_state, state.step,
            batch["image"], batch["depth"], rng)
        return state.replace(step=step_no, params=params,
                             batch_stats=batch_stats,
                             opt_state=opt_state), logs

    return train_step


def make_eval_step(model, opt, min_depth_eval: float, max_depth_eval: float,
                   data_type: str = "KITTI", flip_eval: bool = False):
    """Jitted eval step: forward (+ optional flip-averaging), resize to GT,
    clamp, mask (validity x eval crop), on-device metrics
    (reconstruction of SURVEY.md §3.2)."""
    from ..core import metrics as M
    from ..ops.resize import resize_bilinear

    opt_eval = opt["eval"]

    @jax.jit
    def eval_step(variables, batch):
        images, depths = batch["image"], batch["depth"]
        pred = model.apply(variables, images, train=False)
        if isinstance(pred, tuple):
            pred = pred[0]

        if flip_eval:
            pred_f = model.apply(variables, images[:, :, ::-1, :], train=False)
            if isinstance(pred_f, tuple):
                pred_f = pred_f[0]
            pred = 0.5 * (pred + pred_f[:, :, ::-1, :])

        gt_hw = depths.shape[1:3]
        pred = resize_bilinear(pred, gt_hw, align_corners=True)
        pred = jnp.clip(pred, min_depth_eval, max_depth_eval)

        valid = (depths > min_depth_eval) & (depths < max_depth_eval)
        crop = jnp.asarray(
            M.eval_mask(opt_eval, (int(gt_hw[0]), int(gt_hw[1])), data_type))
        mask = valid & crop[None, :, :, None]
        # per-IMAGE metrics: KB-crop/NYU eval shapes are uniform, so batches
        # can be > 1, and the reference protocol averages metrics over IMAGES
        # (SURVEY.md §3.2) — a per-batch pixel pool would weight images by
        # their valid-pixel counts
        return M.compute_errors_jax_per_image(depths, pred, mask)

    return eval_step
