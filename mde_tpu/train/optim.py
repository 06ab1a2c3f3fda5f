"""Optimizer + LR schedule (reconstructed driver pieces).

Every reference config uses AdamW with a "onecycle" schedule
(``optimizer``/``scheduler`` blocks, SURVEY.md §5.6). torch's
``OneCycleLR(anneal_strategy='cos')`` is exactly optax's
``cosine_onecycle_schedule`` (warmup from ``peak/div_factor`` for
``pct_start`` of steps, cosine anneal to ``peak/final_div_factor``... note
torch's final lr is ``initial_lr/final_div_factor`` with
``initial = peak/div_factor`` — optax matches this convention).

``same_lr=False`` reproduces the AdaBins param-group convention (encoder at
0.1x — reference ``unet_adaptive_bins.py:111-117`` exposes 1x/10x groups):
parameters under the ``encoder`` subtree are scaled by 0.1.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax


def build_lr_schedule(opt, total_steps: int) -> optax.Schedule:
    sched = opt.get("scheduler", {})
    name = sched.get("name", "onecycle")
    peak_lr = float(opt["optimizer"]["lr"])
    if name == "onecycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 1),
            peak_value=peak_lr,
            pct_start=float(sched.get("pct_start", 0.25)),
            div_factor=float(sched.get("div_factor", 25)),
            final_div_factor=float(sched.get("final_div_factor", 100)),
        )
    if name in ("constant", "none"):
        return optax.constant_schedule(peak_lr)
    raise ValueError(f"Unsupported scheduler {name}.")


def build_momentum_schedule(opt, total_steps: int) -> Optional[optax.Schedule]:
    """torch ``OneCycleLR(cycle_momentum=True)`` equivalent: β₁ anneals
    max→base over the warmup phase and base→max over the anneal phase with
    the cosine strategy, inverse to the LR (torch defaults base_momentum=0.85,
    max_momentum=0.95). Returns None when cycling is off (the default here —
    47 of 48 reference configs that mention it set it false)."""
    sched = opt.get("scheduler", {})
    if not bool(sched.get("cycle_momentum", False)):
        return None
    import jax.numpy as jnp

    total = max(total_steps, 1)
    pct_start = float(sched.get("pct_start", 0.25))
    base_m = float(sched.get("base_momentum", 0.85))
    max_m = float(sched.get("max_momentum", 0.95))
    warm = max(pct_start * total, 1e-6)

    def schedule(count):
        count = jnp.minimum(count, total)
        pct = jnp.where(count < warm, count / warm,
                        (count - warm) / max(total - warm, 1e-6))
        # torch _annealing_cos(start, end, pct) = end + (start-end)/2*(1+cos(pi*pct))
        cos_out = 0.5 * (1.0 + jnp.cos(jnp.pi * pct))
        return jnp.where(count < warm,
                         base_m + (max_m - base_m) * cos_out,
                         max_m + (base_m - max_m) * cos_out)

    return schedule


def _encoder_label_fn(params) -> Any:
    """Label each leaf 'encoder' or 'rest' by its top-level module path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "encoder" if any(
                getattr(k, "key", None) == "encoder" for k in path) else "rest",
            tree)

    del flat
    return label_tree(params)


def bn_label_fn(params, batch_stats) -> Any:
    """Label each params leaf 'bn' when its module also owns batch stats
    (mean/var live in ``batch_stats`` at the same path — only BatchNorm does),
    else 'rest'. Used for the ``train.zero_grad_bn`` equivalent."""
    def is_bn(path) -> bool:
        node = batch_stats
        for k in path[:-1]:
            key = getattr(k, "key", k)
            if not isinstance(node, dict) or key not in node:
                return False
            node = node[key]
        return isinstance(node, dict) and "mean" in node and "var" in node

    return jax.tree_util.tree_map_with_path(
        lambda path, _: "bn" if is_bn(path) else "rest", params)


def build_optimizer(opt, total_steps: int,
                    schedule: Optional[optax.Schedule] = None,
                    bn_labels: Any = None,
                    ) -> optax.GradientTransformation:
    """AdamW + global-norm clip + (optional) 0.1x encoder lr.

    Gradient clipping threshold comes from ``train.grad_norm`` (0.1 in nearly
    every reference config); it is applied to the *accumulated* gradient
    before the update, matching the reconstructed driver semantics
    (SURVEY.md §3.1: clip_grad_norm_ every num_accum steps).

    ``bn_labels`` (a 'bn'/'rest' label tree from :func:`bn_label_fn`) enables
    the reference's ``zero_grad_bn`` (``utils/common_utils.py:84-89``: BN
    parameters get ``p.grad = None`` — torch then skips them entirely, so no
    update, no moment accumulation, no weight decay): BN leaves route to
    ``set_to_zero`` while everything else sees the normal chain.
    """
    o = opt["optimizer"]
    schedule = schedule or build_lr_schedule(opt, total_steps)
    betas = o.get("betas", [0.9, 0.999])
    # optimizer.moment_dtype='bfloat16' stores Adam's first moment in bf16
    # (optax mu_dtype), shaving ~1/3 of optimizer-state HBM (~120 MB at
    # flagship Swin-B). The second moment stays f32 (optax exposes no
    # nu_dtype; nu's wide dynamic range is also the risky one to round).
    mu_dtype = o.get("moment_dtype", None)
    b1_sched = build_momentum_schedule(opt, total_steps)
    if b1_sched is not None:
        # scheduler.cycle_momentum: β₁ itself follows the one-cycle momentum
        # schedule (inject_hyperparams re-evaluates it from the step count)
        adamw = optax.inject_hyperparams(optax.adamw)(
            learning_rate=schedule,
            b1=b1_sched, b2=float(betas[1]),
            eps=float(o.get("eps", 1e-6)),
            weight_decay=float(o.get("weight_decay", 0.0)),
            mu_dtype=mu_dtype,
        )
    else:
        adamw = optax.adamw(
            learning_rate=schedule,
            b1=float(betas[0]), b2=float(betas[1]),
            eps=float(o.get("eps", 1e-6)),
            weight_decay=float(o.get("weight_decay", 0.0)),
            mu_dtype=mu_dtype,
        )

    clip = float(opt.get("train", {}).get("grad_norm", 0.0) or 0.0)
    chain = [optax.clip_by_global_norm(clip)] if clip > 0 else []

    if not o.get("same_lr", True):
        scaled = optax.chain(adamw, optax.scale(1.0))  # placeholder same tree
        tx = optax.multi_transform(
            {"encoder": optax.chain(adamw, optax.scale(0.1)),
             "rest": scaled},
            _encoder_label_fn,
        )
        # NOTE: scaling after adamw scales the *update*, which reproduces a
        # 0.1x learning rate for adamw's scale-invariant update direction.
        chain.append(tx)
    else:
        chain.append(adamw)

    tx = optax.chain(*chain)
    if bn_labels is not None:
        tx = optax.multi_transform(
            {"bn": optax.set_to_zero(), "rest": tx}, bn_labels)
    return tx
