"""Activation-parity harness (analog of reference ``model/swin_transformer_check.py``
and ``model/adabins_check_model.py``).

Two modes:

* ``dump``  — load a released torch checkpoint, convert it
  (``core/checkpoint.py`` converters), run our flax model on a deterministic
  input and write per-output activation statistics + tensors to an .npz.
* ``diff``  — compare two such .npz dumps (e.g. ours vs one produced by the
  original torch repo with the same input) and print per-tensor sum/mean/max
  absolute differences, exactly like ``swin_transformer_check.py:22-52``.

Usage:
  python tools/parity_check.py dump --model adabins --ckpt AdaBins_nyu.pt \
      --data-type NYU --out ours.npz
  python tools/parity_check.py diff ours.npz theirs.npz --tol 1e-3
"""

from __future__ import annotations

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _build(model_name: str, data_type: str, ckpt: str,
           version: str = "large07"):
    import jax
    import jax.numpy as jnp
    from mde_tpu.core.checkpoint import (
        load_torch_state_dict, convert_adabins_model, convert_newcrfs_model)
    from mde_tpu.models import build_model

    min_d, max_d = (0.001, 10.0) if data_type == "NYU" else (0.001, 80.0)
    state = load_torch_state_dict(ckpt)
    if model_name == "adabins":
        opt = {"model": {"name": "adabins", "num_bins": 256}}
        variables = convert_adabins_model(state)
    elif model_name == "newcrfs":
        opt = {"model": {"name": "newcrfs", "version": version}}
        variables = convert_newcrfs_model(state, version=version)
    else:
        raise SystemExit(f"unsupported model {model_name}")
    model = build_model(opt["model"], min_d, max_d)
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables


def cmd_dump(args):
    import jax
    import jax.numpy as jnp

    model, variables = _build(args.model, args.data_type, args.ckpt,
                              version=args.version)
    if args.shape:
        h, w = args.shape
    else:
        h, w = (480, 640) if args.data_type == "NYU" else (352, 1216)
    x = np.random.RandomState(args.seed).rand(1, h, w, 3).astype(np.float32)

    tensors = {"input": x}
    if args.intermediates:
        # per-stage activations (flax capture_intermediates), the analog of
        # the reference's per-stage diff script swin_transformer_check.py
        def fwd(v, img):
            out, mods = model.apply(v, img, train=False, mutable=["intermediates"],
                                    capture_intermediates=True)
            return out, mods["intermediates"]
        out, inter = jax.jit(fwd)(variables, jnp.asarray(x))
        flat, _ = jax.tree_util.tree_flatten_with_path(inter)
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if hasattr(leaf, "shape"):
                tensors[f"act:{name}"] = np.asarray(leaf)
    else:
        out = jax.jit(lambda v, img: model.apply(v, img, train=False))(
            variables, jnp.asarray(x))
    leaves, _ = jax.tree_util.tree_flatten(out)
    for i, leaf in enumerate(leaves):
        tensors[f"out{i}"] = np.asarray(leaf)
    np.savez(args.out, **tensors)
    for k, v in tensors.items():
        print(f"{k}: shape={v.shape} sum={v.sum():.6f} mean={v.mean():.6f}")


def cmd_diff(args):
    a = np.load(args.a)
    b = np.load(args.b)
    keys = sorted(set(a.files) & set(b.files))
    worst = 0.0
    for k in keys:
        if a[k].shape != b[k].shape:
            print(f"{k}: SHAPE MISMATCH {a[k].shape} vs {b[k].shape}")
            worst = float("inf")
            continue
        d = np.abs(a[k].astype(np.float64) - b[k].astype(np.float64))
        print(f"{k}: sum={d.sum():.6e} mean={d.mean():.6e} max={d.max():.6e}")
        worst = max(worst, float(d.max()))
    ok = worst <= args.tol
    print(f"max abs diff {worst:.3e} {'<=' if ok else '>'} tol {args.tol}")
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pd = sub.add_parser("dump")
    pd.add_argument("--model", required=True, choices=["adabins", "newcrfs"])
    pd.add_argument("--ckpt", required=True)
    pd.add_argument("--data-type", default="NYU", choices=["NYU", "KITTI"])
    pd.add_argument("--out", required=True)
    pd.add_argument("--seed", type=int, default=0)
    pd.add_argument("--intermediates", action="store_true",
                    help="also dump per-module activations (per-stage diff)")
    pd.add_argument("--version", default="large07",
                    help="newcrfs encoder version (reference NewCRFDepth.py:28-42)")
    pd.add_argument("--shape", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="override the input resolution (tests use tiny shapes)")

    pf = sub.add_parser("diff")
    pf.add_argument("a")
    pf.add_argument("b")
    pf.add_argument("--tol", type=float, default=1e-3)

    args = p.parse_args(argv)
    if args.cmd == "dump":
        cmd_dump(args)
        return 0
    return cmd_diff(args)


if __name__ == "__main__":
    raise SystemExit(main())
