"""AOT-compile the flagship forward and serialize the executable.

Serving deployments should not pay the (minutes-long over a tunnel) XLA
compile at process start. This tool lowers + compiles the flagship
``oda2_red_order_swin2`` forward for a fixed serving shape and writes:

  <out>/flagship_<shape>.xc     serialized compiled executable
                                (jax.experimental.serialize_executable)
  <out>/params.msgpack          flax-serialized variables
  <out>/meta.json               shapes/dtypes/config for the loader

Load with ``load_and_run`` below (used by the unit test) — deserialization
binds the executable to the SAME device topology it was compiled for.

Usage:
  python tools/export_aot.py --out /tmp/export --shape train --batch 8
  python tools/export_aot.py --check /tmp/export      # load + run + verify
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

SHAPES = {"train": (352, 704), "kitti_test": (352, 1216), "nyu": (480, 640)}


def _build(encoder_type: str):
    import jax.numpy as jnp
    from mde_tpu.core.config import load_config
    from mde_tpu.models import build_model

    opt = load_config({
        "model": {
            "name": "oda2_red_order_swin2", "encoder_type": encoder_type,
            "dec_dim": 512, "num_heads": 8, "num_repeats": 3, "num_emb": 128,
            "window_size": 8, "neck_type": "red33",
        },
    })
    return build_model(opt, 0.001, 80.0, dtype=jnp.bfloat16,
                       use_checkpoint=False)


def export(out: str, shape: str, batch: int, encoder_type: str,
           model=None, hw=None) -> str:
    import jax
    import jax.numpy as jnp
    from jax.experimental.serialize_executable import serialize
    from flax.serialization import to_bytes

    model = model or _build(encoder_type)
    hw = hw or SHAPES[shape]
    x = jnp.zeros((batch, *hw, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x[:1], train=False))()

    # pin to ONE device: under a multi-device runtime (e.g. the tests'
    # virtual 8-CPU mesh) an unannotated jit serializes an executable bound
    # to the full device set, which then demands 8-sharded inputs at load
    dev = jax.devices()[0]
    sd = jax.sharding.SingleDeviceSharding(dev)
    variables = jax.device_put(variables, sd)
    x = jax.device_put(x, sd)
    fwd = jax.jit(lambda v, images: model.apply(v, images, train=False)[0],
                  out_shardings=sd)
    compiled = fwd.lower(variables, x).compile()
    payload, in_tree, out_tree = serialize(compiled)

    import pickle
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, f"flagship_{shape}.xc"), "wb") as f:
        f.write(payload)
    with open(os.path.join(out, "treedefs.pkl"), "wb") as f:
        pickle.dump((in_tree, out_tree), f)
    with open(os.path.join(out, "params.msgpack"), "wb") as f:
        f.write(to_bytes(jax.device_get(variables)))
    meta = {"shape": shape, "hw": list(hw), "batch": batch,
            "encoder_type": encoder_type,
            "device_kind": jax.devices()[0].device_kind,
            "n_devices": len(jax.devices())}
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps({"exported": out, **meta}))
    return out


def load_and_run(out: str, images, model=None):
    """Deserialize the executable and run it on ``images``; returns pred."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.serialize_executable import deserialize_and_load
    from flax.serialization import from_bytes

    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    model = model or _build(meta["encoder_type"])
    x = jnp.zeros((meta["batch"], *meta["hw"], 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x[:1], train=False))()
    with open(os.path.join(out, "params.msgpack"), "rb") as f:
        variables = from_bytes(jax.device_get(variables), f.read())

    import pickle
    with open(os.path.join(out, f"flagship_{meta['shape']}.xc"), "rb") as f:
        payload = f.read()
    with open(os.path.join(out, "treedefs.pkl"), "rb") as f:
        in_tree, out_tree = pickle.load(f)
    # execution_devices: default is ALL local devices, which rebinds a
    # single-device executable as 8-replica under the virtual test mesh
    compiled = deserialize_and_load(payload, in_tree, out_tree,
                                    execution_devices=jax.devices()[:1])
    sd = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    return compiled(jax.device_put(variables, sd),
                    jax.device_put(images, sd))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None)
    p.add_argument("--check", default=None,
                   help="load an exported dir and run a zero batch")
    p.add_argument("--shape", default="train", choices=sorted(SHAPES))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--encoder", default="base")
    args = p.parse_args(argv)
    if args.check:
        import jax.numpy as jnp
        with open(os.path.join(args.check, "meta.json")) as f:
            meta = json.load(f)
        x = jnp.zeros((meta["batch"], *meta["hw"], 3), jnp.float32)
        pred = load_and_run(args.check, x)
        print(json.dumps({"check": "ok", "pred_shape": list(pred.shape)}))
        return 0
    export(args.out or "./export", args.shape, args.batch, args.encoder)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
