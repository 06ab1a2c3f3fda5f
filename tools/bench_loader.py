"""Host input-pipeline benchmark: real PNG decode -> device-ready batches.

The device consumes ~27 img/s at the flagship's inference bench (BASELINE.md)
and ~6 img/s training; the host loader must decode + crop + stack faster than
that to keep the chip busy. This writes a real-sized on-disk corpus (KITTI
375x1242 RGB + uint16 depth PNGs, or NYU 480x640 JPEG-sized PNGs + depth),
then measures ``DataLoader.epoch`` throughput end-to-end (decode workers,
KB-crop/random-crop path, host stack; device augment pinned to CPU so the
number isolates the host).

Usage: python tools/bench_loader.py [--dataset KITTI|NYU] [--n 96]
       [--batch 8] [--workers 4,8] [--keep-dir DIR]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_corpus(root: str, dataset: str, n: int) -> str:
    """Write n (image, depth) PNG pairs + a split file; returns split dir."""
    from PIL import Image

    rng = np.random.RandomState(0)
    data = os.path.join(root, "data")
    split_dir = os.path.join(root, "splits", dataset)
    os.makedirs(data, exist_ok=True)
    os.makedirs(split_dir, exist_ok=True)

    if dataset == "KITTI":
        h, w = 375, 1242
        img_ext, gt_scale = ".png", 256.0
        split_name = "kitti_eigen_train.txt"
        img_sub, gt_sub = "raw", "gts"  # KITTI layout (splits.py:75)
    else:
        h, w = 480, 640
        img_ext, gt_scale = ".jpg", 1000.0
        split_name = "nyu_train_36k.txt"
        img_sub = gt_sub = ""

    lines = []
    for i in range(n):
        # realistic content: smooth gradients + noise so PNG compression
        # ratios (and so zlib decode cost) are in the right ballpark
        yy, xx = np.mgrid[0:h, 0:w]
        base = (96 + 64 * np.sin(xx / 97.0 + i) * np.cos(yy / 53.0))
        img = np.clip(base[..., None] + rng.randint(0, 48, (h, w, 3)),
                      0, 255).astype(np.uint8)
        depth_m = 2.0 + 50.0 * rng.rand(h, w).astype(np.float32)
        depth = (depth_m * gt_scale).astype(np.uint16)

        rel_img = f"seq_{i % 4:02d}/image_{i:05d}{img_ext}"
        rel_gt = f"seq_{i % 4:02d}/depth_{i:05d}.png"
        for rel, sub, arr in ((rel_img, img_sub, img), (rel_gt, gt_sub, depth)):
            path = os.path.join(data, sub, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(arr).save(path)
        lines.append(f"{rel_img} {rel_gt} 718.856")

    with open(os.path.join(split_dir, split_name), "w") as f:
        f.write("\n".join(lines) + "\n")
    return os.path.join(root, "splits"), data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="KITTI", choices=["KITTI", "NYU"])
    p.add_argument("--n", type=int, default=96)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", default="2,4,8")
    p.add_argument("--keep-dir", default=None)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # isolate the HOST pipeline

    from mde_tpu.data.dataset import DepthDataset
    from mde_tpu.data.loader import DataLoader

    root = args.keep_dir or tempfile.mkdtemp(prefix="mde_loader_bench_")
    try:
        t0 = time.perf_counter()
        split_dir, data = build_corpus(root, args.dataset, args.n)
        print(f"corpus: {args.n} pairs in {time.perf_counter()-t0:.1f}s "
              f"({root})", file=sys.stderr)

        ds = DepthDataset(data, args.dataset, "train", split_dir=split_dir)
        assert not ds.synthetic and len(ds) == args.n

        # stage breakdown: raw decode+crop throughput straight off the pool
        # (no stacking, no augment) — the ceiling any loader policy can reach
        import concurrent.futures
        for nw in [int(x) for x in args.workers.split(",")]:
            for i in range(min(8, args.n)):
                ds.load_raw(i)  # page-cache warmup
            t0 = time.perf_counter()
            with concurrent.futures.ThreadPoolExecutor(nw) as pool:
                list(pool.map(ds.load_raw, range(args.n)))
            dt = time.perf_counter() - t0
            print(f"decode-only workers={nw}: {args.n / dt:.1f} img/s",
                  file=sys.stderr)

        # stage 2: the HOST pipeline (decode + crop + stack, no device work)
        # — this is what must outrun the chip in deployment, where the fused
        # augment runs ON TPU and overlaps compute via the one-batch-ahead
        # dispatch; running the augment on this CPU backend (stage 3) bounds
        # it from below but mostly measures XLA:CPU, not the host path
        host_results = {}
        for nw in [int(x) for x in args.workers.split(",")]:
            loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                                num_workers=nw, host_only=True)
            for _ in loader.epoch(0):
                pass  # warmup (page cache)
            t0 = time.perf_counter()
            n_img = 0
            for batch in loader.epoch(1):
                n_img += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            host_results[nw] = n_img / dt
            print(f"host-pipeline workers={nw}: {n_img / dt:.1f} img/s",
                  file=sys.stderr)

        results = {}
        for nw in [int(x) for x in args.workers.split(",")]:
            loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                                num_workers=nw, device_augment=True)
            # warmup epoch (page cache, jit of the aug kernel)
            for _ in loader.epoch(0):
                pass
            t0 = time.perf_counter()
            n_img = 0
            for batch in loader.epoch(1):
                jax.block_until_ready(batch["image"])
                n_img += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            results[nw] = n_img / dt
            print(f"with-cpu-augment workers={nw}: {n_img / dt:.1f} img/s",
                  file=sys.stderr)

        best = max(host_results.values())
        print(json.dumps({
            "metric": f"host_loader_{args.dataset.lower()}_images_per_sec",
            "value": round(best, 1), "unit": "img/s",
            "per_workers_host": {str(k): round(v, 1)
                                 for k, v in host_results.items()},
            "per_workers_with_cpu_augment": {str(k): round(v, 1)
                                             for k, v in results.items()},
            "batch": args.batch, "n_images": args.n,
        }))
    finally:
        if not args.keep_dir:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
