"""Data layer tests: specs, splits, synthetic dataset, fused device aug."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.data.splits import dataset_spec, parse_split_line, load_split
from mde_tpu.data.dataset import DepthDataset, kb_crop_bounds
from mde_tpu.data.augment import (
    AugmentConfig, device_augment_batch, normalize_images, _rotate_sample,
)
from mde_tpu.data.loader import DataLoader


def test_dataset_specs_match_reference_constants():
    # reference dataset/depth_dataset.py:47-157
    k = dataset_spec("KITTI", "train")
    assert (k.height, k.width) == (352, 704)
    assert (k.min_depth, k.max_depth, k.saving_factor) == (0.001, 80.0, 256.0)
    assert k.do_kb_crop and k.do_random_rotate and k.degree == 1.0

    kt = dataset_spec("KITTI", "test")
    assert (kt.height, kt.width) == (376, 1241)
    assert not kt.do_random_rotate

    n = dataset_spec("NYU", "train")
    assert (n.height, n.width) == (480, 640)
    assert (n.max_depth, n.saving_factor, n.degree) == (10.0, 1000.0, 2.5)
    assert not n.do_kb_crop

    o = dataset_spec("ONLINE", "test")
    assert o.max_depth == 88.0 and o.do_kb_crop

    with pytest.raises(ValueError):
        dataset_spec("NYU", "benchmark")


def test_kb_crop_bounds():
    top, left = kb_crop_bounds(375, 1242)
    assert (top, left) == (23, 13)
    top, left = kb_crop_bounds(376, 1241)
    assert (top, left) == (24, 12)


def test_parse_split_line():
    img, gt, focal = parse_split_line(
        "2011_09_26/x/image_02/data/0000000001.png gts/y.png 721.5377", "KITTI")
    assert img.endswith("0000000001.png") and gt == "gts/y.png"
    assert focal == pytest.approx(721.5377)
    img, gt, focal = parse_split_line("/kitchen/rgb_1.jpg /kitchen/sync_1.png", "NYU")
    assert not img.startswith("/") and focal == pytest.approx(518.8579)


def test_reference_splits_load_if_mounted():
    lines = load_split("KITTI", "test")
    if lines:  # reference mounted
        assert len(lines) == 652 or len(lines) == 651
        img, gt, focal = parse_split_line(lines[0], "KITTI")
        assert focal > 100


def test_synthetic_dataset_shapes():
    ds = DepthDataset("/nonexistent", "KITTI", "train", synthetic_len=8)
    assert ds.synthetic and len(ds) == 8
    s = ds[0]
    assert s["image"].shape == (352, 704, 3)
    assert s["depth"].shape == (352, 704, 1)
    # normalized image: roughly zero-mean-ish
    assert abs(float(s["image"].mean())) < 3.0

    ds_test = DepthDataset("/nonexistent", "KITTI", "test", synthetic_len=4)
    s = ds_test[0]
    assert s["image"].shape == (352, 1216, 3)  # kb-crop size


def test_rotation_matches_pil():
    """Device rotation vs PIL rotate (bilinear, zero fill): interior pixels
    must agree closely."""
    from PIL import Image
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64, 3).astype(np.float32)
    angle = 2.5

    got_img, got_dep = jax.jit(_rotate_sample)(
        jnp.asarray(img), jnp.asarray(img[..., :1]), jnp.asarray(angle))
    got = np.asarray(got_img)

    pil = np.stack([
        np.asarray(Image.fromarray(img[..., c]).rotate(
            angle, resample=Image.BILINEAR)) for c in range(3)], axis=-1)

    # compare away from borders (fill-edge handling differs sub-pixel-wise)
    diff = np.abs(got[4:-4, 4:-4] - pil[4:-4, 4:-4])
    assert diff.mean() < 5e-3
    assert np.quantile(diff, 0.99) < 5e-2


def test_device_augment_shapes_and_ranges():
    cfg = AugmentConfig(out_height=32, out_width=48, degree=1.0,
                        data_type="KITTI", clip_depth=40.0)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(4, 40, 64, 3), jnp.float32)
    depths = jnp.asarray(rng.uniform(0, 80, (4, 40, 64, 1)), jnp.float32)
    ai, ad = device_augment_batch(cfg, jax.random.PRNGKey(0), images, depths)
    assert ai.shape == (4, 32, 48, 3)
    assert ad.shape == (4, 32, 48, 1)
    # clip_depth: no depth above 40 survives
    assert float(ad.max()) <= 40.0
    # normalization applied: values outside [0,1]
    assert float(ai.min()) < -0.5


def test_device_augment_band_masking():
    cfg = AugmentConfig(out_height=64, out_width=64, degree=0.0,
                        data_type="KITTI", clip_depth=1e9,
                        height_drop=(0.5, 2), width_drop=(0.5, 2))
    images = jnp.ones((2, 64, 64, 3), jnp.float32)
    depths = jnp.ones((2, 64, 64, 1), jnp.float32)
    ai, ad = device_augment_batch(cfg, jax.random.PRNGKey(3), images, depths)
    # with 2+2 bands of up to 50%, some rows/cols should be zeroed
    zero_frac = float((np.asarray(ad) == 0).mean())
    assert 0.0 < zero_frac < 1.0
    # image and depth masked identically
    img_zero = (np.abs(np.asarray(ai)).sum(-1) == 0)
    dep_zero = (np.asarray(ad)[..., 0] == 0)
    np.testing.assert_array_equal(img_zero, dep_zero)


def test_dataloader_synthetic_epoch():
    ds = DepthDataset("/nonexistent", "NYU", "train", synthetic_len=8)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                    device_augment=True)
    batches = list(dl.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (4, 480, 640, 3)
    assert b["depth"].shape == (4, 480, 640, 1)
    assert b["focal"].shape == (4,)

    # eval loader: normalization only
    ds_t = DepthDataset("/nonexistent", "NYU", "test", synthetic_len=4)
    dl_t = DataLoader(ds_t, batch_size=2, device_augment=False)
    bt = next(iter(dl_t))
    assert bt["image"].shape == (2, 480, 640, 3)


def test_normalize_matches_reference_constants():
    x = jnp.ones((1, 2, 2, 3)) * 0.5
    y = np.asarray(normalize_images(x))
    want = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(y[0, 0, 0], want, rtol=1e-5)


def _write_png(path, arr):
    from PIL import Image
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if arr.dtype == np.uint16:
        Image.fromarray(arr).save(path)
    else:
        Image.fromarray(arr).save(path)


def test_real_kitti_loading_kb_crop_and_scaling(tmp_path):
    """Real-file path: PNG decode, KB-crop to (352,1216), /255 image and
    /256 depth scaling (reference depth_dataset.py:197-206,228)."""
    import os
    rng = np.random.RandomState(0)
    h, w = 375, 1242
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    depth_mm = (rng.rand(h, w) * 80 * 256).astype(np.uint16)
    _write_png(str(tmp_path / "data" / "raw" / "seq" / "img.png"), img)
    _write_png(str(tmp_path / "data" / "gts" / "seq" / "gt.png"), depth_mm)

    split_dir = tmp_path / "splits" / "KITTI"
    split_dir.mkdir(parents=True)
    (split_dir / "kitti_eigen_test.txt").write_text(
        "seq/img.png seq/gt.png 718.856\n")

    ds = DepthDataset(str(tmp_path / "data"), "KITTI", "test",
                      split_dir=str(tmp_path / "splits"))
    assert not ds.synthetic and len(ds) == 1
    sample = ds[0]
    assert sample["image"].shape == (352, 1216, 3)
    assert sample["depth"].shape == (352, 1216, 1)
    assert sample["focal"] == 718.856

    top, left = 375 - 352, (1242 - 1216) // 2
    # image is ImageNet-normalized in __getitem__; check via load_raw
    raw_img, raw_depth, _, _, _ = ds.load_raw(0)
    np.testing.assert_allclose(
        raw_img, img[top:top + 352, left:left + 1216].astype(np.float32) / 255.0,
        atol=1e-6)
    np.testing.assert_allclose(
        raw_depth[..., 0],
        depth_mm[top:top + 352, left:left + 1216].astype(np.float32) / 256.0,
        atol=1e-4)


def test_real_nyu_train_region_masking(tmp_path):
    """NYU train GT is zeroed outside rows 45:472, cols 43:608
    (reference depth_dataset.py:210-217)."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (480, 640, 3), dtype=np.uint8)
    depth = np.full((480, 640), 3000, dtype=np.uint16)  # 3 m everywhere
    _write_png(str(tmp_path / "data" / "scene" / "rgb_00000.jpg"), img)
    _write_png(str(tmp_path / "data" / "scene" / "sync_depth_00000.png"), depth)

    split_dir = tmp_path / "splits" / "NYU"
    split_dir.mkdir(parents=True)
    (split_dir / "nyu_train_36k.txt").write_text(
        "/scene/rgb_00000.jpg /scene/sync_depth_00000.png 518.8579\n")

    ds = DepthDataset(str(tmp_path / "data"), "NYU", "train",
                      split_dir=str(tmp_path / "splits"))
    assert not ds.synthetic
    _, raw_depth, _, _, _ = ds.load_raw(0)
    d = raw_depth[..., 0]
    assert np.all(d[:45, :] == 0) and np.all(d[472:, :] == 0)
    assert np.all(d[:, :43] == 0) and np.all(d[:, 608:] == 0)
    np.testing.assert_allclose(d[45:472, 43:608], 3.0, atol=1e-4)


def test_eval_loader_single_normalization():
    """Eval batches are ImageNet-normalized exactly ONCE (regression: the
    eval path used to host-normalize in __getitem__ and then re-clip +
    re-normalize on device)."""
    from mde_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

    ds = DepthDataset("/nonexistent", "NYU", "test", synthetic_len=2)
    raw_img = ds.load_raw(0)[0]
    want = (np.clip(raw_img, 0.0, 1.0) - IMAGENET_MEAN) / IMAGENET_STD

    dl = DataLoader(ds, batch_size=1, shuffle=False, device_augment=False,
                    drop_last=False)
    batch = next(iter(dl))
    np.testing.assert_allclose(np.asarray(batch["image"][0]), want,
                               rtol=1e-5, atol=1e-5)
