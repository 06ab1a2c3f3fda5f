"""Extract tooling tests (synthesized corpus)."""
import os

import numpy as np
import pytest
from PIL import Image

from mde_tpu.data.extract import extract_subset


def _mk_corpus(tmp_path, lines, data_type="KITTI"):
    split_dir = tmp_path / "splits" / "KITTI"
    split_dir.mkdir(parents=True)
    name = {"KITTI": "kitti_eigen_test.txt"}[data_type]
    (split_dir / name).write_text("\n".join(lines) + "\n")
    src = tmp_path / "src"
    for line in lines:
        img, gt = line.split()[:2]
        for rel in (img, gt):
            p = src / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(p)
    return str(tmp_path / "splits"), str(src)


def test_extract_subset_copies_pairs(tmp_path):
    lines = ["a/img_0.png a/gt_0.png 718.0", "b/img_1.png b/gt_1.png 718.0"]
    split_dir, src = _mk_corpus(tmp_path, lines)
    dst = str(tmp_path / "dst")
    copied, missing = extract_subset("KITTI", "test", src, dst,
                                     split_dir=split_dir)
    assert (copied, missing) == (2, 0)
    for line in lines:
        img, gt = line.split()[:2]
        assert os.path.isfile(os.path.join(dst, img))
        assert os.path.isfile(os.path.join(dst, gt))


def test_extract_subset_missing(tmp_path):
    lines = ["a/img_0.png a/gt_0.png 718.0"]
    split_dir, src = _mk_corpus(tmp_path, lines)
    os.remove(os.path.join(src, "a/gt_0.png"))
    with pytest.raises(FileNotFoundError):
        extract_subset("KITTI", "test", src, str(tmp_path / "d"),
                       split_dir=split_dir)
    copied, missing = extract_subset("KITTI", "test", src, str(tmp_path / "d"),
                                     split_dir=split_dir, missing_ok=True)
    assert (copied, missing) == (0, 1)
