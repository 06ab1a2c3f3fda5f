"""Golden-image regression plumbing (reference ``cherrypick/*.png``).

Exact-value goldens need released reference weights; these tests pin the
*plumbing* with synthetic goldens instead: predict -> PNG is byte-stable
(deterministic) run to run, ``compare_png_dirs`` reports zero diff against a
self-captured golden and flags perturbed predictions / missing files, and
the colorize path is deterministic for fixed inputs.
"""

import numpy as np
import pytest
import jax

from mde_tpu.core.config import load_config
from mde_tpu.train.driver import Trainer
from mde_tpu.utils.golden import compare_png_dirs, summarize


def _tiny_trainer():
    opt = load_config({
        "model": {"name": "oda2_conv", "decoder_channels": 8,
                  "encoder_type": "custom"},
        "dataset": {"data_type": "ONLINE", "data_path": ""},
        "dataloader": {"batch_size": 1, "num_workers": 1},
        "optimizer": {"lr": 1e-4, "weight_decay": 0.1},
        "train": {"epoch": 1},
    })
    trainer = Trainer(opt, model_overrides=dict(
        resize_to_multiple=False,
        encoder_kwargs=dict(embed_dim=8, depths=(1, 1, 1, 1),
                            num_heads=(1, 2, 4, 8),
                            window_size=4, use_checkpoint=False)))
    trainer.init_state()
    return trainer


def test_predict_golden_roundtrip(tmp_path):
    trainer = _tiny_trainer()
    golden = tmp_path / "golden"
    pred = tmp_path / "pred"
    n1 = trainer.predict(str(golden), visualize=True)
    n2 = trainer.predict(str(pred), visualize=True)
    assert n1 == n2 > 0

    # byte-stable: two runs with the same params write identical PNGs
    g_files = sorted(p.relative_to(golden) for p in golden.rglob("*.png"))
    assert g_files
    for rel in g_files:
        assert (golden / rel).read_bytes() == (pred / rel).read_bytes(), rel

    report = compare_png_dirs(str(pred), str(golden), tolerance=0.0)
    assert len(report) == len(g_files)
    assert all(r["pass"] for r in report.values()), summarize(report)


def test_compare_flags_drift_and_missing(tmp_path):
    from PIL import Image

    golden = tmp_path / "golden"
    pred = tmp_path / "pred"
    golden.mkdir()
    pred.mkdir()
    base = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 100)
    Image.fromarray(base).save(golden / "a.png")
    Image.fromarray(base).save(golden / "missing.png")
    drifted = base.copy()
    drifted[0, 0] += 3
    Image.fromarray(drifted).save(pred / "a.png")

    report = compare_png_dirs(str(pred), str(golden), tolerance=2.0)
    assert report["a.png"]["max_abs_diff"] == 3.0 and not report["a.png"]["pass"]
    assert not report["missing.png"]["pass"]
    report_loose = compare_png_dirs(str(pred), str(golden), tolerance=3.0,
                                    names=["a.png"])
    assert report_loose["a.png"]["pass"] and len(report_loose) == 1


def test_colorize_deterministic():
    from mde_tpu.utils.visualize import colorize

    depth = np.linspace(0.0, 10.0, 64, dtype=np.float32).reshape(8, 8)
    a = colorize(depth, 0.0, 10.0)
    b = colorize(depth, 0.0, 10.0)
    assert a.dtype == np.uint8 and a.shape == (8, 8, 4)
    np.testing.assert_array_equal(a, b)
