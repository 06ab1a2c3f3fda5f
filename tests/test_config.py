import glob
import json
import os

import pytest

from mde_tpu.core.config import Config, load_config, parse

REF_JSON = "/root/reference/json"


def test_config_attr_and_item_access():
    c = Config({"a": 1, "b": {"c": 2}})
    assert c["a"] == 1 and c.a == 1
    assert c.b.c == 2 and c["b"]["c"] == 2
    assert c.b.get("missing", 7) == 7
    c.b.d = 3
    assert c["b"]["d"] == 3
    assert isinstance(c.to_dict()["b"], dict)


def test_defaults_filled():
    opt = load_config({"model": {"name": "oda2_red_order_swin2"}})
    assert opt.model.bias_type == "depth"
    assert opt.train.grad_norm == 0.1
    assert opt.loss.alpha == 10.0
    assert opt.optimizer.same_lr is True
    assert opt.num_devices == 1


@pytest.mark.skipif(not os.path.isdir(REF_JSON), reason="reference not mounted")
def test_all_reference_configs_load():
    """The entire reference config corpus must load unchanged (SURVEY.md §5.6)."""
    paths = sorted(glob.glob(os.path.join(REF_JSON, "**", "*.json"), recursive=True))
    assert len(paths) >= 70
    names = set()
    for p in paths:
        with open(p) as f:
            raw = json.load(f)
        opt = load_config(raw)
        if "name" in opt.model:  # a few analysis configs carry no model
            names.add(opt.model.name)
        assert opt.dataset.data_type in ("KITTI", "NYU", "ONLINE"), p
    # all 20 model families appear in the corpus
    assert "oda2_red_order_swin2" in names
    assert "adabins" in names
    assert "newcrfs" in names


@pytest.mark.skipif(not os.path.isdir(REF_JSON), reason="reference not mounted")
def test_parse_dumps_option(tmp_path):
    src = os.path.join(REF_JSON, "kitti", "oda2", "oda2_red_order_swin2_neck_red33.json")
    with open(src) as f:
        raw = json.load(f)
    raw["output_dir"] = str(tmp_path / "out")
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(raw))
    opt = parse(str(p))
    assert (tmp_path / "out" / "option.json").exists()
    assert opt.model.neck_type == "red33"
    assert opt.num_devices == 4


@pytest.mark.skipif(not os.path.isdir(REF_JSON), reason="reference not mounted")
def test_every_reference_config_builds_a_model():
    """build_model must accept EVERY config in the corpus — the full §5.6
    name space with each config's exact per-family arguments."""
    from mde_tpu.models import build_model

    paths = sorted(glob.glob(os.path.join(REF_JSON, "**", "*.json"),
                             recursive=True))
    built = 0
    for p in paths:
        with open(p) as f:
            raw = json.load(f)
        opt = load_config(raw)
        if "name" not in opt.model:
            continue
        dt = opt.dataset.data_type
        min_d = 0.001
        max_d = {"KITTI": 80.0, "NYU": 10.0, "ONLINE": 88.0}[dt]
        model = build_model(opt, min_d, max_d)
        assert model is not None, p
        built += 1
    assert built >= 70
