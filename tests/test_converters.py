"""Checkpoint-converter structural tests.

Synthesize torch state dicts with the released checkpoints' exact key names
and shapes (derived from the same architecture constants), convert, and
require an exact structural match against the real flax init trees — the
analog of the reference's strict=True load proofs
(``model/adabins_check_model.py``, ``oda2_swin_transformer.py:654``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mde_tpu.core.checkpoint import (
    convert_adabins_model, convert_newcrfs_model, tree_shapes_match)
from mde_tpu.models.efficientnet import round_channels, round_repeats


def _conv_t(d, key, cout, cin, k, bias=True):
    d[f"{key}.weight"] = np.zeros((cout, cin, k, k), np.float32)
    if bias:
        d[f"{key}.bias"] = np.zeros((cout,), np.float32)


def _bn_t(d, key, c):
    for s in ("weight", "bias", "running_mean", "running_var"):
        d[f"{key}.{s}"] = np.zeros((c,), np.float32)
    d[f"{key}.num_batches_tracked"] = np.zeros((), np.int64)


def _ln_t(d, key, c):
    d[f"{key}.weight"] = np.zeros((c,), np.float32)
    d[f"{key}.bias"] = np.zeros((c,), np.float32)


def _dense_t(d, key, cout, cin, bias=True):
    d[f"{key}.weight"] = np.zeros((cout, cin), np.float32)
    if bias:
        d[f"{key}.bias"] = np.zeros((cout,), np.float32)


def _fake_efficientnet_b5(d, p):
    widths = [round_channels(c, 1.6) for c in (16, 24, 40, 80, 112, 192, 320)]
    kernels = (3, 3, 5, 3, 5, 5, 3)
    expands = (1, 6, 6, 6, 6, 6, 6)
    reps = [round_repeats(r, 2.2) for r in (1, 2, 2, 3, 3, 4, 1)]
    stem = round_channels(32, 1.6)

    _conv_t(d, f"{p}conv_stem", stem, 3, 3, bias=False)
    _bn_t(d, f"{p}bn1", stem)
    cin = stem
    for si in range(7):
        cout, k, e = widths[si], kernels[si], expands[si]
        for bi in range(reps[si]):
            bp = f"{p}blocks.{si}.{bi}"
            red = max(1, int(cin * 0.25))
            if e == 1:
                d[f"{bp}.conv_dw.weight"] = np.zeros((cin, 1, k, k), np.float32)
                _bn_t(d, f"{bp}.bn1", cin)
                _conv_t(d, f"{bp}.se.conv_reduce", red, cin, 1)
                _conv_t(d, f"{bp}.se.conv_expand", cin, red, 1)
                _conv_t(d, f"{bp}.conv_pw", cout, cin, 1, bias=False)
                _bn_t(d, f"{bp}.bn2", cout)
            else:
                mid = cin * e
                _conv_t(d, f"{bp}.conv_pw", mid, cin, 1, bias=False)
                _bn_t(d, f"{bp}.bn1", mid)
                d[f"{bp}.conv_dw.weight"] = np.zeros((mid, 1, k, k), np.float32)
                _bn_t(d, f"{bp}.bn2", mid)
                _conv_t(d, f"{bp}.se.conv_reduce", red, mid, 1)
                _conv_t(d, f"{bp}.se.conv_expand", mid, red, 1)
                _conv_t(d, f"{bp}.conv_pwl", cout, mid, 1, bias=False)
                _bn_t(d, f"{bp}.bn3", cout)
            cin = cout
    _conv_t(d, f"{p}conv_head", 2048, cin, 1, bias=False)


def _fake_adabins_state():
    d = {}
    _fake_efficientnet_b5(d, "encoder.original_model.")
    # decoder
    _conv_t(d, "decoder.conv2", 2048, 2048, 1)
    skips = (176, 64, 40, 24)
    cin = 2048
    for u in range(1, 5):
        cout = 2048 // (2 ** u)
        _conv_t(d, f"decoder.up{u}._net.0", cout, cin + skips[u - 1], 3)
        _bn_t(d, f"decoder.up{u}._net.1", cout)
        _conv_t(d, f"decoder.up{u}._net.3", cout, cout, 3)
        _bn_t(d, f"decoder.up{u}._net.4", cout)
        cin = cout
    _conv_t(d, "decoder.conv3", 128, 128, 3)
    # mViT head
    e = 128
    _conv_t(d, "adaptive_bins_layer.embedding_conv", e, 128, 3)
    pt = "adaptive_bins_layer.patch_transformer"
    d[f"{pt}.embedding_encoder.weight"] = np.zeros((e, 128, 16, 16), np.float32)
    d[f"{pt}.embedding_encoder.bias"] = np.zeros((e,), np.float32)
    d[f"{pt}.positional_encodings"] = np.zeros((500, e), np.float32)
    for i in range(4):
        lp = f"{pt}.transformer_encoder.layers.{i}"
        d[f"{lp}.self_attn.in_proj_weight"] = np.zeros((3 * e, e), np.float32)
        d[f"{lp}.self_attn.in_proj_bias"] = np.zeros((3 * e,), np.float32)
        _dense_t(d, f"{lp}.self_attn.out_proj", e, e)
        _dense_t(d, f"{lp}.linear1", 1024, e)
        _dense_t(d, f"{lp}.linear2", e, 1024)
        _ln_t(d, f"{lp}.norm1", e)
        _ln_t(d, f"{lp}.norm2", e)
    for t, (o, i) in zip((0, 2, 4), ((256, 128), (256, 256), (256, 256))):
        _dense_t(d, f"adaptive_bins_layer.regressor.{t}", o, i)
    _conv_t(d, "conv_out", 256, 128, 1)
    return d


@pytest.mark.heavy
def test_adabins_converter_matches_model_tree():
    converted = convert_adabins_model(_fake_adabins_state())

    from mde_tpu.models.adabins.model import UnetAdaptiveBins
    m = UnetAdaptiveBins.build({"num_bins": 256}, 1e-3, 10.0)
    x = jnp.zeros((1, 480, 640, 3), jnp.float32)
    target = jax.eval_shape(
        lambda: m.init({"params": jax.random.PRNGKey(0)}, x, train=False))
    target = {"params": target["params"],
              "batch_stats": target["batch_stats"]}
    mism = tree_shapes_match(converted, target)
    assert mism == [], "\n".join(mism[:40])


def _fake_swin_block(d, p, dim, heads, window=7, qk_only=False):
    _ln_t(d, f"{p}.norm1", dim)
    d[f"{p}.attn.relative_position_bias_table"] = np.zeros(
        ((2 * window - 1) ** 2, heads), np.float32)
    d[f"{p}.attn.relative_position_index"] = np.zeros(
        (window * window, window * window), np.int64)
    if qk_only:
        _dense_t(d, f"{p}.attn.qk", 2 * dim, dim)
    else:
        _dense_t(d, f"{p}.attn.qkv", 3 * dim, dim)
    _dense_t(d, f"{p}.attn.proj", dim, dim)
    _ln_t(d, f"{p}.norm2", dim)
    _dense_t(d, f"{p}.mlp.fc1", 4 * dim, dim)
    _dense_t(d, f"{p}.mlp.fc2", dim, 4 * dim)


def _fake_newcrfs_state(version="tiny07"):
    dims = {"tiny": 96, "base": 128, "large": 192}[version[:-2]]
    depths = {"tiny": (2, 2, 6, 2), "base": (2, 2, 18, 2),
              "large": (2, 2, 18, 2)}[version[:-2]]
    heads = {"tiny": (3, 6, 12, 24), "base": (4, 8, 16, 32),
             "large": (6, 12, 24, 48)}[version[:-2]]
    in_ch = [dims * 2 ** i for i in range(4)]
    d = {}
    _conv_t(d, "backbone.patch_embed.proj", dims, 3, 4)
    _ln_t(d, "backbone.patch_embed.norm", dims)
    for i, (dep, h) in enumerate(zip(depths, heads)):
        for j in range(dep):
            _fake_swin_block(d, f"backbone.layers.{i}.blocks.{j}",
                             in_ch[i], h)
        if i < 3:
            _ln_t(d, f"backbone.layers.{i}.downsample.norm", 4 * in_ch[i])
            _dense_t(d, f"backbone.layers.{i}.downsample.reduction",
                     2 * in_ch[i], 4 * in_ch[i], bias=False)
    for i in range(4):
        _ln_t(d, f"backbone.norm{i}", in_ch[i])
    # PSP
    ch = 512
    for i in range(4):
        pp = f"decoder.psp_modules.{i}.1"
        _conv_t(d, f"{pp}.conv", ch, in_ch[3], 1, bias=False)
        if i == 0:
            _ln_t(d, f"{pp}.gn", ch)  # GN weight/bias like LN
        else:
            _bn_t(d, f"{pp}.bn", ch)
    _conv_t(d, "decoder.bottleneck.conv", ch, in_ch[3] + 4 * ch, 3, bias=False)
    _bn_t(d, "decoder.bottleneck.bn", ch)
    # CRFs
    crf_dims = (128, 256, 512, 1024)
    v_dims = (64, 128, 256, 512)
    crf_heads = (4, 8, 16, 32)
    for k in range(4):
        cp, ed = f"crf{k}", crf_dims[k]
        if in_ch[k] != ed:
            _conv_t(d, f"{cp}.proj_x", ed, in_ch[k], 3)
        if v_dims[k] != ed:
            _conv_t(d, f"{cp}.proj_v", ed, v_dims[k], 3)
        for j in range(2):
            _fake_swin_block(d, f"{cp}.crf_layer.blocks.{j}", ed,
                             crf_heads[k], qk_only=True)
        _ln_t(d, f"{cp}.norm_crf", ed)
    _conv_t(d, "disp_head1.conv1", 1, crf_dims[0], 3)
    return d


@pytest.mark.heavy
def test_newcrfs_converter_matches_model_tree():
    converted = convert_newcrfs_model(_fake_newcrfs_state("tiny07"),
                                      version="tiny07")

    from mde_tpu.models.newcrfs.model import NewCRFDepth
    m = NewCRFDepth.build({"version": "tiny07"}, 1e-3, 10.0)
    x = jnp.zeros((1, 480, 640, 3), jnp.float32)
    target = jax.eval_shape(
        lambda: m.init({"params": jax.random.PRNGKey(0)}, x, train=False))
    target = {"params": target["params"],
              "batch_stats": target["batch_stats"]}
    mism = tree_shapes_match(converted, target)
    assert mism == [], "\n".join(mism[:40])


def test_mha_conversion_math():
    """Converted torch MHA params reproduce torch's attention numerically."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    from mde_tpu.core.checkpoint import KeyAccountant, _torch_mha

    e, nh, s = 32, 4, 6
    tm = torch.nn.MultiheadAttention(e, nh, batch_first=True)
    tm.eval()
    state = {f"attn.{k}": v.detach().numpy()
             for k, v in tm.state_dict().items()}
    acc = KeyAccountant(state)
    params = _torch_mha(acc, "attn", nh)

    x = np.random.RandomState(0).rand(2, s, e).astype(np.float32)
    with torch.no_grad():
        ref, _ = tm(torch.from_numpy(x), torch.from_numpy(x),
                    torch.from_numpy(x))
    mod = nn.MultiHeadDotProductAttention(num_heads=nh, deterministic=True)
    tree = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0),
                                           jnp.asarray(x), jnp.asarray(x)))
    assert tree_shapes_match({"params": params}, tree) == []
    out = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_parity_check_diff_cli(tmp_path):
    import numpy as np
    sys_path_tool = __import__("importlib.util", fromlist=["util"])
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "parity_check", "tools/parity_check.py")
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    a = {"out0": np.ones((2, 2), np.float32)}
    b = {"out0": np.ones((2, 2), np.float32) * (1 + 5e-4)}
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    np.savez(pa, **a)
    np.savez(pb, **b)
    assert mod.main(["diff", pa, pb, "--tol", "1e-3"]) == 0
    assert mod.main(["diff", pa, pb, "--tol", "1e-5"]) == 1
