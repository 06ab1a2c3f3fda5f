"""Executed activation parity against the REFERENCE torch models.

Round-1 parity evidence was op-level; these tests close the loop at the
module/model level, the way the reference itself checks implementations
(``model/swin_transformer_check.py:22-52``): instantiate the *reference's own
torch code* (random init), export its state dict, run it through our
torch->flax converters (``mde_tpu/core/checkpoint.py``), and assert per-stage
max-abs activation differences < 1e-4 in f32 on identical inputs.

Covered modules (VERDICT r1 item 1):
* ODA2 Swin encoder, per stage (``model/ODA2/oda2_swin_transformer.py:503-690``)
* flagship ordered decoder, all iterative outputs
  (``model/ODA2/oda2_red_order_swin2_decoder.py``), all 6 necks + both scales
* one NewCRF stage (``model/NewCRFs/newcrf_layers.py:366-433``)
* AdaBins mViT head (``model/Adabins/miniViT.py:7-48``)

No released weights needed: conversion is init-value-agnostic.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from _torch_ref import import_ref, load_ref_file, state_dict_numpy
from mde_tpu.core.checkpoint import (
    KeyAccountant, _conv, _dense, _ln, _swin_block_params, _torch_mha,
    convert_swin_backbone, convert_oda2_decoder)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32) - 0.5


def _max_abs(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


TINY_SWIN = dict(embed_dim=16, depths=(2, 2, 2, 2), num_heads=(1, 2, 4, 8),
                 window_size=7)


def test_oda2_swin_encoder_stage_parity():
    ref_mod = import_ref("model.ODA2.oda2_swin_transformer")
    tm = ref_mod.SwinTransformer(
        pretrain_img_size=224, patch_size=4, drop_prob=0.0,
        attn_drop_prob=0.0, path_drop_prob=0.0, use_checkpoint=False,
        **TINY_SWIN)
    tm.eval()

    x = _rand((1, 3, 64, 96), seed=1)  # 16x24 tokens: exercises window padding
    with torch.no_grad():
        ref_outs = tm(torch.from_numpy(x))

    params = convert_swin_backbone(state_dict_numpy(tm),
                                   depths=TINY_SWIN["depths"],
                                   take_out_norms=True)

    from mde_tpu.models.swin import SwinTransformer
    ours = SwinTransformer(path_drop_prob=0.0, use_checkpoint=False,
                           **TINY_SWIN)
    outs = ours.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    assert len(outs) == len(ref_outs) == 4
    for i, (o, r) in enumerate(zip(outs, ref_outs)):
        r = r.numpy().transpose(0, 2, 3, 1)
        assert o.shape == r.shape, (i, o.shape, r.shape)
        diff = _max_abs(o, r)
        assert diff < 1e-4, f"stage {i}: max abs diff {diff}"


DEC_KW = dict(dec_dim=16, num_heads=2, num_repeats=2, num_emb=16,
              window_size=4, attn_drop_prob=0.0, drop_prob=0.0)
ENC_DIMS = (16, 32, 64, 128)


def _decoder_parity(neck_type: str, output_scale: int, bias_type: str = "depth"):
    ref_mod = import_ref("model.ODA2.oda2_red_order_swin2_decoder")
    tm = ref_mod.OrderedSwin2RegDecoder(
        enc_dims=ENC_DIMS, output_scale=output_scale, bias_type=bias_type,
        neck_type=neck_type, **DEC_KW)
    tm.eval()

    h4, w4 = 16, 24
    feats = [_rand((1, c, h4 // 2 ** i, w4 // 2 ** i), seed=10 + i)
             for i, c in enumerate(ENC_DIMS)]
    with torch.no_grad():
        ref_outs, _ = tm([torch.from_numpy(f) for f in feats])

    variables = convert_oda2_decoder(
        state_dict_numpy(tm), num_repeats=DEC_KW["num_repeats"],
        neck_type=neck_type, output_scale=output_scale, bias_type=bias_type)

    from mde_tpu.models.oda2.red_order_swin2 import OrderedSwin2RegDecoder
    ours = OrderedSwin2RegDecoder(
        output_scale=output_scale, bias_type=bias_type, neck_type=neck_type,
        use_checkpoint=False, **DEC_KW)
    outs, _ = ours.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats),
        train=False)

    assert len(outs) == len(ref_outs) == DEC_KW["num_repeats"] + 1
    for i, (o, r) in enumerate(zip(outs, ref_outs)):
        r = r.numpy().transpose(0, 2, 3, 1)
        assert o.shape == r.shape, (i, o.shape, r.shape)
        diff = _max_abs(o, r)
        assert diff < 1e-4, f"iterative output {i}: max abs diff {diff}"


def test_flagship_decoder_parity_red33():
    """Default-suite case: the flagship's best neck (red33), both SAs and all
    iterative outputs, depth-bias table converted verbatim."""
    _decoder_parity("red33", output_scale=4)


@pytest.mark.heavy
@pytest.mark.parametrize("neck_type,output_scale", [
    ("red", 4), ("fpn", 4), ("segformer", 4),
    ("red33r", 4), ("red33res", 4), ("red33", 2),
])
def test_flagship_decoder_parity_variants(neck_type, output_scale):
    _decoder_parity(neck_type, output_scale)


@pytest.mark.heavy
def test_flagship_decoder_parity_bias_none():
    _decoder_parity("red33", output_scale=4, bias_type="none")


def test_flagship_full_model_parity():
    """End-to-end: reference Swin encoder + ordered decoder composed like
    ``ODA2OrderedSwin2RegModel`` (``oda2_red_order_swin2.py:45-60``; the resize
    wrapper is bilinear-parity-tested elsewhere) vs our full model through
    ``convert_oda2_red_order_swin2``."""
    swin_mod = import_ref("model.ODA2.oda2_swin_transformer")
    dec_mod = import_ref("model.ODA2.oda2_red_order_swin2_decoder")

    class RefModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = swin_mod.SwinTransformer(
                pretrain_img_size=224, patch_size=4, drop_prob=0.0,
                attn_drop_prob=0.0, path_drop_prob=0.0, use_checkpoint=False,
                **TINY_SWIN)
            self.decoder = dec_mod.OrderedSwin2RegDecoder(
                enc_dims=ENC_DIMS, output_scale=4, bias_type="depth",
                neck_type="red33", **DEC_KW)

        def forward(self, x):
            return self.decoder(self.encoder(x))

    tm = RefModel()
    tm.eval()

    x = _rand((1, 3, 64, 96), seed=7)
    with torch.no_grad():
        ref_outs, _ = tm(torch.from_numpy(x))

    from mde_tpu.core.checkpoint import convert_oda2_red_order_swin2
    variables = convert_oda2_red_order_swin2(
        state_dict_numpy(tm), depths=TINY_SWIN["depths"],
        num_repeats=DEC_KW["num_repeats"], neck_type="red33",
        output_scale=4, bias_type="depth")

    from mde_tpu.models.oda2.red_order_swin2 import ODA2OrderedSwin2RegModel
    ours = ODA2OrderedSwin2RegModel(
        min_depth=0.001, max_depth=1.0,  # max_depth 1: outs stay raw sigmoids
        encoder_type="custom",
        encoder_kwargs=dict(path_drop_prob=0.0, use_checkpoint=False,
                            **TINY_SWIN),
        output_scale=4, bias_type="depth", neck_type="red33",
        use_checkpoint=False, resize_to_multiple=False, **DEC_KW)
    _, outs, _ = ours.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    assert len(outs) == len(ref_outs) == DEC_KW["num_repeats"] + 1
    for i, (o, r) in enumerate(zip(outs, ref_outs)):
        r = r.numpy().transpose(0, 2, 3, 1)
        assert o.shape == r.shape, (i, o.shape, r.shape)
        diff = _max_abs(o, r)
        assert diff < 1e-4, f"full-model output {i}: max abs diff {diff}"


def test_newcrf_stage_parity():
    """One NewCRF stage: qk-from-x / v-from-estimate window attention x2
    (W-MSA + SW-MSA) + out norm (reference ``newcrf_layers.py:366-433``)."""
    ref_mod = load_ref_file("model/NewCRFs/newcrf_layers.py",
                            "ref_newcrf_layers")
    tm = ref_mod.NewCRF(input_dim=24, embed_dim=16, v_dim=16,
                        window_size=7, num_heads=2)
    tm.eval()

    x = _rand((1, 24, 18, 25), seed=3)   # non-multiple of 7: zero-pad path
    v = _rand((1, 16, 18, 25), seed=4)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(v)).numpy()

    acc = KeyAccountant(state_dict_numpy(tm))
    acc.skip(r"relative_position_index")
    params = {"proj_x": _conv(acc, "proj_x")}
    for j in range(2):
        params[f"blocks{j}"] = _swin_block_params(
            acc, f"crf_layer.blocks.{j}", qk_only=True)
    params["norm_crf"] = _ln(acc, "norm_crf")
    acc.assert_exhausted()

    from mde_tpu.models.newcrfs.layers import NewCRF
    ours = NewCRF(embed_dim=16, num_heads=2, window_size=7)
    out = ours.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(v.transpose(0, 2, 3, 1)), train=False)

    ref_out = ref_out.transpose(0, 2, 3, 1)
    assert out.shape == ref_out.shape
    diff = _max_abs(out, ref_out)
    assert diff < 1e-4, f"NewCRF stage: max abs diff {diff}"


def test_adabins_mvit_parity():
    """mViT adaptive-bin head: patch transformer + pixel-wise dot product +
    bin-width regressor (reference ``miniViT.py:7-48``)."""
    ref_mod = import_ref("model.Adabins.miniViT")
    tm = ref_mod.mViT(in_channels=8, n_query_channels=16, patch_size=8,
                      dim_out=10, embedding_dim=32, num_heads=4, norm="linear")
    tm.eval()

    x = _rand((1, 8, 32, 48), seed=5)  # 4x6=24 tokens >= 17 queries
    with torch.no_grad():
        ref_widths, ref_maps = tm(torch.from_numpy(x))

    acc = KeyAccountant(state_dict_numpy(tm))
    pt = {
        "embedding_encoder": _conv(acc, "patch_transformer.embedding_encoder"),
        "positional_encodings": acc.take(
            "patch_transformer.positional_encodings"),
    }
    for i in range(4):
        lp = f"patch_transformer.transformer_encoder.layers.{i}"
        pt[f"layer{i}"] = {
            "self_attn": _torch_mha(acc, f"{lp}.self_attn", 4),
            "linear1": _dense(acc, f"{lp}.linear1"),
            "linear2": _dense(acc, f"{lp}.linear2"),
            "norm1": _ln(acc, f"{lp}.norm1"),
            "norm2": _ln(acc, f"{lp}.norm2"),
        }
    params = {"patch_transformer": pt,
              "embedding_conv": _conv(acc, "embedding_conv")}
    for i, t in enumerate((0, 2, 4)):
        params[f"regressor{i}"] = _dense(acc, f"regressor.{t}")
    acc.assert_exhausted()

    from mde_tpu.models.adabins.model import mViT
    ours = mViT(n_query_channels=16, patch_size=8, dim_out=10,
                embedding_dim=32, num_heads=4, norm="linear")
    widths, maps = ours.apply({"params": params},
                              jnp.asarray(x.transpose(0, 2, 3, 1)),
                              train=False)

    ref_maps = ref_maps.numpy().transpose(0, 2, 3, 1)
    assert maps.shape == ref_maps.shape
    assert _max_abs(widths, ref_widths.numpy()) < 1e-4
    assert _max_abs(maps, ref_maps) < 1e-4


def test_newcrfs_pad_variant_swin_stage_parity():
    """Executed parity for the NewCRFs Swin variant
    (``model/NewCRFs/swin_transformer.py:439-620``) at a shape that is a
    multiple of NEITHER the patch size nor the window size: exercises the
    zero patch-pad (``:425-427``), the zero window-pad (``:209``), the
    SW mask computed on the padded grid (``:360-377``), and the odd-dim
    PatchMerging pad (``:277``) — the semantics that differ from the
    ODA2 replicate-pad variant (VERDICT r3 missing #2)."""
    from tests._torch_ref import import_ref_pkg_module
    ref_mod = import_ref_pkg_module("model/NewCRFs", "ref_newcrfs",
                                    "swin_transformer")
    depths, num_heads = (2, 2, 2, 2), (1, 2, 4, 8)
    tm = ref_mod.SwinTransformer(
        pretrain_img_size=224, patch_size=4, embed_dim=16, depths=list(depths),
        num_heads=list(num_heads), window_size=7, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0, use_checkpoint=False)
    tm.eval()

    # 57x90 -> patch zero-pad to 60x92 -> 15x23 tokens (odd both) ->
    # window-pad to 21x28, merging pads to 16x24
    x = _rand((1, 3, 57, 90), seed=11)
    with torch.no_grad():
        ref_outs = tm(torch.from_numpy(x))

    params = convert_swin_backbone(state_dict_numpy(tm), depths=depths,
                                   take_out_norms=True)

    from mde_tpu.models.swin import SwinTransformer
    ours = SwinTransformer(embed_dim=16, depths=depths, num_heads=num_heads,
                           window_size=7, path_drop_prob=0.0,
                           padding_mode="zeros", use_checkpoint=False)
    outs = ours.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    assert len(outs) == len(ref_outs) == 4
    for i, (o, r) in enumerate(zip(outs, ref_outs)):
        r = r.numpy().transpose(0, 2, 3, 1)
        assert o.shape == r.shape, (i, o.shape, r.shape)
        diff = _max_abs(o, r)
        assert diff < 1e-4, f"stage {i}: max abs diff {diff}"


def test_oda_timm_swin_encoder_stage_parity():
    """Executed parity for the ODA timm-style Swin
    (``model/ODA/oda_swin_transformer.py:221-355``) driven like the ODA
    encoder (``model/ODA/encoder.py:75-96``): pre-downsample stage outputs,
    no per-stage norms, and the timm min-window rule collapsing SW-MSA to
    W-MSA at stage 4 (``:56-60``) — fires here (3x6 tokens, window 3)
    exactly as in the production config (12x36, window 12). Non-square
    input so the rectangular SW masks are exercised (VERDICT r3 missing #2).
    """
    ref_mod = import_ref("model.ODA.oda_swin_transformer")
    depths, num_heads = (2, 2, 2, 2), (1, 2, 4, 8)
    tm = ref_mod.SwinTransformer(
        img_size=(96, 192), num_classes=10, patch_size=4, window_size=3,
        embed_dim=16, depths=depths, num_heads=num_heads, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0)
    tm.eval()

    x = _rand((1, 3, 96, 192), seed=12)
    with torch.no_grad():
        # drive the backbone exactly as ODASwinEncoder.forward does
        t = tm.patch_embed(torch.from_numpy(x))
        t = tm.pos_drop(t)
        ref_outs = []
        for layer in tm.layers:
            for block in layer.blocks:
                t = block(t)
            ref_outs.append(t)
            if layer.downsample is not None:
                t = layer.downsample(t)

    state = state_dict_numpy(tm)
    state = {k: v for k, v in state.items()
             if not k.startswith(("norm.", "head."))}
    params = convert_swin_backbone(state, depths=depths, out_indices=())

    from mde_tpu.models.oda.encoder import ODASwinEncoder
    ours = ODASwinEncoder(
        window_size=3, drop_prob=0.0, attn_drop_prob=0.0, path_drop_prob=0.0,
        resize_to_multiple=False,
        encoder_kwargs=dict(embed_dim=16, depths=depths,
                            num_heads=num_heads))
    outs = ours.apply({"params": {"backbone": params}},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    assert len(outs) == len(ref_outs) == 4
    for i, (o, r) in enumerate(zip(outs, ref_outs)):
        h, w = 96 // 4 // 2 ** i, 192 // 4 // 2 ** i
        r = r.numpy().reshape(1, h, w, -1)
        assert o.shape == r.shape, (i, o.shape, r.shape)
        diff = _max_abs(o, r)
        assert diff < 1e-4, f"stage {i}: max abs diff {diff}"
