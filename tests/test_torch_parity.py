"""Numerical parity against torch (CPU) for the semantics-critical ops.

The reference stack is torch 1.10; these tests pin the exact places where
jax/flax defaults silently diverge from torch (SURVEY.md §7.3 item 1):
align_corners resizes, nearest rounding, adaptive average pooling, exact-erf
GELU and LayerNorm epsilon.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.ops.resize import (
    resize_bilinear, resize_nearest, adaptive_avg_pool2d, upsample2d)
from mde_tpu.ops import tnn


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw,align", [
    ((24, 40), (48, 80), True),
    ((24, 40), (48, 80), False),
    ((35, 57), (13, 29), True),   # downscale, odd sizes
    ((35, 57), (13, 29), False),
    ((352, 704), (448, 896), True),   # flagship resize
    ((7, 7), (224, 224), True),
])
def test_bilinear_matches_torch(in_hw, out_hw, align):
    x = _rand((2, *in_hw, 3))
    ours = resize_bilinear(jnp.asarray(x), out_hw, align_corners=align)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=align).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((24, 40), (48, 80)),
    ((33, 19), (11, 7)),
])
def test_nearest_matches_torch(in_hw, out_hw):
    x = _rand((1, *in_hw, 2), seed=1)
    ours = resize_nearest(jnp.asarray(x), out_hw)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=0, atol=0)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((56, 56), (1, 1)),
    ((17, 29), (3, 6)),   # non-divisible regions
    ((14, 28), (2, 3)),
])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    x = _rand((2, *in_hw, 4), seed=2)
    ours = adaptive_avg_pool2d(jnp.asarray(x), out_hw)
    ref = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), out_hw
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_upsample2d_matches_torch_module():
    x = _rand((1, 13, 17, 5), seed=3)
    ours = upsample2d(jnp.asarray(x), 2)
    ref = torch.nn.UpsamplingBilinear2d(scale_factor=2)(
        torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_gelu_is_exact_erf():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = np.asarray(tnn.gelu(jnp.asarray(x)))
    ref = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
    # and differs measurably from the tanh approximation flax defaults to
    import flax.linen as nn
    approx = np.asarray(nn.gelu(jnp.asarray(x)))
    assert np.max(np.abs(approx - ref)) > 1e-4


def test_gelu_bf16_fast_path_within_bf16_accuracy():
    """In bfloat16 tnn.gelu uses the tanh approximation (the erf polynomial
    is VPU-bound: measured 8.4x slower at flagship FF shapes — see
    tnn.gelu's docstring). The switch must be invisible at bf16 precision:
    |tanh_bf16 - erf_f32| stays within the bf16 rounding envelope of
    |erf_bf16 - erf_f32| itself, and MDE_EXACT_GELU=1 restores erf."""
    import torch

    x = np.linspace(-6, 6, 401, dtype=np.float32)
    ref = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    fast = np.asarray(tnn.gelu(jnp.asarray(x, jnp.bfloat16)), np.float32)
    exact_bf16 = np.asarray(
        tnn._exact_gelu(jnp.asarray(x, jnp.bfloat16)), np.float32)
    err_fast = np.abs(fast - ref).max()
    err_exact = np.abs(exact_bf16 - ref).max()
    # one bf16 ulp of headroom over the unavoidable bf16-erf error
    assert err_fast <= err_exact + 0.033, (err_fast, err_exact)

    import os
    os.environ["MDE_EXACT_GELU"] = "1"
    try:
        forced = np.asarray(tnn.gelu(jnp.asarray(x, jnp.bfloat16)),
                            np.float32)
        np.testing.assert_array_equal(forced, exact_bf16)
    finally:
        del os.environ["MDE_EXACT_GELU"]


def test_layernorm_eps_matches_torch():
    x = _rand((4, 32), seed=4) * 1e-3  # small variance makes eps visible
    ln = tnn.LayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(ln.apply(params, jnp.asarray(x)))
    ref = torch.nn.LayerNorm(32)(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
