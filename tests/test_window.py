import numpy as np
import jax.numpy as jnp

from mde_tpu.ops.window import (
    window_partition, window_reverse, shifted_window_attn_mask,
    cyclic_shift, cyclic_unshift,
)


def test_partition_reverse_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 24, 5).astype(np.float32)
    w = window_partition(jnp.asarray(x), 8)
    assert w.shape == (2 * 2 * 3, 64, 5)
    back = window_reverse(w, 8, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_partition_layout_matches_reference_ordering():
    """Window ordering must be row-major over (nH, nW) with row-major pixels
    inside each window (reference SwinWindowing, oda2_swin_transformer.py:53-68)."""
    h, w, r = 4, 8, 2
    x = np.arange(h * w).reshape(1, h, w, 1).astype(np.float32)
    wins = np.asarray(window_partition(jnp.asarray(x), r))[..., 0]
    # first window = rows 0-1, cols 0-1
    np.testing.assert_array_equal(wins[0], [0, 1, 8, 9])
    # second window = rows 0-1, cols 2-3
    np.testing.assert_array_equal(wins[1], [2, 3, 10, 11])
    # first window of second row of windows
    np.testing.assert_array_equal(wins[4], [16, 17, 24, 25])


def test_shift_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    y = cyclic_unshift(cyclic_shift(x, 3), 3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_shifted_mask_structure():
    h, w, r, s = 16, 16, 8, 4
    mask = shifted_window_attn_mask(h, w, r, s)
    assert mask.shape == ((h // r) * (w // r), r * r, r * r)
    # mask values are only 0 or -100
    assert set(np.unique(mask)).issubset({0.0, -100.0})
    # window (0,0) sees no region boundary -> all zeros
    np.testing.assert_array_equal(mask[0], np.zeros((r * r, r * r)))
    # last window (wrapped corners) must mask cross-region pairs
    assert (mask[-1] == -100.0).any()
    # mask is symmetric in the (-100 vs 0) pattern
    np.testing.assert_array_equal(mask[-1], mask[-1].transpose())


def test_mask_region_counts():
    """Each token pair is masked iff their region labels differ — verify via
    an independent label construction."""
    h = w = 8
    r, s = 4, 2
    mask = shifted_window_attn_mask(h, w, r, s)
    labels = np.zeros((h, w), dtype=int)
    # independent: label = (band_h * 3 + band_w) where band is 0 for [0, h-r),
    # 1 for [h-r, h-s), 2 for [h-s, h)
    def band(i, size):
        if i < size - r:
            return 0
        if i < size - s:
            return 1
        return 2
    for i in range(h):
        for j in range(w):
            labels[i, j] = band(i, h) * 3 + band(j, w)
    lab_w = labels.reshape(h // r, r, w // r, r).transpose(0, 2, 1, 3).reshape(-1, r * r)
    want = np.where(lab_w[:, :, None] != lab_w[:, None, :], -100.0, 0.0)
    np.testing.assert_array_equal(mask, want)
