"""Smoke + semantics tests for the flagship ODA2 ordered-swin2 model (tiny
dims — analog of the reference's __main__ shape asserts, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mde_tpu.models.oda2.red_order_swin2 import (
    ODA2OrderedSwin2RegModel, _resize_policy,
)
from mde_tpu.ops.ordered_attention import depth_embedding_init

TINY_ENC = dict(embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                window_size=4)


def tiny_model(**over):
    kwargs = dict(
        dec_dim=32, min_depth=0.001, max_depth=80.0, num_heads=4,
        num_repeats=2, num_emb=16, window_size=4, encoder_type="custom",
        neck_type="red33", use_checkpoint=False, resize_to_multiple=False,
        encoder_kwargs=TINY_ENC)
    kwargs.update(over)
    return ODA2OrderedSwin2RegModel(**kwargs)


@pytest.fixture(scope="module")
def tiny_forward():
    m = tiny_model()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, outs, aw = jax.jit(lambda v, xx: m.apply(v, xx))(vs, x)
    return m, x, vs, out, outs


def test_output_shapes_and_range(tiny_forward):
    m, x, vs, out, outs = tiny_forward
    # output at 1/4 input scale with a single channel
    assert out.shape == (2, 16, 24, 1)
    # num_repeats + 1 supervised maps (reference head returns all)
    assert len(outs) == m.num_repeats + 1
    for o in outs:
        assert o.shape == out.shape
        assert float(o.min()) >= 0.0 and float(o.max()) <= m.max_depth


def test_last_out_is_inference_output(tiny_forward):
    _, _, _, out, outs = tiny_forward
    np.testing.assert_array_equal(np.asarray(out), np.asarray(outs[-1]))


def test_resize_policy_reference_mappings():
    # reference oda2_red_order_swin2.py:64-88
    assert _resize_policy(352, 704, 80.0) == (448, 896)
    assert _resize_policy(352, 1216, 80.0) == (448, 1536)
    assert _resize_policy(480, 640, 10.0) == (448, 672)
    assert _resize_policy(448, 608, 10.0) == (448, 672)


def test_depth_embedding_linear_init():
    """bias_init='linear': row r (centered) = -|r| * u_h, u_h in [0.01, 0.04]
    (reference oda2_red_order_swin2_decoder.py:50-58)."""
    n, nh = 16, 4
    table = depth_embedding_init(n, nh, "linear")(jax.random.PRNGKey(0),
                                                  (2 * n - 1, nh))
    table = np.asarray(table)
    # center row (rel diff = 0) is exactly zero
    np.testing.assert_allclose(table[n - 1], 0.0)
    # symmetric: bias(-d) == bias(+d), monotone decreasing with |d|, negative
    np.testing.assert_allclose(table[0], table[-1], rtol=1e-6)
    assert (table[0] < table[n - 2]).all()
    assert (table[:n - 1] <= 0).all() and (table[n:] <= 0).all()
    u = -table[-1] / (n - 1)
    assert ((u >= 0.01) & (u <= 0.04)).all()


def test_train_mode_runs_and_updates_batch_stats():
    m = tiny_model()
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()

    @jax.jit
    def step(v, xx):
        (out, outs, _), updates = m.apply(
            v, xx, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return out, updates

    out, updates = step(vs, x)
    assert "batch_stats" in updates
    # running means actually moved away from init zeros somewhere
    leaves = jax.tree.leaves(updates["batch_stats"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.heavy
@pytest.mark.parametrize("neck", ["red", "fpn", "segformer", "red33r", "red33res"])
def test_all_neck_types(neck):
    m = tiny_model(neck_type=neck, num_repeats=1)
    x = jnp.ones((1, 32, 32, 3))
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, outs, _ = jax.jit(lambda v, xx: m.apply(v, xx))(vs, x)
    assert out.shape == (1, 8, 8, 1)


@pytest.mark.heavy
def test_output_scale_2():
    m = tiny_model(output_scale=2, num_repeats=1)
    x = jnp.ones((1, 32, 32, 3))
    vs = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x))()
    out, outs, _ = jax.jit(lambda v, xx: m.apply(v, xx))(vs, x)
    assert out.shape == (1, 16, 16, 1)


def test_scan_repeats_matches_unrolled():
    """nn.scan'ed head repeats are numerically identical to the unrolled
    loop given the same params (restacked along the repeat axis)."""
    from mde_tpu.models.oda2.red_order_swin2 import OrderedSwinRegHead

    R = 3
    kwargs = dict(num_heads=2, num_repeats=R, num_emb=16, window_size=4,
                  output_scale=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)

    mod_u = OrderedSwinRegHead(scan_repeats=False, **kwargs)
    vs_u = mod_u.init(jax.random.PRNGKey(1), x)
    outs_u, _ = mod_u.apply(vs_u, x)

    def restack(col):
        names = [f"conv{i}_" for i in range(R)] + [f"attn{i}" for i in range(R)]
        rep = [{"conv_0": col[f"conv{i}_0"], "conv_1": col[f"conv{i}_1"],
                **({"conv_out": col[f"conv{i}_out"]}
                   if f"conv{i}_out" in col else {}),
                **({"attn": col[f"attn{i}"]} if f"attn{i}" in col else {})}
               for i in range(R)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rep)
        rest = {k: v for k, v in col.items()
                if not any(k.startswith(p) for p in names)}
        return {"repeat": stacked, **rest}

    vs_s = {"params": restack(vs_u["params"]),
            "batch_stats": restack(vs_u["batch_stats"])}
    mod_s = OrderedSwinRegHead(scan_repeats=True, **kwargs)
    # layouts line up with a fresh scan init
    want = jax.tree.map(lambda a: a.shape, mod_s.init(jax.random.PRNGKey(2), x))
    got = jax.tree.map(lambda a: a.shape, vs_s)
    assert want == got
    outs_s, _ = mod_s.apply(vs_s, x)
    assert len(outs_s) == len(outs_u) == R + 1
    for a, b in zip(outs_u, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # train mode (BN batch stats under scan + dropout rng splitting) runs
    (outs_t, _), updates = mod_s.apply(
        vs_s, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)})
    assert "repeat" in updates["batch_stats"]
    assert len(outs_t) == R + 1


def test_migrate_head_layout_roundtrip():
    """core.checkpoint.migrate_head_layout converts checkpoints between the
    unrolled (attn{i}/conv{i}_*) and nn.scan (repeat/) head layouts in both
    directions, preserving numerics (the resume path across a
    ``model.scan_repeats`` flip — ADVICE r3)."""
    from mde_tpu.core.checkpoint import migrate_head_layout
    from mde_tpu.models.oda2.red_order_swin2 import OrderedSwinRegHead

    R = 2
    kwargs = dict(num_heads=2, num_repeats=R, num_emb=16, window_size=4,
                  output_scale=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 32), jnp.float32)

    mod_u = OrderedSwinRegHead(scan_repeats=False, **kwargs)
    vs_u = mod_u.init(jax.random.PRNGKey(1), x)
    outs_u, _ = mod_u.apply(vs_u, x)

    # unrolled -> scan: tree matches a fresh scan init, numerics preserved
    vs_s = migrate_head_layout(vs_u, to_scan=True)
    mod_s = OrderedSwinRegHead(scan_repeats=True, **kwargs)
    want = jax.tree.map(lambda a: a.shape, mod_s.init(jax.random.PRNGKey(2), x))
    got = jax.tree.map(lambda a: np.asarray(a).shape, vs_s)
    assert want == got
    outs_s, _ = mod_s.apply(vs_s, x)
    for a, b in zip(outs_u, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # idempotent in the target layout
    again = migrate_head_layout(vs_s, to_scan=True)
    assert jax.tree.map(lambda a: np.asarray(a).shape, again) == got

    # scan -> unrolled roundtrip restores the exact original tree
    back = migrate_head_layout(vs_s, to_scan=False)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), back, vs_u)


def test_selective_remat_grad_parity():
    """Selective remat (save tagged sa_out, recompute the rest) gives the
    same gradients as no remat (ops/remat.py policy)."""
    from mde_tpu.models.oda2.red_order_swin2 import OrderedSwinRegHead

    kwargs = dict(num_heads=2, num_repeats=2, num_emb=16, window_size=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    m_remat = OrderedSwinRegHead(use_checkpoint=True, **kwargs)
    vs = m_remat.init(jax.random.PRNGKey(1), x)
    m_plain = OrderedSwinRegHead(use_checkpoint=False, **kwargs)

    def loss(m):
        def f(p):
            outs, _ = m.apply({"params": p,
                               "batch_stats": vs["batch_stats"]}, x)
            return sum(jnp.sum(o ** 2) for o in outs)
        return f

    g1 = jax.grad(loss(m_remat))(vs["params"])
    g2 = jax.grad(loss(m_plain))(vs["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
