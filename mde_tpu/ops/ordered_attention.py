"""Ordered depth-bias shifted-window attention — the flagship custom op.

Reference semantics (``model/ODA2/oda2_red_order_swin2_decoder.py:13-132``):
window self-attention over decoder features where the attention logits get a
learned per-head *relative depth* bias, indexed by the pairwise difference of
quantized depth indices inside each window. Both the features AND the index
map are cyclically rolled for the shifted variant. The bias table has
``2*num_emb - 1`` rows; with ``bias_init='linear'`` row ``r`` (centered) is
initialized to ``-|r| * u_h`` with per-head ``u_h ~ U(0.01, 0.04)`` — a signed
monotone prior: the further apart two pixels' current depth estimates are, the
less they attend to each other.

The XLA path below keeps everything batched/static; the bias gather is the
only data-dependent access and lowers to a TPU gather. A fused Pallas kernel
for this op lives in ``mde_tpu/ops/pallas/ordered_attention.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from . import tnn

from .init import trunc_normal_init
from . import remat
from .window import window_partition, window_reverse, cyclic_shift, cyclic_unshift


def depth_embedding_init(num_emb: int, num_heads: int, mode: str = "linear"):
    """Initializer for the (2*num_emb-1, num_heads) relative-depth bias table
    (reference ``oda2_red_order_swin2_decoder.py:49-62``)."""

    def init(key, shape, dtype=jnp.float32):
        assert shape == (2 * num_emb - 1, num_heads)
        if mode == "linear":
            u = jax.random.uniform(key, (num_heads,), jnp.float32, 0.01, 0.04)
            rel = jnp.arange(1, 2 * num_emb, dtype=jnp.float32) - num_emb  # [-(n-1), n-1]
            # rows [0, n-1): rel * u (negative); rows [n-1, 2n-1): -rel * u (negative)
            sign = jnp.where(jnp.arange(2 * num_emb - 1) < num_emb - 1, 1.0, -1.0)
            table = rel[:, None] * sign[:, None] * u[None, :]
            return table.astype(dtype)
        elif mode == "random":
            return jax.random.uniform(key, shape, jnp.float32, -0.05, 0.05).astype(dtype)
        raise ValueError(f"Unsupported bias init {mode}.")

    return init


class PreNormOrderedSwinSA(nn.Module):
    """Pre-norm residual ordered window SA.

    ``x``: (B, H, W, C) features; ``indices``: (B, H, W) int32 quantized depth
    indices in [0, num_emb). Returns the residual output and (optionally) the
    attention weights.
    """

    num_heads: int
    num_emb: int
    window_size: int = 8
    shift_size: int = 0
    attn_drop_prob: float = 0.0
    drop_prob: float = 0.0
    bias_type: str = "depth"
    bias_init: str = "linear"
    dtype: jnp.dtype = jnp.float32
    return_weights: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, indices: jnp.ndarray, train: bool = False):
        from .pallas import resolve_impl, fused_ordered_window_attention

        b, h, w, c = x.shape
        r = self.window_size
        nh = self.num_heads
        hd = c // nh
        assert c % nh == 0
        scale = hd ** -0.5

        identity = x
        if self.shift_size > 0:
            x = cyclic_shift(x, self.shift_size)
            indices = cyclic_shift(indices[..., None], self.shift_size)[..., 0]

        xw = window_partition(x, r)  # (B*nW, r*r, C)
        n = r * r

        if self.bias_type == "depth":
            idx_w = window_partition(indices[..., None].astype(jnp.int32), r)[..., 0]
            table = self.param(
                "depth_embedding",
                depth_embedding_init(self.num_emb, nh, self.bias_init),
                (2 * self.num_emb - 1, nh),
            )
        elif self.bias_type == "none":
            idx_w = table = None
        elif self.bias_type == "pos":
            # the reference also leaves this unimplemented
            # (oda2_red_order_swin2_decoder.py:66-67)
            raise NotImplementedError("bias_type 'pos'")
        else:
            raise ValueError(f"Unsupported bias type {self.bias_type}.")

        xn = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(xw)

        def dense(name):
            return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=trunc_normal_init(0.02), name=name)

        impl = resolve_impl(self.attn_impl)
        use_fused = (impl != "xla" and not self.return_weights
                     and not (train and self.attn_drop_prob > 0))

        if use_fused:
            q = dense("q_proj")(xn)
            k = dense("k_proj")(xn)
            v = dense("v_proj")(xn)
            idx_arg = (idx_w if idx_w is not None
                       else jnp.zeros(q.shape[:2], jnp.int32))
            out = fused_ordered_window_attention(
                q, k, v, idx_arg, table, nh, scale, self.num_emb, impl=impl)
            weights = None
        else:
            q = dense("q_proj")(xn).reshape(-1, n, nh, hd)
            k = dense("k_proj")(xn).reshape(-1, n, nh, hd)
            v = dense("v_proj")(xn).reshape(-1, n, nh, hd)

            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            # reference drops attention logits BEFORE the bias add + softmax
            # (oda2_red_order_swin2_decoder.py:117)
            attn = nn.Dropout(self.attn_drop_prob, deterministic=not train)(attn)
            if table is not None:
                rel = idx_w[:, :, None] - idx_w[:, None, :] + (self.num_emb - 1)
                # heads-leading gather keeps n as the minor dim (a trailing
                # 8-head lane dim pads 16x on TPU)
                de = jnp.take(table.T, rel, axis=1)  # (nh, B*nW, n, n)
                attn = attn + de.transpose(1, 0, 2, 3).astype(attn.dtype)
            attn = nn.softmax(jnp.asarray(attn, jnp.float32), axis=-1)
            weights = attn
            attn = attn.astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, n, c)

        out = dense("o_proj")(out)
        out = nn.Dropout(self.drop_prob, deterministic=not train)(out)

        out = window_reverse(out, r, h, w)
        if self.shift_size > 0:
            out = cyclic_unshift(out, self.shift_size)

        out = out + identity
        out = remat.tag_sa(out)  # saveable under selective remat
        if self.return_weights:
            return out, weights
        return out, None
