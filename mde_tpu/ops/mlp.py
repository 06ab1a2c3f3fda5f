"""Feed-forward blocks shared across model families (NHWC / token layouts)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from . import tnn

from .init import trunc_normal_init
from .depthwise import DepthwiseConv2d


def _tp_shard_channels(x: jnp.ndarray, axis: Optional[str]) -> jnp.ndarray:
    """Constrain the channel dim of an NHWC activation to a tensor-parallel
    mesh axis — a no-op when no mesh with that axis is active (so modules
    with ``tp_axis`` set still init/apply outside a mesh context, e.g. the
    jitted ``model.init``).

    Mesh detection covers BOTH context styles (ADVICE r4 medium #1 — the
    abstract-mesh probe alone is empty under the ``with mesh:`` contexts this
    repo uses, silently no-oping the constraint):
    * ``jax.set_mesh``/``use_mesh`` — visible via ``get_abstract_mesh()``;
    * plain ``with mesh:`` — visible via the thread resource env's physical
      mesh (that context is also what makes ``with_sharding_constraint``
      accept a bare ``PartitionSpec``).
    """
    if not axis:
        return x
    from jax.sharding import PartitionSpec as P

    def _has_axis(m) -> bool:
        return (m is not None and not getattr(m, "empty", False)
                and axis in getattr(m, "axis_names", ()))

    active = False
    try:
        active = _has_axis(jax.sharding.get_abstract_mesh())
    except Exception:
        pass
    if not active:
        try:
            from jax._src import mesh as _mesh_lib
            active = _has_axis(_mesh_lib.thread_resources.env.physical_mesh)
        except Exception:
            pass
    if not active:
        return x
    return jax.lax.with_sharding_constraint(
        x, P(*([None] * (x.ndim - 1)), axis))


def _dense(features: int, dtype, name: str, use_bias: bool = True):
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=trunc_normal_init(0.02),
        bias_init=nn.initializers.zeros,
        name=name,
    )


class SwinMLP(nn.Module):
    """fc1 -> GELU -> drop -> fc2 -> drop (reference ``SwinMLP``,
    ``oda2_swin_transformer.py:18-38``)."""

    hidden_features: int
    drop_prob: float = 0.0
    act: Callable = tnn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        x = _dense(self.hidden_features, self.dtype, "fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        x = _dense(in_features, self.dtype, "fc2")(x)
        x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        return x


class PreNormFF(nn.Module):
    """Pre-norm residual FF (reference ``PreNormFF``,
    ``oda2_red_order_reg_decoder.py:11-40``)."""

    feedforward_dims: Optional[int] = None
    drop_prob: float = 0.0
    act: Callable = tnn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_dims = x.shape[-1]
        hidden = self.feedforward_dims or 4 * in_dims
        identity = x
        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        x = _dense(hidden, self.dtype, "lin1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        x = _dense(in_dims, self.dtype, "lin2")(x)
        x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        return x + identity


class PreNormDWConvFF(nn.Module):
    """Pre-norm GLU + depthwise-conv feed-forward
    (reference ``PreNormDWConvFF``, ``oda2_red_order_reg_decoder.py:43-93``).

    Token MLP with a 5x5 depthwise conv (replicate pad) + BN + GELU between the
    GLU gate and the down-projection. Operates on (B, H, W, C) so the
    depthwise conv needs no layout shuffling on TPU.

    ``ff_impl='pallas'`` opts in to the fused Pallas pass
    (``ops/pallas/glu_ff.py``): gate + conv + BN(folded affine) + GELU in one
    HBM read/write, valid whenever BN normalizes with running stats (eval
    mode or an active ``freeze_bn`` scope; BN-training mode always keeps the
    unfused path — batch stats need the materialized conv output). NOT the
    default: measured end-to-end on v5e the halo-kernel tap loop loses to
    XLA's native grouped-conv pipeline (flagship batch-8 inference 17.8 vs
    26.7 img/s) — the kernel is kept for parity coverage and future Mosaic
    tuning (see glu_ff.py header).
    """

    feedforward_dims: Optional[int] = None
    kernel_size: int = 5
    drop_prob: float = 0.0
    act: Callable = tnn.gelu
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    ff_impl: str = "auto"
    # Optional tensor-parallel axis (e.g. parallel.mesh.MODEL_AXIS): the GLU
    # output, depthwise conv, BN and GELU — the FF's dominant activations and
    # VPU compute — shard over this mesh axis by channel (depthwise conv and
    # BN are exactly channel-parallel); lin3 then contracts over the sharded
    # hidden dim and GSPMD inserts the psum over ICI. None (default) = no
    # constraint, identical single-axis behavior.
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from .pallas.glu_ff import fused_glu_dwconv_bn_gelu

        in_dims = x.shape[-1]
        hidden = self.feedforward_dims or 4 * in_dims
        identity = x

        x = tnn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        x = _dense(hidden * 2, self.dtype, "lin1")(x)

        conv = DepthwiseConv2d(
            kernel_size=self.kernel_size, padding_mode="edge",
            dtype=self.dtype, name="conv2",
        )
        use_running_average = tnn.bn_use_running_average(self, train)
        bn = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=1.0 - self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
            name="bn2",
        )

        # explicit opt-in only ('auto' stays unfused — see class docstring);
        # the GELU identity check guards the fused epilogue's hardcoded erf
        impl = self.ff_impl
        fused_ok = (use_running_average
                    and impl in ("pallas", "pallas_interpret")
                    and self.act is tnn.gelu)
        if fused_ok:
            # bind conv/bn variables without running them (the dummy result
            # is unused -> dead-code-eliminated under jit); then fold BN into
            # an affine and run the fused gate+conv+BN+GELU kernel
            _ = bn(conv(jnp.zeros((1, 1, 1, hidden), self.dtype)))
            w = conv.variables["params"]["kernel"].astype(self.dtype)
            bn_p = bn.variables["params"]
            bn_s = bn.variables["batch_stats"]
            s = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + self.bn_eps)
            t = bn_p["bias"] - bn_s["mean"] * s
            x = fused_glu_dwconv_bn_gelu(x, w, s, t, impl=impl)
        else:
            # GLU over the channel dim: first half * sigmoid(second half)
            a, b = jnp.split(x, 2, axis=-1)
            x = a * nn.sigmoid(b)
            x = _tp_shard_channels(x, self.tp_axis)
            from .remat import tag_conv, tag_glu
            x = bn(tag_conv(conv(tag_glu(x))))
            x = self.act(x)
            x = _tp_shard_channels(x, self.tp_axis)

        x = _dense(in_dims, self.dtype, "lin3")(x)
        x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        return x + identity
