"""mde_tpu — a TPU-native monocular depth estimation framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
pitlover/Monocular-Depth-Estimation (supervised monocular depth estimation on
NYU Depth v2 / KITTI with AdaBins, NewCRFs, Depthformer, ODA and ODA2 model
families), built TPU-first:

* NHWC layouts, static shapes, bf16 compute / f32 params,
* shifted-window & ordered depth-bias attention as fused kernels,
* data parallelism via ``jax.sharding.Mesh`` + jit sharding annotations
  (XLA collectives over ICI replace torch.distributed/NCCL),
* a reconstructed training driver (the reference's ``run.py`` is absent from
  its snapshot) compatible with the reference's JSON config corpus.
"""

__version__ = "0.1.0"
