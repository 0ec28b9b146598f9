"""depthinspace_tpu — a TPU-native (JAX/XLA/Pallas) framework for
self-supervised disparity/depth estimation from active structured-light video.

Provides the same capabilities as the reference PyTorch codebase
idiap/DepthInSpace (DIS-SF / DIS-MF / DIS-FTSF training, evaluation, synthetic
data generation, flow/disparity presaving) re-designed TPU-first:

- NHWC tensor layout, static shapes, everything on the training hot path is a
  single jitted XLA program (LCN preprocessing, forward, all losses, backward,
  optimizer update fused together).
- The census photometric loss (the reference's only custom CUDA op on the hot
  path, reference model/ext_functions.py:115-154) is a Pallas TPU kernel with
  a custom VJP, validated against a jnp oracle.
- Data parallelism over a `jax.sharding.Mesh` with gradient psum — the
  reference is single-GPU (reference model/worker.py:131); the distributed
  story here is designed for ICI/DCN scaling from the start.
"""

__version__ = "0.1.0"
