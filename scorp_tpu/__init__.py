"""scorp_tpu — TPU-native Gaussian-Splatting scene-refinement framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
SCORP reference pipeline (Scene-Consistent Object Refinement via Proxy
Generation and Tuning): 3DGS/2DGS reconstruction, differentiable tile
rasterization, 3D mask lifting, view selection, 9-DoF proxy alignment and
registration-constrained appearance refinement.

Layout:
  core/      pure math + I/O: SH, quaternions, camera conventions, PLY codec,
             COLMAP parsing, config system
  ops/       compute ops: differentiable rasterizers (Pallas + XLA reference),
             KNN, image losses
  scene/     host-side scene state: cameras with lazy GT loading, dataset
             readers, Scene container
  train/     jitted training: fixed-capacity Gaussian store, sparse Adam,
             densification, train step
  pipeline/  SCORP algorithms: pose solvers, mask voting, view scoring,
             rigid GS transforms, geometry helpers
  parallel/  jax.sharding Mesh helpers: camera-parallel rendering,
             Gaussian-sharded training
  apps/      CLI stages mirroring the reference scripts 1:1
"""

__version__ = "0.1.0"

import jax as _jax

# TPU's DEFAULT dot/conv precision is bf16 (measured 7.7e-2 max error on a
# [4096,3]x[3,3] product vs 1.1e-6 at HIGHEST). The reference is f32 CUDA
# torch, and several pipeline stages are cancellation-sensitive (SSIM
# variances, Umeyama covariances, camera projections), so f32-exact matmuls
# are the package-wide default. Every dot that WANTS bf16 for speed (the
# Pallas scan contractions, the one-hot expansion gather) casts its
# operands to bf16 or passes `precision=` explicitly and is unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")
