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
