"""Device-mesh helpers for multi-chip scale-out.

The reference is single-GPU with no distributed runtime (SURVEY.md §2.2);
the TPU-native scale-out axis is a `jax.sharding.Mesh`:
  * camera-parallel rendering/eval — per-camera outputs are independent, so
    a batch of cameras shards over the `data` axis with no collectives;
  * camera-batch data-parallel training — replicated Gaussian state, batch
    of cameras sharded over `data`, XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) dimension of every leaf over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)
