"""Quaternion/matrix conversions (API parity with /root/reference/utils/
geometry.py; implementations live in core/quat.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.quat import quat_to_rotmat, rotmat_to_quat


def quaternion_to_matrix_np(q: np.ndarray) -> np.ndarray:
    return np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))


def matrix_to_quaternion_np(m: np.ndarray) -> np.ndarray:
    return np.asarray(rotmat_to_quat(jnp.asarray(m, jnp.float32)))


# jnp-native aliases (the reference's *_tensor variants)
quaternion_to_matrix = quat_to_rotmat
matrix_to_quaternion = rotmat_to_quat
