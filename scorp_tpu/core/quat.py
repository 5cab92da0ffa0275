"""Quaternion / rotation-matrix math shared by the whole framework.

Conventions follow the reference exactly: quaternions are (w, x, y, z) and
need NOT be pre-normalized (normalization happens inside, matching
`build_rotation` at /root/reference/gs3dgs/utils/general_utils.py:93-114).
`matrix_to_quat` reproduces the numerically-stable branch selection of
/root/reference/utils/geometry.py:74-133 (pytorch3d style).

All functions are pure jnp, differentiable, batched over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) quaternion -> [..., 3, 3] rotation matrix.

    The norm clamp sits INSIDE the sqrt: sqrt's VJP at exactly 0 is inf, so
    an all-zero quaternion (a dead padded row in GaussianState) would turn a
    zero cotangent into NaN (0 * inf) and poison the row's Adam moments —
    the round-4 densify-at-scale NaN. With the clamp inside, max() routes
    the cotangent to the constant branch and the gradient is exactly 0.
    A zero quat maps to the identity rotation. Real quats (norm ~ 1) are
    bit-unaffected.
    """
    norm = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-24))
    q = q / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation matrix -> [..., 4] (w,x,y,z) unit quaternion.

    Numerically-stable variant: builds the four candidate quaternions from
    the diagonal traces and selects the one with the largest denominator.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared magnitudes of the four quaternion components (up to sign).
    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs2, 0.0))

    # Candidate quaternions, each valid when its pivot component dominates.
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)

    denom = 2.0 * jnp.maximum(q_abs, 0.1)  # floor avoids div-by-0 in dead branches
    candidates = candidates / denom[..., :, None]

    best = jnp.argmax(q_abs2, axis=-1)
    quat = jnp.take_along_axis(candidates, best[..., None, None].astype(jnp.int32), axis=-2)
    quat = quat[..., 0, :]
    return quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b of (w,x,y,z) quaternions, batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s): [...,3] scales + [...,4] quats -> [...,3,3]."""
    return quat_to_rotmat(q) * s[..., None, :]


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray, scaling_modifier: float, q: jnp.ndarray
) -> jnp.ndarray:
    """Upper-triangular [..., 6] 3D covariance (xx, xy, xz, yy, yz, zz).

    Matches the reference's `build_covariance_from_scaling_rotation`
    (/root/reference/gs3dgs/scene/gaussian_model.py:30-35): Σ = L Lᵀ with
    L = R diag(s·mod).
    """
    L = build_scaling_rotation(scaling * scaling_modifier, q)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )
