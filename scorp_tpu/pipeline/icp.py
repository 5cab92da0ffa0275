"""Point-to-point ICP (TPU-native replacement for the reference's open3d
`registration_icp` calls at /root/reference/align_3dgs_clpe_9dof.py:42-115).

Semantics follow open3d's TransformationEstimationPointToPoint (no scaling):
per iteration, each source point matches its nearest target within
`threshold`; Kabsch on the correspondence set updates the transform;
convergence on relative fitness/RMSE change (1e-6) or max_iteration.
fitness = inliers / len(source), inlier_rmse over matched pairs.

The nearest-neighbor search is an exact [Ns, Nt] distance matrix whose
cross term runs on the MXU; the full multi-init search (the reference's 67
restarts x 400 iterations) runs as one jitted lax.map over initializations
with a while_loop inside — no host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ICPResult(NamedTuple):
    transformation: jnp.ndarray  # [4, 4]
    fitness: jnp.ndarray         # scalar
    inlier_rmse: jnp.ndarray     # scalar


def _nearest(source_t: jnp.ndarray, target: jnp.ndarray):
    """For each transformed source point: (nearest target index, distance)."""
    d2 = (
        jnp.sum(source_t**2, axis=1, keepdims=True)
        - 2.0 * jnp.dot(source_t, target.T, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(target**2, axis=1)[None, :]
    )
    idx = jnp.argmin(d2, axis=1)
    dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0], 0.0))
    return idx, dist


def _masked_kabsch(src, dst, w):
    """Weighted Kabsch: R, t minimizing Σ w ||R src + t - dst||²."""
    wsum = jnp.maximum(w.sum(), 1e-8)
    cs = (w[:, None] * src).sum(0) / wsum
    cd = (w[:, None] * dst).sum(0) / wsum
    H = ((w[:, None] * (src - cs)).T @ (dst - cd))
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) - jnp.array([0.0, 0.0, 2.0]) * (det < 0))
    R = Vt.T @ D @ U.T
    t = cd - R @ cs
    return R, t


@partial(jax.jit, static_argnames=("max_iteration",))
def _icp_single(source, target, threshold, init, max_iteration: int):
    n = source.shape[0]

    def step(carry):
        i, T, fit_prev, rmse_prev, done = carry
        src_t = source @ T[:3, :3].T + T[:3, 3]
        idx, dist = _nearest(src_t, target)
        inlier = (dist < threshold).astype(jnp.float32)
        n_in = inlier.sum()
        fitness = n_in / n
        rmse = jnp.sqrt(jnp.sum(inlier * dist**2) / jnp.maximum(n_in, 1.0))

        dst = target[idx]
        R, t = _masked_kabsch(src_t, dst, inlier)
        T_new = jnp.eye(4)
        T_new = T_new.at[:3, :3].set(R @ T[:3, :3])
        T_new = T_new.at[:3, 3].set(R @ T[:3, 3] + t)

        converged = (
            (jnp.abs(fitness - fit_prev) < 1e-6)
            & (jnp.abs(rmse - rmse_prev) < 1e-6)
        ) | (n_in < 1.0)
        T_out = jnp.where(done, T, T_new)
        return i + 1, T_out, fitness, rmse, done | converged

    def cond(carry):
        i, _, _, _, done = carry
        return (i < max_iteration) & ~done

    _, T, fitness, rmse, _ = jax.lax.while_loop(
        cond, step, (jnp.int32(0), init, jnp.float32(-1.0), jnp.float32(-1.0), False)
    )
    # final evaluation at the converged transform
    src_t = source @ T[:3, :3].T + T[:3, 3]
    _, dist = _nearest(src_t, target)
    inlier = (dist < threshold).astype(jnp.float32)
    n_in = inlier.sum()
    fitness = n_in / n
    rmse = jnp.sqrt(jnp.sum(inlier * dist**2) / jnp.maximum(n_in, 1.0))
    return T, fitness, rmse


def registration_icp(source, target, threshold, init=None, max_iteration: int = 400) -> ICPResult:
    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if init is None:
        init = jnp.eye(4)
    T, fit, rmse = _icp_single(source, target, jnp.float32(threshold),
                               jnp.asarray(init, jnp.float32), max_iteration)
    return ICPResult(T, fit, rmse)


@partial(jax.jit, static_argnames=("max_iteration",))
def _icp_multi(source, target, threshold, inits, max_iteration: int):
    def run(init):
        return _icp_single(source, target, threshold, init, max_iteration)

    return jax.lax.map(run, inits)


def _subsample(points: np.ndarray, max_points: int, seed: int = 0) -> np.ndarray:
    if len(points) <= max_points:
        return points
    step = int(np.ceil(len(points) / max_points))
    return points[::step]


def best_icp_transform(
    pc_original: np.ndarray,
    pc_refined: np.ndarray,
    rotations: np.ndarray,
    threshold: float,
    max_iteration: int = 400,
    max_points: int = 8192,
) -> np.ndarray:
    """Multi-init ICP (refined -> original): the reference's 64 rotation
    inits (centered) + identity-rotation centroid shift x2 + identity
    (align_3dgs_clpe_9dof.py:80-115); returns the highest-fitness 4x4.

    Both clouds are uniformly subsampled for the search (the reference
    downsamples too, :66-73) — the coarse init does not need full density.
    """
    if np.any(~np.isfinite(pc_original)) or np.any(~np.isfinite(pc_refined)):
        raise ValueError("Point clouds contain NaN/Inf values")

    center_o = pc_original.mean(axis=0)
    center_r = pc_refined.mean(axis=0)

    inits = []
    for rot in rotations:
        T = np.eye(4)
        T[:3, :3] = rot
        T[:3, 3] = center_o - rot @ center_r
        inits.append(T)
    shift = np.eye(4)
    shift[:3, 3] = center_o - center_r
    inits.extend([shift, shift.copy(), np.eye(4)])
    inits = np.stack(inits).astype(np.float32)

    src = jnp.asarray(_subsample(pc_refined, max_points), jnp.float32)
    tgt = jnp.asarray(_subsample(pc_original, max_points), jnp.float32)
    print(f"ICP threshold: {threshold}; {len(inits)} inits; "
          f"{src.shape[0]} source / {tgt.shape[0]} target points")
    Ts, fits, rmses = _icp_multi(src, tgt, jnp.float32(threshold),
                                 jnp.asarray(inits), max_iteration)
    best = int(np.argmax(np.asarray(fits)))
    best_T = np.asarray(Ts[best], np.float64)
    print("Best ICP transformation:\n", best_T)
    print("Best fitness:", float(fits[best]))
    return best_T
