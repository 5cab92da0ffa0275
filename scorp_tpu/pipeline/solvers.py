"""Pose/scale solvers for 9-DoF proxy alignment.

Behavioral equivalents of /root/reference/utils/solution.py, redesigned for
TPU where it matters:

  * Kabsch / Umeyama / generalized (per-axis-scale) Umeyama / polar 12-DoF —
    closed-form SVD solvers (numpy; tiny problems, not on the hot path).
  * RANSAC (solution.py:476-557) — instead of a 2000-iteration Python loop,
    all hypotheses are drawn at once and solved as a *batched* 3-point
    Umeyama (vmapped SVD on [M,3,3]), residuals for all N points evaluated
    as one [M,N] matrix on the MXU, best hypothesis refit on its inliers.
  * Adam solvers (solution.py:193-446) — jitted lax.fori_loop with a manual
    torch-parity Adam; 9-DoF = quaternion + orthogonal-frame quaternion +
    sigmoid-bounded per-axis scale in [scale_min, scale_max], with the
    reference's scale/rotation regularizers.
"""

from __future__ import annotations

from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quat import quat_to_rotmat, rotmat_to_quat


# ---------------------------------------------------------------- closed form
def kabsch_np(P: np.ndarray, Q: np.ndarray):
    """Optimal R, t minimizing ||R P + t - Q||; returns (R, t, 1.0)."""
    if P.size == 0 or Q.size == 0:
        raise ValueError("Empty matrices sent to kabsch")
    cp, cq = P.mean(axis=0), Q.mean(axis=0)
    H = (P - cp).T @ (Q - cq)
    U, _, VT = np.linalg.svd(H)
    R = (U @ VT).T
    if np.linalg.det(R) < 0:
        VT[2, :] *= -1
        R = (U @ VT).T
    return R, cq - R @ cp, 1.0


def umeyama_np(source: np.ndarray, target: np.ndarray):
    """Similarity transform (R, t, scalar s)."""
    if len(source) != len(target):
        raise ValueError("Source and target points must have the same length")
    cs, ct = source.mean(axis=0), target.mean(axis=0)
    src, tgt = source - cs, target - ct
    cov = src.T @ tgt
    U, S, Vt = np.linalg.svd(cov)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[-1, -1] = -1
    R = Vt.T @ D @ U.T
    s = np.sum(S * np.diag(D)) / np.sum(src**2)
    t = ct - s * (R @ cs)
    return R, t, s


def umeyama_generalized_np(source: np.ndarray, target: np.ndarray):
    """Per-axis scale variant: returns (R, t, scale[3])."""
    cs, ct = source.mean(axis=0), target.mean(axis=0)
    B = source - cs
    A = target - ct
    K = (A.T @ B) @ np.linalg.inv(B.T @ B)
    U, _, Vh = np.linalg.svd(K)
    D = np.eye(3)
    if np.linalg.det(U @ Vh) < 0:
        D[-1, -1] = -1
    R = U @ D @ Vh
    scale = np.array([
        np.trace(A @ R @ np.diag(e) @ B.T) / np.trace(B @ np.diag(e) @ B.T)
        for e in np.eye(3)
    ])
    t = ct - R @ (scale * cs)
    return R, t, scale


def polar_12dof_np(source: np.ndarray, target: np.ndarray):
    """Polar decomposition A ≈ R·R'ᵀ·S·R'·B: returns (R, t, S diag-matrix, R')."""
    cs, ct = source.mean(axis=0), target.mean(axis=0)
    B = source - cs
    A = target - ct
    H = A.T @ B @ np.linalg.pinv(B.T @ B)
    M = H.T @ H
    w, V = np.linalg.eigh(M)
    w = np.clip(w, 0.0, None)
    sqrt_M = V @ np.diag(np.sqrt(w)) @ V.T

    R = H @ np.linalg.inv(sqrt_M)
    Ur, _, Vr = np.linalg.svd(R)
    R = Ur @ Vr
    if np.linalg.det(R) < 0:
        Ur[:, -1] *= -1
        R = Ur @ Vr

    wu, Vu = np.linalg.eigh(sqrt_M)
    wu = np.clip(wu, 1e-9, None)
    R_prime = Vu.T
    if np.linalg.det(R_prime) < 0:
        Vu[:, -1] *= -1
        R_prime = Vu.T
    S = np.diag(wu)
    t = ct - R @ R_prime.T @ S @ R_prime @ cs
    return R, t, S, R_prime


def compute_residuals(source, target, R, t, s=1.0):
    transformed = (R @ (s * source).T).T + t
    return np.linalg.norm(transformed - target, axis=1)


# ---------------------------------------------------------------------- RANSAC
@partial(jax.jit, static_argnames=("max_iterations",))
def _ransac_hypotheses(source, target, seed, max_iterations: int):
    """Batched 3-point Umeyama hypotheses + inlier residuals.

    Returns (residuals [M, N], R [M,3,3], t [M,3], s [M])."""
    n = source.shape[0]
    key = jax.random.PRNGKey(seed)
    # 3 distinct indices per hypothesis (distinctness via top-3 of random keys)
    scores = jax.random.uniform(key, (max_iterations, n))
    _, idx = jax.lax.top_k(scores, 3)                      # [M, 3]
    sp = source[idx]                                       # [M, 3, 3]
    tp = target[idx]

    cs = sp.mean(axis=1, keepdims=True)
    ct = tp.mean(axis=1, keepdims=True)
    src = sp - cs
    tgt = tp - ct
    cov = jnp.einsum("mni,mnj->mij", src, tgt)
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("mij,mjk->mik", U, Vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1)
    R = jnp.einsum("mji,mj,mjk->mik", Vt, d, jnp.swapaxes(U, 1, 2))  # V D Uᵀ
    denom = jnp.maximum(jnp.sum(src**2, axis=(1, 2)), 1e-12)
    s = jnp.sum(S * d, axis=1) / denom
    t = ct[:, 0] - s[:, None] * jnp.einsum("mij,mj->mi", R, cs[:, 0])

    # residuals of all N points for all M hypotheses
    transformed = s[:, None, None] * jnp.einsum("mij,nj->mni", R, source) + t[:, None, :]
    residuals = jnp.linalg.norm(transformed - target[None], axis=-1)
    return residuals, R, t, s


def pc_align_ransac(
    source_points: np.ndarray,
    target_points: np.ndarray,
    threshold: float = 0.5,
    max_iterations: int = 2000,
    min_inlier_ratio: float = -1.0,
    method: Literal["umeyama", "kabsch", "umeyama_gen"] = "umeyama",
    seed: int = 0,
):
    """Vectorized RANSAC; final refit on the best hypothesis's inliers."""
    if len(source_points) != len(target_points):
        raise ValueError("Source and target points must have the same length")
    if len(source_points) < 3:
        raise ValueError("At least 3 points are required to solve Umeyama.")
    del min_inlier_ratio  # early exit is pointless when all hypotheses batch

    src = jnp.asarray(source_points, jnp.float32)
    tgt = jnp.asarray(target_points, jnp.float32)
    residuals, _, _, _ = _ransac_hypotheses(src, tgt, seed, max_iterations)
    inliers = np.asarray(residuals) < threshold            # [M, N]
    counts = inliers.sum(axis=1)
    best = int(np.argmax(counts))
    best_mask = inliers[best]
    if counts[best] < 3:
        raise ValueError("No inliers found in RANSAC.")

    solve = {
        "umeyama": umeyama_np,
        "kabsch": kabsch_np,
        "umeyama_gen": umeyama_generalized_np,
    }[method]
    best_R, best_t, best_s = solve(
        np.asarray(source_points)[best_mask], np.asarray(target_points)[best_mask]
    )
    print(f"RANSAC finished with {int(counts[best])} inliers.")
    return best_R, best_t, best_s


# ------------------------------------------------------------------- Adam 9dof
def _adam_init(params):
    return {
        "m": jax.tree_util.tree_map(jnp.zeros_like, params),
        "v": jax.tree_util.tree_map(jnp.zeros_like, params),
    }


def _adam_step(params, grads, state, step, lr, b1=0.9, b2=0.999, eps=1e-8):
    new_m = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state["m"], grads)
    new_v = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state["v"], grads)
    bc1 = 1 - b1**step
    bc2 = 1 - b2**step
    new_p = jax.tree_util.tree_map(
        lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params, new_m, new_v,
    )
    return new_p, {"m": new_m, "v": new_v}


@partial(jax.jit, static_argnames=("iterations",))
def _adam_3d3d_9dof_jit(
    source, target, init_scale_param, iterations: int,
    lr, lambda_reg_scale, lambda_reg_rot, scale_min, scale_max,
):
    params = {
        "t": jnp.array([0.01, 0.01, 0.01], jnp.float32),
        "q": jnp.array([0.9, 0.01, 0.01, 0.01], jnp.float32),
        "q_orth": jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        "s": init_scale_param,
    }

    def loss_fn(p):
        scale = scale_min + (scale_max - scale_min) * jax.nn.sigmoid(p["s"])
        R = quat_to_rotmat(p["q"])
        R2 = quat_to_rotmat(p["q_orth"])
        pred = (R @ R2.T @ (scale[:, None] * (R2 @ source.T))).T + p["t"]
        loss_opt = jnp.mean((pred - target) ** 2)
        reg_scale_mean = jnp.mean((scale - scale.mean()) ** 2)
        reg_scale = jnp.mean((p["s"] - 1.0) ** 2)
        reg_rot = jnp.arccos(jnp.clip((jnp.trace(R) - 1) / 2, -1, 1)) ** 2
        return loss_opt + lambda_reg_scale * (reg_scale + reg_scale_mean) + lambda_reg_rot * reg_rot

    # the reference optimizes q_orth too (it is in the param list with the
    # same lr), so include it
    def body(i, carry):
        params, opt = carry
        grads = jax.grad(loss_fn)(params)
        return _adam_step(params, grads, opt, (i + 1).astype(jnp.float32), lr)

    params, _ = jax.lax.fori_loop(0, iterations, body, (params, _adam_init(params)))
    scale = scale_min + (scale_max - scale_min) * jax.nn.sigmoid(params["s"])
    return quat_to_rotmat(params["q"]), params["t"], scale, quat_to_rotmat(params["q_orth"])


def adam_algorithm_3d3d_9dof(
    source_points, target_points, iterations: int = 1000, verbose_interval: int = 100,
    lr: float = 1e-3, lambda_reg_scale: float = 2e-5, lambda_reg_rot: float = 1e-4,
    scale_max: float = 1.5, scale_min: float = 0.75, init_scale=1.0, **_,
):
    init_scale = np.asarray([init_scale] * 3 if np.isscalar(init_scale) else init_scale,
                            np.float32)
    if init_scale.min() < scale_min or init_scale.max() > scale_max:
        init_scale = np.full(3, scale_min + (scale_max - scale_min) / 2, np.float32)
    init_param = np.log(
        (init_scale - scale_min) / (scale_max - scale_min)
        / (1 - (init_scale - scale_min) / (scale_max - scale_min))
    ).astype(np.float32)
    R, t, s, R2 = _adam_3d3d_9dof_jit(
        jnp.asarray(source_points, jnp.float32), jnp.asarray(target_points, jnp.float32),
        jnp.asarray(init_param), iterations,
        lr, lambda_reg_scale, lambda_reg_rot, scale_min, scale_max,
    )
    return np.asarray(R), np.asarray(t), np.asarray(s), np.asarray(R2)


@partial(jax.jit, static_argnames=("iterations", "ninedof"))
def _adam_3d2d_jit(
    source, target2d, w2c, K, q0, t0, s0, iterations: int,
    lr, lambda_reg_rot, scale_min, scale_max, ninedof: bool,
):
    params = {"t": t0, "q": q0, "s": s0}
    if ninedof:
        params["q_orth"] = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)

    def loss_fn(p):
        scale = scale_min + (scale_max - scale_min) * jax.nn.sigmoid(p["s"])
        R = quat_to_rotmat(p["q"])
        if ninedof:
            R2 = quat_to_rotmat(p["q_orth"])
            world = ((scale * (source @ R2.T)) @ R2) @ R.T + p["t"][:3]
        else:
            world = (scale * source) @ R.T + p["t"][:3]
        camp = world @ w2c[:3, :3].T + w2c[:3, 3]
        img = (camp @ K.T) / camp[:, 2:3]
        loss_opt = jnp.mean((img[:, :2] - target2d) ** 2)
        reg_rot = jnp.arccos(jnp.clip((jnp.trace(R) - 1) / 2, -1, 1)) ** 2
        return loss_opt + lambda_reg_rot * reg_rot

    def body(i, carry):
        params, opt = carry
        grads = jax.grad(loss_fn)(params)
        return _adam_step(params, grads, opt, (i + 1).astype(jnp.float32), lr)

    params, _ = jax.lax.fori_loop(0, iterations, body, (params, _adam_init(params)))
    scale = scale_min + (scale_max - scale_min) * jax.nn.sigmoid(params["s"])
    return quat_to_rotmat(params["q"]), params["t"], scale


def _scale_logit(init_scale, scale_min, scale_max, allow_fix=True):
    init_scale = np.asarray([init_scale] * 3 if np.isscalar(init_scale) else init_scale,
                            np.float32)
    if allow_fix and (init_scale.min() < scale_min or init_scale.max() > scale_max):
        init_scale = np.full(3, scale_min + (scale_max - scale_min) / 2, np.float32)
    frac = (init_scale - scale_min) / (scale_max - scale_min)
    return np.log(frac / (1 - frac)).astype(np.float32)


def _adam_3d2d(
    ninedof, source_points_3d_world, target_points_2d_image, extrinsic_matrix,
    intrinsic_matrix, iterations=1000, verbose_interval=100, lr=6e-3,
    lambda_reg_rot=1e-5, scale_max=1.5, scale_min=0.75,
    init_rotation=None, init_translation=None, init_scale=1.0, seed=0, **_,
):
    rng = np.random.default_rng(seed)
    if init_rotation is not None:
        q0 = np.asarray(rotmat_to_quat(jnp.asarray(init_rotation, jnp.float32)))
    else:
        q0 = rng.standard_normal(4).astype(np.float32)
    if init_translation is not None:
        t0 = np.asarray(init_translation, np.float32)
        t0 = np.concatenate([t0, np.zeros(max(0, 4 - t0.shape[0]), np.float32)])[:4]
    else:
        t0 = rng.standard_normal(4).astype(np.float32)
    s0 = _scale_logit(init_scale, scale_min, scale_max, allow_fix=ninedof)
    if not ninedof:
        s0 = s0[:1] * np.ones(1, np.float32) if s0.ndim else s0
    R, t, s = _adam_3d2d_jit(
        jnp.asarray(source_points_3d_world, jnp.float32),
        jnp.asarray(target_points_2d_image, jnp.float32),
        jnp.asarray(extrinsic_matrix, jnp.float32),
        jnp.asarray(intrinsic_matrix, jnp.float32),
        jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(s0),
        iterations, lr, lambda_reg_rot, scale_min, scale_max, ninedof,
    )
    s = np.asarray(s)
    return np.asarray(R), np.asarray(t), s if ninedof else float(s.reshape(-1)[0])


def adam_algorithm_3d2d_9dof(*args, **kwargs):
    return _adam_3d2d(True, *args, **kwargs)


def adam_algorithm_3d2d_7dof(*args, **kwargs):
    return _adam_3d2d(False, *args, **kwargs)
