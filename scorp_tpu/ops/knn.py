"""K-nearest-neighbor mean squared distance.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2`
(single call site: initial Gaussian scale estimation,
/root/reference/gs3dgs/scene/gaussian_model.py:177-178): for each point the
mean of squared distances to its 3 nearest neighbors.

The CUDA original uses a Morton-order spatial sort + box pruning; on TPU the
idiomatic formulation is exact blocked brute force: the pairwise distance
matrix decomposes as |q|^2 + |p|^2 - 2 q·p whose cross term is a matmul that
runs on the MXU, and a running top-k merge over point blocks bounds memory.
Exact (not approximate), deterministic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_Q_BLOCK = 1024     # queries per outer step
_P_BLOCK = 16384    # points per inner step


def _pad_to(x: jnp.ndarray, size: int, fill: float) -> jnp.ndarray:
    pad = size - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)


@partial(jax.jit, static_argnames=("k",))
def _knn_mean_dist2_padded(points: jnp.ndarray, n_valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """points [Np,3] padded; returns mean of k smallest non-self d2 per point."""
    n_pad = points.shape[0]
    n_qblocks = n_pad // _Q_BLOCK
    p_block = min(_P_BLOCK, n_pad)
    n_pblocks = n_pad // p_block  # n_pad is a multiple of p_block by construction

    pts2 = jnp.sum(points * points, axis=-1)  # [Np]
    idx_all = jnp.arange(n_pad, dtype=jnp.int32)

    def query_block(_, qb):
        q0 = qb * _Q_BLOCK
        q = jax.lax.dynamic_slice_in_dim(points, q0, _Q_BLOCK)          # [Q,3]
        q2 = jax.lax.dynamic_slice_in_dim(pts2, q0, _Q_BLOCK)           # [Q]
        qidx = jax.lax.dynamic_slice_in_dim(idx_all, q0, _Q_BLOCK)      # [Q]

        def point_block(pb, best):
            p0 = pb * p_block
            p = jax.lax.dynamic_slice_in_dim(points, p0, p_block)       # [P,3]
            p2 = jax.lax.dynamic_slice_in_dim(pts2, p0, p_block)        # [P]
            pidx = jax.lax.dynamic_slice_in_dim(idx_all, p0, p_block)   # [P]
            cross = jnp.dot(
                q, p.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # full-f32 MXU passes
            )
            d2 = q2[:, None] + p2[None, :] - 2.0 * cross                 # [Q,P]
            invalid = (qidx[:, None] == pidx[None, :]) | (pidx[None, :] >= n_valid)
            d2 = jnp.where(invalid, jnp.inf, d2)
            merged = jnp.concatenate([best, d2], axis=1)
            neg_top, _ = jax.lax.top_k(-merged, k)
            return -neg_top

        best0 = jnp.full((_Q_BLOCK, k), jnp.inf, jnp.float32)
        best = jax.lax.fori_loop(0, n_pblocks, point_block, best0)
        return None, jnp.mean(best, axis=1)

    _, out = jax.lax.scan(query_block, None, jnp.arange(n_qblocks))
    return out.reshape(-1)


def knn_mean_dist2(points, k: int = 3) -> jnp.ndarray:
    """Mean squared distance to the k nearest neighbors, per point.

    Args:
      points: [N, 3] float array (numpy or jax).
    Returns:
      [N] f32, exact equivalent of distCUDA2 for k=3.
    """
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    if n <= k:
        # degenerate: every other point is a neighbor
        d2 = jnp.sum((points[:, None] - points[None]) ** 2, -1)
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, min(k, n - 1))
        return jnp.mean(-neg_top, axis=1)
    block = _P_BLOCK if n > _P_BLOCK else _Q_BLOCK
    n_pad = ((n + block - 1) // block) * block
    padded = _pad_to(points, n_pad, 1e10)
    out = _knn_mean_dist2_padded(padded, jnp.int32(n), k)
    return out[:n]
