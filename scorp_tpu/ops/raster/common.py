"""Shared stages of the tile-based differentiable Gaussian rasterizer.

Replicates the semantic contract of the reference's CUDA rasterizer
(`diff_gaussian_rasterization`, reconstructed from its call sites — see
/root/reference/gs3dgs/gaussian_renderer/__init__.py:24-133 and SURVEY.md
§2.3a), re-designed for XLA/TPU:

  preprocess  — fully vectorized over N (VPU-friendly): projection with the
                reference's row-vector transposed matrices, EWA 2D covariance
                J·W·Σ·Wᵀ·Jᵀ with the 0.3px low-pass dilation, 3σ radius from
                the max eigenvalue, frustum cull at view z <= 0.2, in-kernel
                SH→RGB with the clamp-at-0 gradient gate.
  binning     — instead of CUDA's atomic key duplication + radix sort, keys
                are expanded with a searchsorted-over-prefix-sum trick into a
                fixed-capacity buffer (static shapes for XLA) and sorted with
                a stable lax.sort on (tile_id, depth); per-tile ranges come
                from vectorized searchsorted.
  tile lists  — a dense [num_tiles, L] index table (nearest-L per tile,
                overflow counted and reported so callers can grow capacity).

Compositing lives in xla.py (autodiff golden path) and pallas.py (production
kernels with a hand-written VJP). Both consume the same binning outputs so
they are interchangeable and cross-checkable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import sh as sh_lib
from ...core.camera import CameraJax
from ...core.quat import quat_to_rotmat

TILE = 16  # pixels per tile side (perf knob only; per-pixel output is tile-size invariant)


class RasterConfig(NamedTuple):
    """Static capacities (recompile on change)."""

    max_keys: int = 1 << 20       # total (gaussian, tile) pair capacity
    tile_list_len: int = 1024     # per-tile dense list capacity
    chunk: int = 32               # gaussians blended per inner step


class Preprocessed(NamedTuple):
    xy: jnp.ndarray        # [N,2] pixel-space projected centers
    depth: jnp.ndarray     # [N] view-space z
    conic: jnp.ndarray     # [N,3] inverse 2D covariance (A, B, C)
    color: jnp.ndarray     # [N,3] RGB (SH-evaluated or precomputed)
    opacity: jnp.ndarray   # [N] activated opacity
    radii: jnp.ndarray     # [N] int32 screen radius (0 = culled)
    rect: jnp.ndarray      # [N,4] int32 tile rect (x0, y0, x1, y1), half-open
    valid: jnp.ndarray     # [N] bool


class TileBins(NamedTuple):
    tile_lists: jnp.ndarray   # [num_tiles, L] int32 gaussian ids, -1 padded
    tile_counts: jnp.ndarray  # [num_tiles] int32
    num_dropped_keys: jnp.ndarray   # [] int32: keys that did not fit max_keys
    num_dropped_tail: jnp.ndarray   # [] int32: per-tile entries beyond L


def grid_dims(width: int, height: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray, modifier) -> jnp.ndarray:
    """[N,3] scales (activated) + [N,4] quats -> [N,6] upper-tri covariance."""
    R = quat_to_rotmat(quats)
    L = R * (scales * modifier)[:, None, :]
    cov = jnp.einsum("nij,nkj->nik", L, L)
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2], cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]],
        axis=-1,
    )


def preprocess(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: CameraJax,
    *,
    shs: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors_precomp: jnp.ndarray | None = None,
    scales: jnp.ndarray | None = None,
    quats: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    screen_deltas: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
) -> Preprocessed:
    """Vectorized per-Gaussian projection/culling/color stage.

    `screen_deltas` [N,2] is the NDC-space dummy offset used to surface
    screen-space gradients (the reference's `screenspace_points` trick,
    /root/reference/gs3dgs/gaussian_renderer/__init__.py:39-43): it is added
    to the projected NDC position, so d(loss)/d(screen_deltas) is exactly the
    NDC-scaled means2D gradient the densification heuristic consumes.
    """
    n = means3d.shape[0]
    w, h = cam.width, cam.height
    tiles_x, tiles_y = grid_dims(w, h)

    ones = jnp.ones((n, 1), means3d.dtype)
    p_hom4 = jnp.concatenate([means3d, ones], axis=1)
    p_clip = p_hom4 @ cam.projmatrix                     # [N,4]
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    p_proj = p_clip[:, :3] * p_w[:, None]                # NDC
    p_view = p_hom4 @ cam.viewmatrix                     # [N,4]
    depth = p_view[:, 2]
    in_front = depth > 0.2

    if screen_deltas is not None:
        ndc_xy = p_proj[:, :2] + screen_deltas
    else:
        ndc_xy = p_proj[:, :2]
    # ndc2Pix: ((v + 1) * S - 1) * 0.5
    xy = jnp.stack(
        [(ndc_xy[:, 0] + 1.0) * w * 0.5 - 0.5, (ndc_xy[:, 1] + 1.0) * h * 0.5 - 0.5],
        axis=-1,
    )

    # --- EWA 2D covariance ---
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = compute_cov3d(scales, quats, scale_modifier)

    focal_x = w / (2.0 * cam.tanfovx)
    focal_y = h / (2.0 * cam.tanfovy)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tz = jnp.where(in_front, depth, 1.0)  # safe divisor in culled lanes
    tx = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz

    # J: [N,2,3] Jacobian of the perspective projection at (tx, ty, tz)
    zeros = jnp.zeros_like(tz)
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)
    J = jnp.stack(
        [
            jnp.stack([j00, zeros, j02], axis=-1),
            jnp.stack([zeros, j11, j12], axis=-1),
        ],
        axis=-2,
    )
    w2c = cam.viewmatrix[:3, :3].T                        # world->view rotation
    M = J @ w2c                                           # [N,2,3]
    # Σ from upper-tri 6-vector
    c = cov3d
    sigma = jnp.stack(
        [
            jnp.stack([c[:, 0], c[:, 1], c[:, 2]], -1),
            jnp.stack([c[:, 1], c[:, 3], c[:, 4]], -1),
            jnp.stack([c[:, 2], c[:, 4], c[:, 5]], -1),
        ],
        axis=-2,
    )
    cov2 = jnp.einsum("nij,njk,nlk->nil", M, sigma, M)    # [N,2,2]
    c00 = cov2[:, 0, 0] + 0.3
    c01 = cov2[:, 0, 1]
    c11 = cov2[:, 1, 1] + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c11 / det_safe, -c01 / det_safe, c00 / det_safe], axis=-1)

    mid = 0.5 * (c00 + c11)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    radius = radius_f.astype(jnp.int32)

    # tile rect (half-open, clamped to the grid) — reference getRect semantics
    x0 = jnp.clip(((xy[:, 0] - radius_f) / TILE).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((xy[:, 1] - radius_f) / TILE).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(((xy[:, 0] + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_x)
    y1 = jnp.clip(((xy[:, 1] + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_y)
    area = (x1 - x0) * (y1 - y0)

    valid = in_front & det_ok & (area > 0)
    if alive is not None:
        valid = valid & alive
    radii = jnp.where(valid, radius, 0)

    # --- color ---
    if colors_precomp is not None:
        color = colors_precomp
    else:
        dirs = means3d - cam.campos[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        color = jnp.maximum(sh_lib.eval_sh(sh_degree, shs, dirs) + 0.5, 0.0)

    opacity = opacities.reshape(n)
    rect = jnp.stack([x0, y0, x1, y1], axis=-1)
    return Preprocessed(xy, depth, conic, color, opacity, radii, rect, valid)


def bin_gaussians(prep: Preprocessed, width: int, height: int, cfg: RasterConfig) -> TileBins:
    """Expand (gaussian, tile) pairs, depth-sort per tile, build dense lists.

    Pure integer/index computation — wrapped in stop_gradient by callers.
    """
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    k_cap = cfg.max_keys
    n = prep.xy.shape[0]

    x0, y0, x1, y1 = prep.rect[:, 0], prep.rect[:, 1], prep.rect[:, 2], prep.rect[:, 3]
    span_w = x1 - x0
    counts = jnp.where(prep.valid, span_w * (y1 - y0), 0)
    starts = jnp.cumsum(counts) - counts                       # exclusive prefix
    total = starts[-1] + counts[-1]

    # expand: key slot k belongs to gaussian g = last index with starts[g] <= k
    ks = jnp.arange(k_cap, dtype=jnp.int32)
    g = jnp.searchsorted(starts, ks, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, n - 1)
    local = ks - starts[g]
    sw = jnp.maximum(span_w[g], 1)
    tx = x0[g] + local % sw
    ty = y0[g] + local // sw
    tile_id = ty * tiles_x + tx
    in_range = ks < total
    tile_id = jnp.where(in_range, tile_id, num_tiles)          # sentinel -> sorted last
    depth_key = jnp.where(in_range, prep.depth[g], jnp.inf)

    sorted_tile, _, sorted_gidx = jax.lax.sort(
        (tile_id, depth_key, g), num_keys=2, is_stable=True
    )

    # per-tile ranges via vectorized searchsorted
    tid_range = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_tile, tid_range, side="left").astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count_full = bounds[1:] - bounds[:-1]
    tile_count = jnp.minimum(tile_count_full, cfg.tile_list_len)

    # dense [num_tiles, L] table of gaussian ids (nearest-first), -1 padded
    l_idx = jnp.arange(cfg.tile_list_len, dtype=jnp.int32)
    flat_idx = tile_start[:, None] + l_idx[None, :]
    in_list = l_idx[None, :] < tile_count[:, None]
    gathered = sorted_gidx[jnp.clip(flat_idx, 0, k_cap - 1)]
    tile_lists = jnp.where(in_list, gathered, -1)

    num_dropped_keys = jnp.maximum(total - k_cap, 0).astype(jnp.int32)
    num_dropped_tail = jnp.sum(tile_count_full - tile_count).astype(jnp.int32)
    return TileBins(tile_lists, tile_count, num_dropped_keys, num_dropped_tail)


def tile_pixel_coords(width: int, height: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile flattened pixel centers: two [num_tiles, TILE*TILE] f32 arrays."""
    tiles_x, tiles_y = grid_dims(width, height)
    t = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.float32, (TILE, TILE), 0).reshape(-1)
    px = jax.lax.broadcasted_iota(jnp.float32, (TILE, TILE), 1).reshape(-1)
    pix_x = tx[:, None] * TILE + px[None, :]
    pix_y = ty[:, None] * TILE + py[None, :]
    return pix_x, pix_y


def tiles_to_image(tile_img: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """[num_tiles, TILE*TILE, C] -> [C, H, W] (crop the tile-grid padding)."""
    tiles_x, tiles_y = grid_dims(width, height)
    c = tile_img.shape[-1]
    img = tile_img.reshape(tiles_y, tiles_x, TILE, TILE, c)
    img = img.transpose(4, 0, 2, 1, 3).reshape(c, tiles_y * TILE, tiles_x * TILE)
    return img[:, :height, :width]
