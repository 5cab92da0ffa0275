"""Shared stages of the tile-based differentiable Gaussian rasterizer.

Replicates the semantic contract of the reference's CUDA rasterizer
(`diff_gaussian_rasterization`, reconstructed from its call sites — see
/root/reference/gs3dgs/gaussian_renderer/__init__.py:24-133 and SURVEY.md
§2.3a), re-designed for XLA/TPU:

preprocess — fully vectorized over N in scalarized form (one fused VPU
  pass): projection with the reference's row-vector transposed matrices,
  EWA 2D covariance J·W·Σ·Wᵀ·Jᵀ with the 0.3px low-pass dilation, frustum
  cull at view z <= 0.2, in-kernel SH→RGB with the clamp-at-0 gradient
  gate. Reported radii match the reference (ceil of 3σ of the max
  eigenvalue); the *binning* rect additionally uses the exact per-axis
  alpha>=1/255 ellipse bbox min'd with the reference rect — every excluded
  pixel has zero contribution in the reference too (its per-pixel alpha
  test skips it), so outputs and gradients are identical while the
  (gaussian, tile) key count drops severalfold.

binning — instead of CUDA's atomic key duplication + radix sort:
  1. gaussians are pre-sorted by view depth (one N-sized sort);
  2. keys are expanded into a fixed-capacity buffer with scatter + prefix
     ops (a cumsum recovers the source gaussian of each key slot, cummax's
     recover its start offset and packed tile rect) — no binary searches,
     no per-key gathers;
  3. one stable single-key sort by tile id preserves depth order in-tile;
  4. per-tile ranges come from a vectorized searchsorted over tile ids.

The stream form (sorted per-key gaussian rows [12, K] + per-tile start/
count) feeds the Pallas compositor; the dense [num_tiles, L] list form
feeds the autodiff XLA compositor used as the golden reference.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import sh as sh_lib
from ...core.camera import CameraJax
from ...core.quat import quat_to_rotmat

TILE = 16  # pixels per tile side (perf knob only; per-pixel output is tile-size invariant)
ALPHA_MIN = 1.0 / 255.0


class RasterConfig(NamedTuple):
    """Static capacities (recompile on change)."""

    max_keys: int = 1 << 20       # total (gaussian, tile) pair capacity
    tile_list_len: int = 1024     # per-tile dense list capacity (XLA path)
    chunk: int = 32               # gaussians blended per inner step (XLA path)
    pallas_chunk: int = 128       # gaussians per VMEM stage (Pallas path;
                                  # 128 measured best on v5e: scan steps +
                                  # early-exit granularity beat 256/512)
    # capacity of the post-cull sorted stream (0 = max_keys). The exact
    # ellipse-tile cull drops 15-50% of expanded keys, so the sorted slice —
    # and everything downstream: the stream gather, the compositor chunks,
    # the backward scatter — can run at a smaller static size than the
    # pre-cull expansion buffer.
    stream_keys: int = 0
    # backward-scatter compaction (Pallas training paths): before the
    # per-key gradient scatter-add, gather only the chunk blocks that
    # intersect some tile's ACTIVE range (keys before per-pixel
    # termination; the backward kernels never write past it, so the rest
    # of K_pad is exactly zero — measured ~57% coverage at bench scale).
    # XLA scatter-add costs ~15 ns/row regardless of content, so the
    # static compact capacity `bwd_block_frac * (K_pad/pallas_chunk)`
    # cuts the scatter cost proportionally. 0 disables. Safe at any
    # value: if the covered-block count exceeds the cap, a lax.cond
    # falls back to the full scatter (slower, never wrong).
    bwd_block_frac: float = 0.0

    @property
    def stream_cap(self) -> int:
        return self.stream_keys or self.max_keys

    def bwd_blocks(self, n_blocks: int) -> int:
        """Compact-scatter block capacity for a K_pad of n_blocks chunks
        (0 = compaction disabled)."""
        if not self.bwd_block_frac or self.bwd_block_frac >= 1.0:
            return 0
        return max(1, int(n_blocks * self.bwd_block_frac))


class Preprocessed(NamedTuple):
    xy: jnp.ndarray        # [N,2] pixel-space projected centers
    depth: jnp.ndarray     # [N] view-space z
    conic: jnp.ndarray     # [N,3] inverse 2D covariance (A, B, C)
    color: jnp.ndarray     # [N,3] RGB (SH-evaluated or precomputed)
    opacity: jnp.ndarray   # [N] activated opacity
    radii: jnp.ndarray     # [N] int32 reference screen radius (0 = culled)
    rect: jnp.ndarray      # [N,4] int32 binning tile rect (x0, y0, x1, y1), half-open
    valid: jnp.ndarray     # [N] bool (has at least one binning tile)


class TileBins(NamedTuple):
    tile_lists: jnp.ndarray   # [num_tiles, L] int32 gaussian ids, -1 padded
    tile_counts: jnp.ndarray  # [num_tiles] int32
    num_dropped_keys: jnp.ndarray   # [] i32: keys that did not fit max_keys
    num_dropped_tail: jnp.ndarray   # [] i32: per-tile entries beyond L


class StreamBins(NamedTuple):
    """Depth-ordered per-tile key stream for the Pallas compositor.

    `data` rows: 0-1 xy, 2-4 conic Cholesky factor, 5-7 color, 8 depth,
    9 log2(opacity) (see log2_opacity),
    10-15 zero padding (depth sits NEXT TO color so the compositors
    accumulate color+depth with ONE [4,C] contraction; sublane tiling
    wants a multiple of 8 rows; Mosaic
    VMEM tiling also rules out a row-major [K, 16] layout — 16-lane minor
    slices can't be tiled — and the narrow 10-column gather table is what
    keeps the per-key gather on the VMEM fast path).
    """

    data: jnp.ndarray         # [16, K] f32, grouped by tile, depth-ascending
    sorted_gidx: jnp.ndarray  # [K] i32 source gaussian of each key (for VJP scatter)
    tile_start: jnp.ndarray   # [num_tiles] i32 offsets into the stream
    tile_count: jnp.ndarray   # [num_tiles] i32
    num_dropped_keys: jnp.ndarray  # [] i32


DATA_ROWS = 10
DATA_ROWS_PADDED = 16


def pad_cols(x: jnp.ndarray, cols: int) -> jnp.ndarray:
    """Zero-pad [N, c] -> [N, cols]. Applied to the N-sized payload table
    BEFORE the K-sized stream gather so gather_rows_u16_t emits the
    kernel-consumable padded row count directly — the [rows, K] zero-pad
    concat it replaces was a measured 0.6 ms copy at 1.66M keys on v5e
    (the row gather itself is nearly width-independent)."""
    n, c = x.shape
    if c == cols:
        return x
    return jnp.concatenate([x, jnp.zeros((n, cols - c), x.dtype)], axis=1)


def gather_rows_u16(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Exact f32 row gather via u16 bitcast halves.

    XLA's TPU row gather runs ~12 ns/row for 32-bit dtypes regardless of row
    width, but ~3x faster for 16-bit dtypes (measured on v5e). Bitcasting
    each f32 to two u16 halves and gathering the twice-as-wide u16 table is
    bit-exact and ~3x faster. No gradient (bitcast is opaque to autodiff).
    """
    r, c = table.shape
    t16 = jax.lax.bitcast_convert_type(table, jnp.uint16).reshape(r, 2 * c)
    rows = t16[idx]
    return jax.lax.bitcast_convert_type(rows.reshape(-1, c, 2), jnp.float32)


def gather_rows_u16_t(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Exact f32 row gather returning the TRANSPOSED [C, K] result.

    Same u16 fast path as gather_rows_u16, but the u16 table is laid out as
    [low halves | high halves] column blocks instead of interleaved pairs:
    the post-gather recombination becomes two column slices + one shift-or
    (which XLA fuses with the transpose), instead of the [K, C, 2]
    de-interleave reshape it otherwise materializes (~1.2 ms of pure data
    shuffling at 1.5M keys on v5e). Bit-exact; no gradient.
    """
    r, c = table.shape
    t16 = jax.lax.bitcast_convert_type(table, jnp.uint16)  # [r, c, 2] lo/hi
    t2 = jnp.concatenate([t16[:, :, 0], t16[:, :, 1]], axis=1)  # [r, 2c]
    rows = t2[idx]  # [K, 2c] the one per-key gather
    u = rows[:, :c].astype(jnp.uint32) | (
        rows[:, c:].astype(jnp.uint32) << 16
    )
    return jax.lax.bitcast_convert_type(u, jnp.float32).T  # [c, K]


def _gather_rows_mixed_impl(extra, aux16, idx):
    r, c = extra.shape
    t16 = jax.lax.bitcast_convert_type(extra, jnp.uint16).reshape(r, 2 * c)
    rows = jnp.concatenate([t16, aux16], axis=1)[idx]
    ex = jax.lax.bitcast_convert_type(
        rows[:, : 2 * c].reshape(-1, c, 2), jnp.float32
    )
    return ex, rows[:, 2 * c :]


@jax.custom_vjp
def gather_rows_mixed(
    extra: jnp.ndarray, aux16: jnp.ndarray, idx: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ONE u16 row gather moving a differentiable f32 block and a
    non-differentiable u16 block together: (extra[idx], aux16[idx]).

    The XLA row gather costs ~2-4 ns/row nearly independent of row width
    (VMEM-resident source), so fusing the payload table with the routing
    aux columns (rect + cull geometry) halves the number of N-row gathers
    per frame. Gradient flows to `extra` only (scatter-add VJP)."""
    return _gather_rows_mixed_impl(extra, aux16, idx)


def _gather_mixed_fwd(extra, aux16, idx):
    return (
        _gather_rows_mixed_impl(extra, aux16, idx),
        (idx, extra.shape[0], aux16.shape),
    )


def _gather_mixed_bwd(res, grads):
    idx, n_rows, aux_shape = res
    g_extra, _ = grads
    d_extra = jnp.zeros((n_rows, g_extra.shape[1]), g_extra.dtype).at[idx].add(
        g_extra
    )
    return (
        d_extra,
        np.zeros(aux_shape, jax.dtypes.float0),
        np.zeros(idx.shape, jax.dtypes.float0),
    )


gather_rows_mixed.defvjp(_gather_mixed_fwd, _gather_mixed_bwd)


@jax.custom_vjp
def gather_rows_mixed_perm(
    extra: jnp.ndarray, aux16: jnp.ndarray, perm: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """gather_rows_mixed for a PERMUTATION index (len(perm) == len(extra),
    each row exactly once). The VJP then moves the cotangent by the inverse
    permutation: one 2-column sort (~0.4 ms at 250k) + one u16 row gather
    (~2-4 ns/row) instead of the generic scatter-add (~13-15 ns/row —
    measured 3.2 ms -> ~1 ms at 250k x 10 on v5e)."""
    return _gather_rows_mixed_impl(extra, aux16, perm)


def _gather_mixed_perm_fwd(extra, aux16, perm):
    assert perm.shape[0] == extra.shape[0], "perm must be a full permutation"
    return (
        _gather_rows_mixed_impl(extra, aux16, perm),
        (perm, aux16.shape),
    )


def _gather_mixed_perm_bwd(res, grads):
    perm, aux_shape = res
    g_extra, _ = grads
    n = perm.shape[0]
    # inverse permutation via one 2-column sort: sorting (perm, iota) by
    # perm yields (iota, inv) since perm hits every value exactly once
    iota = jax.lax.iota(jnp.int32, n)
    _, inv = jax.lax.sort((perm, iota), num_keys=1, is_stable=False)
    d_extra = gather_rows_u16(g_extra, inv)
    return (
        d_extra,
        np.zeros(aux_shape, jax.dtypes.float0),
        np.zeros(perm.shape, jax.dtypes.float0),
    )


gather_rows_mixed_perm.defvjp(_gather_mixed_perm_fwd, _gather_mixed_perm_bwd)


@jax.custom_vjp
def fast_gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Differentiable row gather table[idx] with the u16 fast path.

    The VJP is the same scatter-add autodiff would produce for table[idx].
    """
    return gather_rows_u16(table, idx)


def _fast_gather_fwd(table, idx):
    return gather_rows_u16(table, idx), (idx, table.shape[0])


def _fast_gather_bwd(res, g):
    idx, n_rows = res
    d_table = jnp.zeros((n_rows, g.shape[1]), g.dtype).at[idx].add(g)
    return d_table, np.zeros(idx.shape, jax.dtypes.float0)


fast_gather_rows.defvjp(_fast_gather_fwd, _fast_gather_bwd)


@jax.custom_vjp
def fast_gather_rows_perm(table: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """fast_gather_rows for a PERMUTATION index: the VJP is the inverse-
    permutation gather (sort + u16 gather) instead of a scatter-add."""
    return gather_rows_u16(table, perm)


def _fast_gather_perm_fwd(table, perm):
    assert perm.shape[0] == table.shape[0], "perm must be a full permutation"
    return gather_rows_u16(table, perm), perm


def _fast_gather_perm_bwd(perm, g):
    n = perm.shape[0]
    iota = jax.lax.iota(jnp.int32, n)
    _, inv = jax.lax.sort((perm, iota), num_keys=1, is_stable=False)
    return gather_rows_u16(g, inv), np.zeros(perm.shape, jax.dtypes.float0)


fast_gather_rows_perm.defvjp(_fast_gather_perm_fwd, _fast_gather_perm_bwd)


def grid_dims(width: int, height: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray, modifier) -> jnp.ndarray:
    """[N,3] scales (activated) + [N,4] quats -> [N,6] upper-tri covariance.

    Fully scalarized (Σ_ik = Σ_j R_ij R_kj s_j²): batched 3x3 einsums pad to
    the 128-wide MXU and run ~10x slower than one fused VPU pass.
    """
    q = quats
    # clamp INSIDE the sqrt: sqrt's VJP at 0 is inf, so a dead row's all-zero
    # quat would turn its zero cotangent into NaN (see core.quat.quat_to_rotmat)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1), 1e-24))
    qn = q / norm[:, None]
    w, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s = scales * modifier
    s0, s1, s2 = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2
    c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return jnp.stack([c00, c01, c02, c11, c12, c22], axis=-1)


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

    px, py, pz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    V = cam.viewmatrix
    P = cam.projmatrix
    # row-vector transforms, scalarized so XLA fuses one elementwise pass
    view_x = px * V[0, 0] + py * V[1, 0] + pz * V[2, 0] + V[3, 0]
    view_y = px * V[0, 1] + py * V[1, 1] + pz * V[2, 1] + V[3, 1]
    depth = px * V[0, 2] + py * V[1, 2] + pz * V[2, 2] + V[3, 2]
    clip_x = px * P[0, 0] + py * P[1, 0] + pz * P[2, 0] + P[3, 0]
    clip_y = px * P[0, 1] + py * P[1, 1] + pz * P[2, 1] + P[3, 1]
    clip_w = px * P[0, 3] + py * P[1, 3] + pz * P[2, 3] + P[3, 3]
    p_w = 1.0 / (clip_w + 1e-7)
    ndc_x = clip_x * p_w
    ndc_y = clip_y * p_w
    in_front = depth > 0.2

    if screen_deltas is not None:
        ndc_x = ndc_x + screen_deltas[:, 0]
        ndc_y = ndc_y + screen_deltas[:, 1]
    # ndc2Pix: ((v + 1) * S - 1) * 0.5
    pix_x = (ndc_x + 1.0) * (w * 0.5) - 0.5
    pix_y = (ndc_y + 1.0) * (h * 0.5) - 0.5
    xy = jnp.stack([pix_x, pix_y], axis=-1)

    # --- EWA 2D covariance (scalarized) ---
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = compute_cov3d(scales, quats, scale_modifier)
    s00, s01, s02 = cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]
    s11, s12, s22 = cov3d[:, 3], cov3d[:, 4], cov3d[:, 5]

    focal_x = w / (2.0 * cam.tanfovx)
    focal_y = h / (2.0 * cam.tanfovy)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tz = jnp.where(in_front, depth, 1.0)  # safe divisor in culled lanes
    inv_z = 1.0 / tz
    tx = jnp.clip(view_x * inv_z, -limx, limx) * tz
    ty = jnp.clip(view_y * inv_z, -limy, limy) * tz

    # M = J @ R_w2c with J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    # R_w2c rows are V's columns (V stores W2C transposed).
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z * inv_z
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z * inv_z
    r00, r01, r02 = V[0, 0], V[1, 0], V[2, 0]
    r10, r11, r12 = V[0, 1], V[1, 1], V[2, 1]
    r20, r21, r22 = V[0, 2], V[1, 2], V[2, 2]
    m00 = j00 * r00 + j02 * r20
    m01 = j00 * r01 + j02 * r21
    m02 = j00 * r02 + j02 * r22
    m10 = j11 * r10 + j12 * r20
    m11 = j11 * r11 + j12 * r21
    m12 = j11 * r12 + j12 * r22
    # cov2 = M Σ Mᵀ
    t0x = m00 * s00 + m01 * s01 + m02 * s02
    t0y = m00 * s01 + m01 * s11 + m02 * s12
    t0z = m00 * s02 + m01 * s12 + m02 * s22
    t1x = m10 * s00 + m11 * s01 + m12 * s02
    t1y = m10 * s01 + m11 * s11 + m12 * s12
    t1z = m10 * s02 + m11 * s12 + m12 * s22
    c00 = t0x * m00 + t0y * m01 + t0z * m02 + 0.3
    c01 = t1x * m00 + t1y * m01 + t1z * m02
    c11 = t1x * m10 + t1y * m11 + t1z * m12 + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det != 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0)))
    radius = radius_f.astype(jnp.int32)

    opacity = opacities.reshape(n)
    # exact alpha >= 1/255 ellipse bbox (pixels outside have zero
    # contribution in the reference as well: its per-pixel alpha test skips
    # them), min'd with the reference's circular-radius rect
    t2 = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)
    t2 = jnp.maximum(t2, 0.0)
    rx = jnp.minimum(radius_f, jnp.sqrt(t2 * jnp.maximum(c00, 0.0)))
    ry = jnp.minimum(radius_f, jnp.sqrt(t2 * jnp.maximum(c11, 0.0)))
    keep = in_front & det_ok & (t2 > 0.0)
    rx = jnp.where(keep, rx, 0.0)
    ry = jnp.where(keep, ry, 0.0)

    # reference getRect semantics (half-open, clamped to grid)
    x0 = jnp.clip(((pix_x - rx) / TILE).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((pix_y - ry) / TILE).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(((pix_x + rx + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_x)
    y1 = jnp.clip(((pix_y + ry + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_y)
    valid = keep & (x1 > x0) & (y1 > y0) & ((rx > 0.0) | (ry > 0.0))
    if alive is not None:
        valid = valid & alive
    x0 = jnp.where(valid, x0, 0)
    y0 = jnp.where(valid, y0, 0)
    x1 = jnp.where(valid, x1, 0)
    y1 = jnp.where(valid, y1, 0)

    # reported radii/visibility keep the reference's semantics (its rect is
    # radius-circular and ignores opacity)
    rx0 = jnp.clip(((pix_x - radius_f) / TILE).astype(jnp.int32), 0, tiles_x)
    ry0 = jnp.clip(((pix_y - radius_f) / TILE).astype(jnp.int32), 0, tiles_y)
    rx1 = jnp.clip(((pix_x + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_x)
    ry1 = jnp.clip(((pix_y + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_y)
    valid_ref = in_front & det_ok & ((rx1 - rx0) * (ry1 - ry0) > 0)
    if alive is not None:
        valid_ref = valid_ref & alive
    radii = jnp.where(valid_ref, radius, 0)

    # --- color ---
    if colors_precomp is not None:
        color = colors_precomp
    else:
        dirs = means3d - cam.campos[None, :]
        # eps inside the sqrt: x/||x|| has a NaN VJP at x=0
        dirs = dirs * jax.lax.rsqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20)
        color = jnp.maximum(sh_lib.eval_sh(sh_degree, shs, dirs) + 0.5, 0.0)

    rect = jnp.stack([x0, y0, x1, y1], axis=-1)
    return Preprocessed(xy, depth, conic, color, opacity, radii, rect, valid)


def _bf16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> bf16 bit pattern as i32 in [0, 65535]."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.bfloat16), jnp.uint16)
    return b.astype(jnp.int32)


def _bits_bf16(b: jnp.ndarray) -> jnp.ndarray:
    """i32 holding a bf16 bit pattern -> f32 value."""
    return jax.lax.bitcast_convert_type(
        b.astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)


def default_cull_geo(prep: Preprocessed) -> jnp.ndarray:
    """[N, 6] (cx, cy, A, B, C, t2): the 3DGS alpha>=1/255 screen ellipse.

    q(d) = A dx^2 + 2B dx dy + C dy^2 = -2*power <= t2 = 2 log(255 opa).
    """
    t2 = jnp.maximum(
        2.0 * jnp.log(jnp.maximum(prep.opacity, 1e-12) * 255.0), 0.0
    )
    return jax.lax.stop_gradient(
        jnp.concatenate([prep.xy, prep.conic, t2[:, None]], axis=1)
    )


def _expand_keys_core(
    prep: Preprocessed, width: int, height: int, k_cap: int, cull: bool = False,
    geo1: jnp.ndarray | None = None, geo2: jnp.ndarray | None = None,
):
    """Depth-presorted key expansion via ONE scatter + prefix sums.

    Returns (tile [K], g_of_k [K] position in depth-sorted order, order [N],
    total, ktx, kty, in_range, kept). No binary searches and no per-key
    gathers: every per-key quantity — the source gaussian (marker cumsum),
    its start offset, its packed tile rect, and (with cull=True) its packed
    screen geometry — rides a single scatter of per-gaussian integer
    *differences* followed by cumsums (exact under i32 wraparound: the depth
    sort puts all valid gaussians in a contiguous prefix, so the telescoping
    chain is unbroken).

    cull=True additionally applies the exact alpha>=1/255 ellipse vs
    16x16-tile overlap test per key: the binning rect is the tight AABB of
    the q(d) <= t2 ellipse (q = A dx^2 + 2B dx dy + C dy^2 = -2*power), but
    an AABB of a rotated anisotropic ellipse is mostly empty — the exact
    test drops 15-50% of keys. A culled key has alpha < 1/255 at every pixel
    of its tile, so the compositor (and the reference renderCUDA per-pixel
    alpha test) would skip it anyway: outputs and gradients are unchanged.
    The geometry rides the expansion as packed integers (center fixed-point
    1/32 px rect-relative, conic/threshold bf16), and the keep test inflates
    the threshold by the packing error, so it never drops a key the f32
    compositor would keep.
    """
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y

    # 1. depth pre-sort (invalid last). Invalid gaussians have zeroed rects
    # (preprocess), so counts==0 encodes validity — no valid[] gather needed.
    # rect fields fit u16, and 16-bit gathers are ~3x faster on TPU.
    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf), stable=True)
    rect = prep.rect.astype(jnp.uint16)[order].astype(jnp.int32)
    x0, y0, x1, y1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    span = x1 - x0
    counts = span * (y1 - y0)
    starts = jnp.cumsum(counts) - counts
    total = starts[-1] + counts[-1]

    has_keys = counts > 0
    pos = jnp.where(has_keys, starts, k_cap)  # k_cap -> dropped by scatter

    def _diff(v):
        return v - jnp.concatenate([jnp.zeros(1, jnp.int32), v[:-1]])

    packed = (x0 << 20) | (y0 << 10) | span
    cols = [jnp.ones_like(packed), _diff(starts.astype(jnp.int32)), _diff(packed)]

    def _geo_cols(geo):
        # per-gaussian screen ellipse (cx, cy, A, B, C, t2), packed to 3
        # i32: center as rect-relative fixed point (1/32 px), conic A/B/C +
        # threshold bf16
        g = gather_rows_u16(jax.lax.stop_gradient(geo), order)
        gx_rel = g[:, 0] - x0.astype(jnp.float32) * TILE
        gy_rel = g[:, 1] - y0.astype(jnp.float32) * TILE
        gx_fp = jnp.clip(jnp.round(gx_rel * 32.0), 0, 65535).astype(jnp.int32)
        gy_fp = jnp.clip(jnp.round(gy_rel * 32.0), 0, 65535).astype(jnp.int32)
        t2 = g[:, 5]
        # the u16 fixed point covers 2048 px of rect-relative center; beyond
        # it the clamp can move the center AWAY from mid-rect tiles (not
        # conservative) — force-keep such keys via an infinite threshold.
        # (clamping negatives to 0 only moves the center toward in-rect
        # tiles, which is conservative.)
        overflow = (gx_rel > 2047.0) | (gy_rel > 2047.0)
        t2 = jnp.where(overflow, jnp.float32(jnp.inf), t2)
        return [
            _diff((gx_fp << 16) | gy_fp),
            _diff((_bf16_bits(g[:, 2]) << 16) | _bf16_bits(g[:, 3])),
            _diff((_bf16_bits(g[:, 4]) << 16) | _bf16_bits(t2)),
        ]

    if cull:
        cols += _geo_cols(geo1 if geo1 is not None else default_cull_geo(prep))
        if geo2 is not None:
            cols += _geo_cols(geo2)
    upd = jnp.stack(cols, axis=1)  # [N, 3|6|9]
    buf = (
        jnp.zeros((k_cap, upd.shape[1]), jnp.int32)
        .at[pos]
        .add(upd, mode="drop")
    )
    cum = jnp.cumsum(buf.T, axis=1)  # [3|6, K] — prefix along lanes

    g_of_k = cum[0] - 1  # position in depth-sorted order
    start_of_k = cum[1]
    packed_of_k = cum[2]

    ks = jax.lax.broadcasted_iota(jnp.int32, (k_cap, 1), 0)[:, 0]
    local = ks - start_of_k
    kx0 = packed_of_k >> 20
    ky0 = (packed_of_k >> 10) & 1023
    kspan = jnp.maximum(packed_of_k & 1023, 1)
    ktx = kx0 + local % kspan
    kty = ky0 + local // kspan
    tile = kty * tiles_x + ktx
    in_range = (ks < jnp.minimum(total, k_cap)) & (g_of_k >= 0)

    if cull:
        # tile pixel box relative to the rect origin (where centers live)
        fx = ((ktx - kx0) * TILE).astype(jnp.float32)
        fy = ((kty - ky0) * TILE).astype(jnp.float32)

        def _keep(c3, c4, c5):
            gx = ((c3 >> 16) & 0xFFFF).astype(jnp.float32) * (1.0 / 32.0)
            gy = (c3 & 0xFFFF).astype(jnp.float32) * (1.0 / 32.0)
            a = _bits_bf16(c4 >> 16)
            b = _bits_bf16(c4)
            c = _bits_bf16(c5 >> 16)
            t2k = _bits_bf16(c5)
            dxlo, dxhi = fx - gx, fx + (TILE - 1) - gx
            dylo, dyhi = fy - gy, fy + (TILE - 1) - gy
            inside = (dxlo <= 0.0) & (0.0 <= dxhi) & (dylo <= 0.0) & (0.0 <= dyhi)
            sa = jnp.maximum(a, 1e-12)
            sc = jnp.maximum(c, 1e-12)

            # each edge evaluation returns (q, qabs) at the same clamped
            # point: qabs = |A|dx^2 + 2|B dx dy| + |C|dy^2 tracks the
            # cancellation magnitude of the three bf16 terms, so the keep
            # tolerance can scale with the actual packing error (for large
            # rotated anisotropic gaussians the terms reach 1e4-1e5 while q
            # stays small — a fixed tolerance is NOT conservative there)
            def q_edge_x(e):
                dy = jnp.clip(-b * e / sc, dylo, dyhi)
                cross = b * e * dy
                q = a * e * e + 2.0 * cross + c * dy * dy
                qa = sa * e * e + 2.0 * jnp.abs(cross) + sc * dy * dy
                return q, qa

            def q_edge_y(f):
                dx = jnp.clip(-b * f / sa, dxlo, dxhi)
                cross = b * f * dx
                q = c * f * f + 2.0 * cross + a * dx * dx
                qa = sc * f * f + 2.0 * jnp.abs(cross) + sa * dx * dx
                return q, qa

            def _min_pair(p1, p2):
                q1, a1 = p1
                q2, a2 = p2
                take1 = q1 <= q2
                return jnp.where(take1, q1, q2), jnp.where(take1, a1, a2)

            q_min, qabs = _min_pair(
                _min_pair(q_edge_x(dxlo), q_edge_x(dxhi)),
                _min_pair(q_edge_y(dylo), q_edge_y(dyhi)),
            )
            q_min = jnp.where(inside, 0.0, q_min)
            qabs = jnp.where(inside, 0.0, qabs)
            pd = (a > 0.0) & (c > 0.0) & (a * c - b * b > 0.0)
            # tolerance: 1.02*t2k covers the bf16 rounding of the threshold
            # itself; 0.01*qabs covers bf16 conic rounding (2^-8 rel per
            # coefficient) through the cancelling sum; the 0.9 constant
            # covers the 1/32 px center quantization in the |d| < 7 px
            # regime (beyond that the qabs term dominates the quantization
            # error too)
            return ~pd | (q_min <= jnp.abs(t2k) * 0.02 + t2k + 0.01 * qabs + 0.9)

        keep = _keep(cum[3], cum[4], cum[5])
        if geo2 is not None:
            # union: a key contributes iff EITHER ellipse admits it
            keep = keep | _keep(cum[6], cum[7], cum[8])
        in_range = in_range & keep

    tile = jnp.where(in_range, tile, num_tiles)
    kept = jnp.sum(in_range.astype(jnp.int32))
    return tile, g_of_k, order, total, ktx, kty, in_range, kept


def _expand_keys(prep: Preprocessed, width: int, height: int, k_cap: int):
    """Expansion + stable single-key tile sort (preserves depth order)."""
    tile, g_of_k, order, total, *_ = _expand_keys_core(prep, width, height, k_cap)
    sorted_tile, sorted_pos = jax.lax.sort((tile, g_of_k), num_keys=1, is_stable=True)
    return sorted_tile, sorted_pos, order, total


def _tile_sort(tile, g_of_k, num_tiles: int, n: int):
    """Stable-by-construction tile sort of (tile, depth-rank) keys.

    The payload g_of_k is a rank in depth-sorted order, so it is < n (the
    gaussian capacity), not < K: when (num_tiles+1)·2^bits(n) fits in a
    positive i32, pack both into ONE sort key — a single-operand sort costs
    half the two-operand form, and the pack preserves depth order within
    each tile exactly (ranks are unique, so stability is free).
    """
    g = jnp.maximum(g_of_k, 0)
    bits_g = max(1, int(n - 1).bit_length())
    if (num_tiles + 1) << bits_g <= (1 << 31) - 1:
        packed = (tile << bits_g) | g
        s = jax.lax.sort(packed, is_stable=False)
        return s >> bits_g, s & ((1 << bits_g) - 1)
    return jax.lax.sort((tile, g), num_keys=1, is_stable=True)


def _tile_bounds(sorted_tile: jnp.ndarray, num_tiles: int):
    # scan_unrolled: the default 'scan' lowers the ~21-step binary search to
    # an XLA while loop whose per-iteration dispatch (~90 us) dominates the
    # actual gathers — unrolling cut the tile-bounds stage ~2x on v5e
    bounds = jnp.searchsorted(
        sorted_tile,
        jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left",
        method="scan_unrolled",
    ).astype(jnp.int32)
    return bounds[:-1], bounds[1:] - bounds[:-1]


def sorted_expansion(
    prep: Preprocessed,
    width: int,
    height: int,
    k_cap: int,
    cull: bool,
    interpret: bool = False,
    geo1: jnp.ndarray | None = None,
    geo2: jnp.ndarray | None = None,
    extra: jnp.ndarray | None = None,
):
    """Expansion + stable tile sort -> (sorted_tile, g_sorted [K], order,
    total, kept, extra_sorted). Uses the Pallas expansion kernel
    (pallas_expand) when the packed sort key fits and a TPU (or interpret
    mode) is available; the XLA scatter+cumsum expansion otherwise.

    geo1/geo2: optional explicit cull ellipses [N, 6] (cx, cy, A, B, C,
    t2); geo1 defaults to the 3DGS conic (default_cull_geo), geo2 adds a
    second ellipse OR-ed with the first (the surfel low-pass circle).

    extra: optional differentiable [N, C] f32 payload permuted by the
    depth order inside the expansion's single N-row gather (the kernel
    path) — one gather instead of a separate fast_gather_rows per caller.
    """
    import jax as _jax

    from . import pallas_expand as pe

    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    n = prep.xy.shape[0]
    ok, bits_g = pe.packable(n, num_tiles)
    use_kernel = (
        pe.PALLAS_EXPAND
        and ok
        and k_cap % 128 == 0
        and k_cap <= 1 << 24  # kernel compares key positions as f32 values
        and (interpret or _jax.default_backend() not in ("cpu",))
    )
    if use_kernel:
        packed, order, total, kept, bits_g, extra_sorted = pe.expand_sorted_keys(
            prep, width, height, k_cap, cull=cull, interpret=interpret,
            geo1=geo1, geo2=geo2, extra=extra,
        )
        s = jax.lax.sort(packed, is_stable=False)
        return s >> bits_g, s & ((1 << bits_g) - 1), order, total, kept, extra_sorted
    tile, g_of_k, order, total, _, _, _, kept = _expand_keys_core(
        prep, width, height, k_cap, cull=cull, geo1=geo1, geo2=geo2
    )
    sorted_tile, g_sorted = _tile_sort(tile, g_of_k, num_tiles, n)
    extra_sorted = (
        fast_gather_rows_perm(extra, order) if extra is not None else None
    )
    return sorted_tile, g_sorted, order, total, kept, extra_sorted


def log2_opacity(opacity: jnp.ndarray) -> jnp.ndarray:
    """Stream row 9: log2(opacity), so the compositors evaluate alpha as
    one exp2(power + lopa) — the per-key opacity folds into the exponent's
    add instead of a [P, C] multiply per chunk, and the backward's d_lopa
    reuses the alpha_u * dalpha product it already forms. Clamped away from
    log2(0): a sub-1e-30 opacity yields alpha ~ 2^-99, dead at the 1/255
    threshold either way (and -inf would poison the expansion kernel's
    one-hot matmul gather with inf * 0 = NaN). Differentiable — the VJP
    chain d_lopa -> d_opacity happens here, outside the kernel."""
    return jnp.log2(jnp.maximum(opacity, 1e-30))


def conic_chol(conic: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] scaled Cholesky factor (l11, l21, l22) of the conic
    [[A,B],[B,C]], in BASE-2 exponent units.

    A dx^2 + 2B dx dy + C dy^2 = (u^2 + v^2)/log2(e) with
    u = l11 dx + l21 dy and v = l22 dy: the sqrt(log2 e) scale is folded
    into the factor here (one [N,3] multiply outside the kernels) so the
    compositor kernels evaluate alpha as opa * exp2(-0.5 (u^2+v^2)) — the
    hardware exponential without the per-element log2(e) multiply that
    jnp.exp's lowering would add to every [P, C] block. The kernels
    evaluate the exponent in 8 VPU ops instead of 11 AND the quadratic is
    non-negative by construction (the power<=0 validity test disappears;
    the conic is PSD after the +0.3 low-pass dilation, so the
    factorization is exact). Differentiable: d(l..) flows back to
    d(conic) through the sqrt chain outside the custom-VJP boundary (the
    backward kernel emits gradients wrt the SCALED rows and the chain
    rule absorbs the constant).
    """
    a = jnp.maximum(conic[:, 0], 1e-12)
    b = conic[:, 1]
    c = conic[:, 2]
    l11 = jnp.sqrt(a)
    l21 = b / l11
    l22 = jnp.sqrt(jnp.maximum(c - l21 * l21, 1e-12))
    k2 = math.sqrt(math.log2(math.e))
    return k2 * jnp.stack([l11, l21, l22], axis=1)


def bin_stream(
    prep: Preprocessed, width: int, height: int, cfg: RasterConfig,
    interpret: bool = False,
) -> StreamBins:
    """Stream binning for the Pallas compositor.

    The expensive per-key data movement is ONE row gather: the stable tile
    sort carries only the integer expansion index, and the sorted indices
    gather the 11 data columns (10 f32 + bitcast gaussian id) straight from
    the N-sized per-gaussian table. Gradients flow exclusively through that
    gather (the sort is integer-only), so the VJP is a single scatter-add.
    """
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    k_cap = cfg.max_keys
    k2 = cfg.stream_cap

    # depth-ordered per-gaussian table [N, 10], permuted inside the
    # expansion's single N-row gather. Rows 2-4 carry the conic CHOLESKY
    # factor (conic_chol), not the conic. No id column: i32 bit patterns
    # bitcast into f32 do NOT survive TPU XLA (denormal flushing in copy
    # fusions zeroes them, fusion/scale-dependently). Row order matches
    # StreamBins (depth at 8, log2-opacity at 9).
    extra = pad_cols(
        jnp.concatenate(
            [
                prep.xy,
                conic_chol(prep.conic),
                prep.color,
                prep.depth[:, None],
                log2_opacity(prep.opacity)[:, None],
            ],
            axis=1,
        ),
        DATA_ROWS_PADDED,
    )
    sorted_tile, g_sorted, order, total, kept, table = sorted_expansion(
        prep, width, height, k_cap, cull=True, interpret=interpret, extra=extra
    )

    # culled + out-of-range keys carry the num_tiles sentinel, so the stable
    # tile sort moves them past every live key: slicing the sorted stream to
    # the (smaller) post-cull capacity is the compaction, for free
    sorted_tile = sorted_tile[:k2]
    g_sorted = g_sorted[:k2]
    # the one big per-key gather, emitted directly in stream-transposed
    # form at the kernel-consumable padded row count (pad_cols at N)
    data = gather_rows_u16_t(table, g_sorted)  # [16, K2]
    # source gaussian of each key (integer gathers are flush-safe); unused
    # consumers are dead-code-eliminated under jit
    sorted_gidx = order[g_sorted].astype(jnp.int32)

    tile_start, tile_count = _tile_bounds(sorted_tile, num_tiles)
    dropped = (
        jnp.maximum(total - k_cap, 0) + jnp.maximum(kept - k2, 0)
    ).astype(jnp.int32)
    return StreamBins(data, sorted_gidx, tile_start, tile_count, dropped)


def bin_gaussians(prep: Preprocessed, width: int, height: int, cfg: RasterConfig) -> TileBins:
    """Dense-list binning for the XLA compositor (golden/autodiff path)."""
    tiles_x, tiles_y = grid_dims(width, height)
    k_cap = cfg.max_keys
    sorted_tile, sorted_pos, order, total = _expand_keys(prep, width, height, k_cap)
    tile_start, tile_count_full = _tile_bounds(sorted_tile, tiles_x * tiles_y)
    tile_count = jnp.minimum(tile_count_full, cfg.tile_list_len)

    sorted_gidx = order[jnp.maximum(sorted_pos, 0)].astype(jnp.int32)
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
