"""Differentiable Pallas rasterizer: custom-VJP compositing over a
chunk-aligned depth-sorted key stream.

Division of labor:
  * preprocess (projection/EWA/SH) is plain JAX — autodiff produces its
    exact reverse;
  * the training stream is COMPACT — identical to the eval stream: sorted
    key positions ARE stream positions (no alignment padding, no slot-id
    remap gather). The backward kernel writes gradient blocks on the
    global pallas_chunk grid; blocks straddling tiles within a program are
    merged in VMEM, and each program's lowest block (the only one another
    program can share) is emitted to a side output the caller adds back
    with one tiny scatter (see pallas_bwd);
  * the custom_vjp boundary is (per-gaussian table [N,10], integer routing,
    bg) -> tile images. Forward: one u16 row gather builds the stream
    payload (XLA's 16-bit row gather from a VMEM-sized table runs ~3x
    faster than 32-bit; bit-exact bitcast). Backward: the Pallas backward
    kernel emits per-key gradients at stream positions, and ONE unsorted
    scatter-add (padded gaussian ids, sentinel-dropped padding) reduces
    them onto gaussians. Measured on v5e at 250k/1600x1066 this replaces
    a 62 ms transposed-layout gather + 17 ms segment-sum with a 44 ms
    scatter (XLA scatter runs ~15 ns/row regardless of width; a gather
    from a >16 MB table cannot use the fast VMEM-staged path).
  * integer plumbing rides through the custom_vjp boundary as f32 VALUES
    (exact < 2^24, statically asserted) so cotangents stay well-typed.
    Never as bitcast bit patterns: TPU XLA flushes f32 denormals even in
    copy fusions, silently zeroing smuggled i32 patterns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import (
    DATA_ROWS,
    DATA_ROWS_PADDED,
    RasterConfig,
    _tile_bounds,
    conic_chol,
    gather_rows_u16_t,
    grid_dims,
    log2_opacity,
    pad_cols,
    preprocess,
    sorted_expansion,
)
from .pallas_bwd import backward_kernel_call
from .pallas_fwd import GROUP, _composite_kernel_call, tiles_cp_to_image
from .xla import RasterOutput


def _i32(x):
    """Decode integer routing carried through a float custom_vjp arg."""
    return x.astype(jnp.int32)


def _f32(x):
    """Encode integer routing as f32 VALUES for the custom_vjp boundary.

    NOT a bitcast: TPU XLA flushes f32 denormals even in copy fusions, so
    i32 bit patterns smuggled through f32 storage read back as 0 (measured
    on v5e, fusion/scale-dependent). Values are exact in f32 below 2^24 —
    every routed quantity (stream position, gaussian index, tile offset/
    count) is bounded by a static capacity asserted at trace time.
    """
    return x.astype(jnp.float32)


def compact_block_scatter(grads_padded, g_drop, tile_start, tile_count,
                          ncontrib_t, n_rows: int, cap_blocks: int,
                          useful_rows: int | None = None, sub: int = 1):
    """Per-key gradient reduction onto gaussians, visiting only the stream
    sub-blocks that can be nonzero.

    The backward kernels write gradient blocks on the global pallas_chunk
    grid but only up to each tile's max n_contrib (post-termination keys
    have zero gradient; `_hi` caps every write at
    m = min(max ncontrib, count)), so rows outside the union of active
    ranges [start, start+m) are exactly zero. XLA's scatter-add costs
    ~13-15 ns/row regardless of row content, so gathering the covered
    ranges into a static `cap`-sized compact array first cuts the scatter
    cost proportionally (the moves run at HBM bandwidth; measured 57.3%
    coverage of K_pad at bench scale). Rows past `useful_rows` (the
    kernels' zero padding to the sublane multiple) are sliced off before
    the relayout + scatter.

    Unconditionally correct: when the covered count exceeds the cap, a
    lax.cond takes the full-scatter branch instead (the exact computation
    this replaces) — an undersized cap costs speed, never gradients.

    MEASURED DEAD END (round 4, don't retry): sub > 1 (finer 32/64-lane
    granularity) loses 4-13 ms despite covering fewer rows — every
    [*, *, g<128] intermediate tiles to 128 lanes, so the gather/relayout
    moves 4-8x padding bytes. Keep sub=1 unless the layout problem is
    solved in a kernel.

    Args: grads_padded [n_blocks, R, C] from the backward kernel (zero
    outside written segments), g_drop [n_blocks*C] gaussian ids with
    out-of-stream slots at the n_rows sentinel, tile_start/count [T],
    ncontrib_t [T, 1, P] i32 forward residual, cap_blocks in CHUNK units
    (scaled to sub-blocks internally). Returns d_table
    [n_rows, useful_rows or R].
    """
    n_blocks, rows, chunk = grads_padded.shape
    k_pad = n_blocks * chunk
    if useful_rows is not None and useful_rows < rows:
        grads_padded = grads_padded[:, :useful_rows, :]
        rows = useful_rows

    def full(_):
        updates = grads_padded.transpose(0, 2, 1).reshape(k_pad, rows)
        return (jnp.zeros((n_rows, rows), jnp.float32)
                .at[g_drop].add(updates, mode="drop"))

    if not cap_blocks or cap_blocks >= n_blocks:
        return full(None)

    assert chunk % sub == 0
    g = chunk // sub
    n_sub = n_blocks * sub
    cap = cap_blocks * sub

    # covered sub-block bitmap: union of [start//g, (start+m-1)//g + 1) as
    # an interval-difference cumsum (empty tiles routed to the drop slot)
    m = jnp.minimum(jnp.max(ncontrib_t[:, 0, :], axis=1), tile_count)  # [T]
    has = m > 0
    ones = has.astype(jnp.int32)
    lo_b = jnp.where(has, tile_start // g, n_sub + 1)
    hi_b = jnp.where(has, (tile_start + m - 1) // g + 1, n_sub + 1)
    diff = (jnp.zeros(n_sub + 1, jnp.int32)
            .at[lo_b].add(ones, mode="drop")
            .at[hi_b].add(-ones, mode="drop"))
    covered = jnp.cumsum(diff[:-1]) > 0                       # [n_sub]
    pos = jnp.cumsum(covered.astype(jnp.int32)) - 1           # compact slot
    n_cov = pos[-1] + 1
    blk = jnp.arange(n_sub, dtype=jnp.int32)
    src = (jnp.zeros(cap, jnp.int32)
           .at[jnp.where(covered, pos, cap)]
           .set(blk, mode="drop"))                            # [cap] source sub-block

    def compact(_):
        # [B, R, C] -> [B*sub, R, g] sub-block axis up front (identity at
        # sub=1), then contiguous-row gathers of the covered sub-blocks
        xs = (grads_padded if sub == 1 else
              grads_padded.reshape(n_blocks, rows, sub, g)
              .transpose(0, 2, 1, 3).reshape(n_sub, rows, g))
        grads_c = jnp.take(xs, src, axis=0)                   # [cap, R, g]
        ids_c = jnp.take(g_drop.reshape(n_sub, g), src, axis=0)
        valid = jnp.arange(cap, dtype=jnp.int32) < n_cov
        ids_c = jnp.where(valid[:, None], ids_c, n_rows)      # pad -> sentinel
        updates = grads_c.transpose(0, 2, 1).reshape(cap * g, rows)
        return (jnp.zeros((n_rows, rows), jnp.float32)
                .at[ids_c.reshape(-1)].add(updates, mode="drop"))

    return jax.lax.cond(n_cov <= cap, compact, full, None)


@functools.lru_cache(maxsize=64)
def _make_composite(width: int, height: int, cfg: RasterConfig, interpret: bool):
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    chunk = cfg.pallas_chunk
    k2 = cfg.stream_cap
    # backward output capacity: the compact stream rounded up to whole
    # chunk blocks (the backward writes one [16, chunk] block per global
    # chunk-grid slot)
    k_pad = -(-k2 // chunk) * chunk

    def _build_stream(table, g_pad):
        # table arrives pre-padded to DATA_ROWS_PADDED columns (pad_cols at
        # N), so the one K-row gather emits the kernel row count directly
        data = gather_rows_u16_t(table, g_pad)  # [16, K2] transposed
        # chunk-sized tail pad so kernel DMA windows never run off the end
        return jnp.concatenate(
            [data, jnp.zeros((DATA_ROWS_PADDED, chunk), jnp.float32)], axis=1
        )

    @jax.custom_vjp
    def composite(table, g_pad_f, g_drop_f, tile_start_f, tile_count_f, bg):
        data = _build_stream(table, _i32(g_pad_f))
        color_t, depth_t, alpha_t, _ = _composite_kernel_call(
            data, _i32(tile_start_f), _i32(tile_count_f), bg,
            width=width, height=height, cfg=cfg, interpret=interpret,
        )
        return color_t, depth_t, alpha_t

    def composite_fwd(table, g_pad_f, g_drop_f, tile_start_f, tile_count_f, bg):
        g_pad = _i32(g_pad_f)
        tile_start = _i32(tile_start_f)
        tile_count = _i32(tile_count_f)
        data = _build_stream(table, g_pad)
        color_t, depth_t, alpha_t, ncontrib_t = _composite_kernel_call(
            data, tile_start, tile_count, bg,
            width=width, height=height, cfg=cfg, interpret=interpret,
        )
        res = (
            data, _i32(g_drop_f), tile_start, tile_count, bg,
            alpha_t, ncontrib_t, table.shape[0],
        )
        return (color_t, depth_t, alpha_t), res

    def composite_bwd(res, grads):
        (data, g_drop, tile_start, tile_count, bg,
         alpha_t, ncontrib_t, n_rows) = res
        g_color_t, g_depth_t, g_alpha_t = grads

        # compact stream: output chunk slots are exactly stream positions
        chunk_base = tile_start // chunk
        grads_padded = backward_kernel_call(
            data, tile_start, tile_count, chunk_base, bg,
            g_color_t, g_depth_t, g_alpha_t, alpha_t, ncontrib_t,
            width=width, height=height, cfg=cfg, k_pad=k_pad, interpret=interpret,
        )  # [K_pad/C, 16, C] blocks, zero outside written segments

        # block-compacted unsorted scatter-add onto gaussians (full-scatter
        # cond fallback inside); padding slots carry the n_rows sentinel.
        # The cotangent of the table's zero-pad columns is identically zero
        # (the kernels never read rows >= DATA_ROWS), so scatter only the
        # useful rows and pad the result back to the table width.
        d_table = compact_block_scatter(
            grads_padded, g_drop, tile_start, tile_count, ncontrib_t,
            n_rows, cfg.bwd_blocks(k_pad // chunk), useful_rows=DATA_ROWS,
        )
        d_table = jnp.concatenate(
            [d_table,
             jnp.zeros((n_rows, DATA_ROWS_PADDED - DATA_ROWS), jnp.float32)],
            axis=1,
        )

        # d_bg[c] = sum over pixels of T_final * g_color[c]
        t_final = 1.0 - alpha_t  # [T,1,P]
        d_bg = jnp.sum(t_final * g_color_t, axis=(0, 2))

        zf = lambda x: jnp.zeros_like(x, jnp.float32)  # noqa: E731
        return (d_table, jnp.zeros(k2, jnp.float32), zf(g_drop),
                zf(tile_start), zf(tile_count), d_bg)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def _compact_routing(prep_sg, width, height, cfg, cull: bool = True,
                     interpret: bool = False, geo1=None, geo2=None,
                     extra=None):
    """Integer routing for the COMPACT training stream.

    Sorted key positions are stream positions: no alignment padding and no
    slot-id remap gather (the per-slot g16 gather of the old group-aligned
    stream, ~9 ms at 1.7M keys on v5e, is gone). The backward kernel's
    side-block outputs (pallas_bwd) make cross-program chunk sharing safe.

    `extra` (optional [N, C] f32, DIFFERENTIABLE): payload table permuted
    by the depth order inside the expansion's single N-row gather.

    Returns (g_pad [K2] gather ids, g_drop [K_pad] scatter ids with
    out-of-stream slots set to a drop sentinel, tile_start [T],
    tile_count [T], dropped key count, order, extra_sorted).
    """
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    chunk = cfg.pallas_chunk
    k = cfg.max_keys
    k2 = cfg.stream_cap
    k_pad = -(-k2 // chunk) * chunk
    # routing integers ride the custom_vjp boundary as f32 VALUES (_f32)
    assert max(k, k_pad, prep_sg.xy.shape[0] + 1) <= 1 << 24

    sorted_tile, g_sorted, order, total, kept, extra_sorted = sorted_expansion(
        prep_sg, width, height, k, cull=cull, interpret=interpret,
        geo1=geo1, geo2=geo2, extra=extra,
    )
    # culled/out-of-range keys sorted past the end; the slice compacts
    sorted_tile = sorted_tile[:k2]
    g_sorted = g_sorted[:k2]
    tile_start, tile_count = _tile_bounds(sorted_tile, num_tiles)
    k_end = tile_start[-1] + tile_count[-1]  # kept total (<= k2)

    n_rows = prep_sg.xy.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 1), 0)[:, 0]
    g_ext = jnp.concatenate(
        [g_sorted, jnp.zeros(k_pad - k2, jnp.int32)]
    ) if k_pad > k2 else g_sorted
    g_drop = jnp.where(j < k_end, g_ext, n_rows)  # sentinel -> scatter drop
    dropped = jnp.maximum(total - k, 0) + jnp.maximum(kept - k2, 0)
    return g_sorted, g_drop, tile_start, tile_count, dropped, order, extra_sorted



def rasterize_pallas(
    means3d,
    opacities,
    cam,
    bg,
    *,
    shs=None,
    sh_degree: int = 0,
    colors_precomp=None,
    scales=None,
    quats=None,
    cov3d_precomp=None,
    scale_modifier: float = 1.0,
    screen_deltas=None,
    alive=None,
    cfg: RasterConfig = RasterConfig(),
    interpret: bool = False,
) -> RasterOutput:
    """Differentiable forward pass with Pallas compositing (drop-in
    replacement for rasterize_xla)."""
    w, h = cam.width, cam.height
    prep = preprocess(
        means3d, opacities, cam,
        shs=shs, sh_degree=sh_degree, colors_precomp=colors_precomp,
        scales=scales, quats=quats, cov3d_precomp=cov3d_precomp,
        scale_modifier=scale_modifier, screen_deltas=screen_deltas, alive=alive,
    )
    # integer routing (no gradients) + the differentiable payload table,
    # depth-ordered inside the expansion's single N-row gather (VJP: one
    # inverse-permutation gather through gather_rows_mixed_perm). Rows 2-4
    # carry the conic Cholesky factor; d(l..) chains back to d(conic)
    # through conic_chol's sqrt chain automatically.
    prep_sg = jax.lax.stop_gradient(prep)
    # row 9 carries log2(opacity) so the kernels fold opacity into the
    # exponent add (common.log2_opacity); autodiff chains the backward
    # kernel's d_lopa back to d_opacity through the log2 here
    extra = pad_cols(
        jnp.concatenate(
            [
                prep.xy, conic_chol(prep.conic), prep.color,
                prep.depth[:, None], log2_opacity(prep.opacity)[:, None],
            ],
            axis=1,
        ),
        DATA_ROWS_PADDED,
    )
    g_pad, g_drop, tile_start, tile_count, dropped, order, table = (
        _compact_routing(prep_sg, w, h, cfg, interpret=interpret, extra=extra)
    )

    composite = _make_composite(w, h, cfg, interpret)
    color_t, depth_t, alpha_t = composite(
        table, _f32(g_pad), _f32(g_drop),
        _f32(tile_start), _f32(tile_count), bg.astype(jnp.float32),
    )
    color = tiles_cp_to_image(color_t, w, h)
    depth = tiles_cp_to_image(depth_t, w, h)
    alpha = tiles_cp_to_image(alpha_t, w, h)
    num_dropped = dropped.astype(jnp.int32)
    return RasterOutput(color, depth, alpha, prep.radii, num_dropped, jnp.int32(0))
