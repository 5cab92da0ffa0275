"""Pallas TPU backward compositor.

Reverse-mode of the per-tile front-to-back blend, mirroring the reference
CUDA backward's structure (walk each tile's stream back-to-front,
reconstruct transmittance by progressive division, accumulate suffix sums)
but vectorized over [P pixels, C keys] blocks:

  * grid = one program per GROUP of tiles (same amortization as the
    forward kernel: per-program fixed cost dominates one-chunk tiles).
    The last chunk of every tile in the group is prefetched up front;
    within a tile the reverse walk double-buffers reads and pipelines the
    per-chunk gradient write-out (a write started for chunk ci is waited
    only when its VMEM slot is reused, possibly in the next tile);
  * forward residuals are the final transmittance (1 - alpha output) and
    `n_contrib` (number of stream positions before termination) — inclusion
    in backward is the prefix test kpos < n_contrib, exactly CUDA's
    last_contributor logic;
  * alpha is recomputed exactly as the forward computed it (quadratic-basis
    MXU exponent; see pallas_fwd), so the two kernels agree bit-for-bit on
    the alpha-threshold tests;
  * within a chunk, T_before_i = T_run / prod_{j>=i}(1-a_j) is reconstructed
    in log2 space (one triangular MXU contraction + exp2; numerically safe:
    the termination rule keeps every running product >= T_EPS, and
    alpha <= 0.99 bounds each log2 term by 6.7), and the suffix sums
    S_i = sum_{j>i} w_j u_j are one more MXU contraction;
  * per-key gradients are reduced over pixels (MXU contractions for
    color/depth, sublane reductions for the geometry terms) and written at
    COMPACT stream positions on the global chunk grid: blocks straddling
    tile boundaries inside a program are merged in VMEM by a carry
    accumulator before the single flush DMA, and the one block that can be
    shared with ANOTHER program — the program's final (lowest) carry, since
    main-flushed blocks (lo, hi] of consecutive programs provably never
    overlap once each program side-routes its lowest block — goes to a
    per-program side output plus its block index, which the caller adds
    back with one tiny scatter. No atomics, no cross-program races, and no
    alignment padding of the stream at all;
  * gradient formulas match the CUDA backward, including its treatment of
    the 0.99 alpha clamp (gradients propagate through opa*exp(power)
    unconditionally) and the exclusion of skipped/post-termination keys.

The mapping back to per-gaussian gradients happens outside: the aligned
stream makes output chunk slots coincide with stream positions, so one
unsorted scatter-add (sentinel-dropped padding) reduces them onto
gaussians (see pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import TILE, RasterConfig, grid_dims
from .pallas_fwd import (
    GROUP,
    MXU_POWER,
    SCAN_PREC,
    _acc_mm,
    _mm,
    _pixel_basis,
    _power_coefs,
    _scan_mm,
)

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
LN2 = 0.6931471805599453


def _rev_cumsum_mxu(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Suffix-inclusive sum along lanes as one MXU contraction (~2x cheaper
    than the log2(C)-step Hillis-Steele on the VPU; precision strategy
    shared with the other scan contractions via _scan_mm)."""
    return _scan_mm(x, tri)


def _suffix_tri(chunk: int) -> jnp.ndarray:
    """U[j, i] = 1 iff j >= i: x @ U = inclusive suffix sums along lanes."""
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j >= i).astype(jnp.float32)


def _bwd_kernel(
    # scalar prefetch
    tile_start_ref,   # [T_pad] i32
    tile_count_ref,   # [T_pad] i32
    chunk_base_ref,   # [T_pad] i32 (output segment offsets, in chunks)
    bg_ref,           # [4] f32
    # inputs
    data_ref,         # [16, K+pad] f32 ANY
    g_color_ref,      # [G, 3, P] VMEM block
    g_depth_ref,      # [G, 1, P]
    g_alpha_ref,      # [G, 1, P]
    alpha_out_ref,    # [G, 1, P] forward alpha (T_final = 1 - alpha)
    ncontrib_ref,     # [G, 1, P] i32
    # outputs
    out_grads_ref,    # [K_pad/C, 16, C] f32 ANY (one block per chunk slot)
    side_ref,         # [1, 16, C] f32 VMEM: this program's final carry block
    idx_ref,          # [1, 8, 128] i32 VMEM: side block's global index
                      # (broadcast over the block; Mosaic's (8,128)-divisible
                      # output-block rule forbids a [1,128] row)
    # scratch
    chunk_vmem,       # [G+2, 16, C]
    grad_vmem,        # [2, 16, C]
    sem_in,           # [G+2]
    sem_out,          # [2]
    *,
    tiles_x: int,
    chunk: int,
    group: int,
):
    pid = pl.program_id(0)
    p = TILE * TILE
    tri = _suffix_tri(chunk)
    basis = _pixel_basis(p) if MXU_POWER else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px_loc = (pix_row % TILE).astype(jnp.float32)              # [p,1]
    py_loc = (pix_row // TILE).astype(jnp.float32)
    bg = bg_ref

    def _copy_in(start, ci, slot):
        # chunk-granular base: read windows sit on the GLOBAL chunk grid,
        # so window ci of a tile is exactly output block start//chunk + ci
        # (chunk is a multiple of 128, satisfying Mosaic's lane alignment)
        base = (start // chunk) * chunk
        offset = pl.multiple_of(base + ci * chunk, 128)
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(offset, chunk)], chunk_vmem.at[slot],
            sem_in.at[slot],
        )

    def _hi(g):
        """Chunks overlapping included keys of tile pid*group+g."""
        t = pid * group + g
        start = tile_start_ref[t]
        count = tile_count_ref[t]
        head = start % chunk
        n_con = ncontrib_ref[g]                    # [1, P] i32
        max_inc = jnp.minimum(jnp.max(n_con), count)
        # 0 for empty tiles regardless of alignment (skip DMA + loop)
        return jnp.where(
            count > 0, (head + max_inc + chunk - 1) // chunk, 0
        )

    # prefetch the last chunk of every tile in the group
    for g in range(group):
        t = pid * group + g
        start = tile_start_ref[t]
        hi = _hi(g)

        @pl.when(hi > 0)
        def _(start=start, hi=hi, g=g):
            _copy_in(start, hi - 1, g).start()

    def _wait_out(slot_idx):
        pltpu.make_async_copy(
            grad_vmem.at[slot_idx], out_grads_ref.at[0], sem_out.at[slot_idx]
        ).wait()

    # Merge-carry writer. Tiles are processed in REVERSE group order and
    # each tile walks its chunks back-to-front, so the global output block
    # indices visited by this program are non-increasing. The stream is
    # COMPACT (no alignment padding): a chunk block can straddle adjacent
    # tiles' segments, so the last block of the walk may be the same block
    # the next tile touches first. The open "carry" block accumulates those
    # contributions in VMEM and is flushed (one DMA) only when a lower
    # block index appears — except the FINAL carry (the program's lowest
    # block, which may also hold keys of the PREVIOUS program's tiles):
    # that one goes to side_ref/idx_ref and is scatter-added by the caller.
    # Main flushes of program i therefore cover (lo_i, hi_i]; consecutive
    # programs satisfy hi_i <= lo_{i+1}, so no block has two main writers.
    # State threads across tiles:
    #   cblk  — open carry's global block index (-1 = none)
    #   cslot — grad_vmem slot holding the open carry
    #   w0/w1 — f32 0/1: slot's previous flush DMA still outstanding
    #           (Mosaic can't legalize i1 while-loop carries)
    carry_w = (jnp.int32(-1), jnp.int32(1), jnp.float32(0.0), jnp.float32(0.0))

    for g in reversed(range(group)):
        t = pid * group + g
        start = tile_start_ref[t]
        count = tile_count_ref[t]
        cbase = chunk_base_ref[t]
        head = start % chunk
        hi = _hi(g)
        tx_px = ((t % tiles_x) * TILE).astype(jnp.float32)
        ty_px = ((t // tiles_x) * TILE).astype(jnp.float32)

        g_c = g_color_ref[g]                       # [3, P]
        g_d = g_depth_ref[g]                       # [1, P]
        g_a = g_alpha_ref[g]                       # [1, P]
        t_final_row = 1.0 - alpha_out_ref[g]       # [1, P]
        n_con = ncontrib_ref[g]                    # [1, P] i32

        # dL/dT_final = bg . g_color - g_alpha, folded with T_final once
        g_t = bg[0] * g_c[0:1, :] + bg[1] * g_c[1:2, :] + bg[2] * g_c[2:3, :] - g_a
        gt_term = (t_final_row * g_t).reshape(p, 1)   # [p,1]
        g_cd = jnp.concatenate([g_c, g_d], axis=0)    # [4, P] color+depth
        n_con_col = n_con.reshape(p, 1)

        def body(carry, g=g, start=start, head=head, count=count, hi=hi,
                 cbase=cbase, tx_px=tx_px, ty_px=ty_px, g_cd=g_cd,
                 gt_term=gt_term, n_con_col=n_con_col):
            ci, t_run, s_run, cblk, cslot, w0, w1 = carry
            in_slot = jnp.where(ci == hi - 1, g, group + ci % 2)

            @pl.when(ci - 1 >= 0)
            def _():
                _copy_in(start, ci - 1, group + (ci - 1) % 2).start()

            _copy_in(start, ci, in_slot).wait()
            cur = chunk_vmem.at[in_slot]

            gx = cur[0:1, :]
            gy = cur[1:2, :]
            # rows 2-4: conic Cholesky factor (see common.conic_chol)
            l11 = cur[2:3, :]
            l21 = cur[3:4, :]
            l22 = cur[4:5, :]
            lopa = cur[9:10, :]                      # log2(opacity)

            dx = gx - (tx_px + px_loc)               # [p, C]
            dy = gy - (ty_px + py_loc)
            # splat-space coordinates (su, sv) = L^T (dx, dy): power is
            # their negative half norm. (Distinct from `u` below, the
            # per-pixel color cotangent.)
            su = l11 * dx + l21 * dy
            sv = l22 * dy
            if MXU_POWER:  # match the forward's alpha bit-for-bit
                coefs = _power_coefs(cur, tx_px, ty_px, chunk)
                power = _mm(basis, coefs, ((1,), (0,)))        # [p, C]
            else:
                power = -0.5 * (su * su + sv * sv)   # <= 0 by construction
            # rows 2-4 are in base-2 exponent units (common.conic_chol
            # folds sqrt(log2 e) into the factor) and row 9 folds the
            # opacity into the exponent: alpha_u = 2^(power + lopa) is the
            # forward's expression bit-for-bit
            alpha_u = jnp.exp2(power + lopa)
            alpha = jnp.minimum(ALPHA_MAX, alpha_u)
            kpos = ci * chunk + lane         # [1, C] position relative to base
            in_seg = (kpos >= head) & (kpos < head + count)
            amask = in_seg & (alpha >= ALPHA_MIN)
            alpha_eff = jnp.where(amask, alpha, 0.0)

            include = in_seg & ((kpos - head) < n_con_col)            # [p, C]
            om = jnp.where(include, 1.0 - alpha_eff, 1.0)

            # T_before_i = T_run / prod_{j>=i} om_j, in log2 space: one
            # triangular MXU contraction + exp2 (each |log2 om| <= 6.7;
            # base 2 so the ln2/log2e factors cancel between log and exp,
            # saving one [p,C] multiply inside each lowering)
            revlog = _scan_mm(jnp.log2(om), tri)    # [p, C]
            t_before = t_run * jnp.exp2(-revlog)
            w = jnp.where(include, alpha_eff * t_before, 0.0)

            # u_i(p) = c_i . g_C(p) + d_i g_D(p): one [4]-contraction over
            # the adjacent color+depth rows
            u = _acc_mm(g_cd, cur[5:9, :], ((0,), (0,)))               # [p, C]

            wu = w * u
            revsum_incl = _scan_mm(wu, tri)
            s_i = s_run + revsum_incl - wu                             # suffix j>i

            # no select: alpha_eff is already 0 outside amask, so
            # 1 - alpha_eff is exactly 1 there
            one_minus = 1.0 - alpha_eff
            dalpha = t_before * u - (s_i + gt_term) / one_minus
            emit = amask & include
            dalpha = jnp.where(emit, dalpha, 0.0)

            dpow = alpha_u * dalpha                                    # [p, C]
            d_cd = _acc_mm(g_cd, w, ((1,), (0,)))                      # [4, C]
            # L-form chain: dpower/dl11 = -su dx, /dl21 = -su dy,
            # /dl22 = -sv dy, /dx = -su l11, /dy = -(su l21 + sv l22); the
            # mean gradients need only the REDUCED Σ su·dpow and Σ sv·dpow,
            # so the per-key l.. multiplies run on [1, C] after reduction.
            # DEAD END (measured): routing these axis-0 reductions through
            # the MXU as [3,p] pixel-monomial contractions (pix3 @ ud with
            # telescoped Σ ud·dx = gxl·r_u - Σ ud·px_loc, HIGHEST f32 so no
            # VPU operand splits) regressed the bwd kernel 12.33 -> 14.29 ms
            # per-fusion on v5e at bench scale — HIGHEST's 6-pass f32
            # emulation on three [3,p]x[p,C] dots costs more than the five
            # cross-sublane reduce chains it replaces. Same failure mode as
            # the fwd kernel's masked-log/count MXU dots. Don't retry.
            # base-2 chain: alpha_u = 2^(power + lopa), so d alpha_u wrt
            # power and lopa both pick up ln2 — applied to the REDUCED
            # [1,C] rows below (cheap multiplies), never on [p,C].
            ud = su * dpow
            vd = sv * dpow
            r_u = LN2 * jnp.sum(ud, axis=0, keepdims=True)             # [1, C]
            r_v = LN2 * jnp.sum(vd, axis=0, keepdims=True)
            d_l11 = -LN2 * jnp.sum(ud * dx, axis=0, keepdims=True)
            d_l21 = -LN2 * jnp.sum(ud * dy, axis=0, keepdims=True)
            d_l22 = -LN2 * jnp.sum(vd * dy, axis=0, keepdims=True)
            d_gx = -(l11 * r_u)
            d_gy = -(l21 * r_u + l22 * r_v)
            # row 9 carries log2(opacity): d alpha_u/d lopa = ln2 alpha_u,
            # so d_lopa = ln2 Σ dpow reuses the already-formed dpow (no
            # big_g product or extra [p,C] multiply; the caller's autodiff
            # chains d_lopa -> d_opacity through the log2 outside)
            d_lopa = LN2 * jnp.sum(dpow, axis=0, keepdims=True)

            # one [16, chunk] gradient block per GLOBAL chunk block B; the
            # caller transposes each block to rows (a local (16,chunk)
            # relayout XLA does at bandwidth, forcing a row-major
            # materialization so the downstream scatter stays fast).
            # Out-of-segment lanes are exactly zero (every term above is
            # masked by in_seg), so accumulating the straddling tiles'
            # blocks is a plain add.
            # rows 5-8 = d_color, d_depth; row 9 = d_opa (matches the
            # stream/table layout so the scatter target columns line up)
            g16 = jnp.concatenate(
                [d_gx, d_gy, d_l11, d_l21, d_l22, d_cd, d_lopa,
                 jnp.zeros((6, chunk), jnp.float32)],
                axis=0,
            )                                                  # [16, C]
            B = cbase + ci
            is_merge = B == cblk
            # merge: accumulate into the open carry block
            for k in (0, 1):
                @pl.when(is_merge & (cslot == k))
                def _(k=k):
                    grad_vmem[k] = grad_vmem[k] + g16

            # open a new carry: flush the previous one (a strictly higher
            # block — visits are non-increasing, so it is complete), then
            # claim the other slot once its old flush DMA drained
            new_slot = 1 - cslot
            for k in (0, 1):
                pend = w0 if k == 0 else w1

                @pl.when(~is_merge & (new_slot == k) & (pend > 0.5))
                def _(k=k):
                    _wait_out(k)

                @pl.when(~is_merge & (cslot == k) & (cblk >= 0))
                def _(k=k):
                    pltpu.make_async_copy(
                        grad_vmem.at[k], out_grads_ref.at[cblk],
                        sem_out.at[k],
                    ).start()

                @pl.when(~is_merge & (new_slot == k))
                def _(k=k):
                    grad_vmem[k] = g16

            nm = ~is_merge
            fl0 = nm & (cslot == 0) & (cblk >= 0)
            fl1 = nm & (cslot == 1) & (cblk >= 0)
            to0 = nm & (new_slot == 0)
            to1 = nm & (new_slot == 1)
            w0 = jnp.where(to0, 0.0, jnp.where(fl0, 1.0, w0))
            w1 = jnp.where(to1, 0.0, jnp.where(fl1, 1.0, w1))
            cslot = jnp.where(nm, new_slot, cslot)
            cblk = jnp.where(nm, B, cblk)

            t_run = t_run * jnp.exp2(-revlog[:, 0:1])
            s_run = s_run + revsum_incl[:, 0:1]
            return ci - 1, t_run, s_run, cblk, cslot, w0, w1

        def cond(carry):
            ci, *_ = carry
            return ci >= 0

        t0 = t_final_row.reshape(p, 1)
        s0 = jnp.zeros((p, 1), jnp.float32)
        _, _, _, cblk, cslot, w0, w1 = jax.lax.while_loop(
            cond, body,
            (hi - 1, t0, s0, carry_w[0], carry_w[1], carry_w[2], carry_w[3]),
        )
        carry_w = (cblk, cslot, w0, w1)

    # final carry -> side output (plain VMEM copy, no DMA): its block may
    # also be written by the previous program's main flushes, so the caller
    # owns the add. Empty programs emit zeros at dummy index 0.
    cblk, cslot, w0, w1 = carry_w
    side_ref[0] = jnp.zeros((16, chunk), jnp.float32)
    for k in (0, 1):
        @pl.when((cblk >= 0) & (cslot == k))
        def _(k=k):
            side_ref[0] = grad_vmem[k]

    idx_ref[0] = jnp.broadcast_to(jnp.maximum(cblk, 0), (8, 128))

    # drain outstanding main-flush DMAs
    @pl.when(w0 > 0.5)
    def _():
        _wait_out(0)

    @pl.when(w1 > 0.5)
    def _():
        _wait_out(1)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "k_pad", "interpret")
)
def backward_kernel_call(
    data,          # [16, K+pad] (same array the forward consumed)
    tile_start,
    tile_count,
    chunk_base,    # [T] i32
    bg,
    g_color_t,     # [T, 3, P]
    g_depth_t,     # [T, 1, P]
    g_alpha_t,     # [T, 1, P]
    alpha_t,       # [T, 1, P] forward output
    ncontrib_t,    # [T, 1, P] i32
    *,
    width: int,
    height: int,
    cfg: RasterConfig,
    k_pad: int,
    interpret: bool = False,
):
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    p = TILE * TILE
    chunk = cfg.pallas_chunk
    group = GROUP
    n_groups = -(-num_tiles // group)
    t_pad = n_groups * group
    pad = t_pad - num_tiles
    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
    assert k_pad % chunk == 0
    zeros_out = jnp.zeros((k_pad // chunk, data.shape[0], chunk), jnp.float32)

    def _pad_t(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # data
            pl.BlockSpec((group, 3, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to output)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, data.shape[0], chunk), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 128), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((group + 2, data.shape[0], chunk), jnp.float32),
            pltpu.VMEM((2, data.shape[0], chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((group + 2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(ts, tc, cb, bgr, data_ref, gc, gd, ga, ao, nc, zeros_ref,
               out_ref, side_ref, idx_ref,
               chunk_vmem, grad_vmem, sem_in, sem_out):
        del zeros_ref
        _bwd_kernel(
            ts, tc, cb, bgr, data_ref, gc, gd, ga, ao, nc,
            out_ref, side_ref, idx_ref,
            chunk_vmem, grad_vmem, sem_in, sem_out,
            tiles_x=tiles_x, chunk=chunk, group=group,
        )

    out_grads, side, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_pad // chunk, data.shape[0], chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, data.shape[0], chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 8, 128), jnp.int32),
        ],
        input_output_aliases={10: 0},  # zeros input (after 4 prefetch args) -> output
        interpret=interpret,
    )(
        _pad_t(tile_start), _pad_t(tile_count), _pad_t(chunk_base), bg4,
        data, _pad_t(g_color_t), _pad_t(g_depth_t), _pad_t(g_alpha_t),
        _pad_t(alpha_t), _pad_t(ncontrib_t), zeros_out,
    )
    # each program's final (lowest) carry block, added here because its
    # block may also hold the previous program's main-flushed partials
    out_grads = out_grads.at[idx[:, 0, 0]].add(side)
    return out_grads
