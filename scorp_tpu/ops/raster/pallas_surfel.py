"""Pallas TPU forward compositor for 2DGS surfels (inference/eval path).

Mirrors pallas_fwd.py's per-tile streaming design with the surfel math of
surfel.py: the ray-splat homography UV solve runs scalarized on [P, C]
blocks, transmittance via the log-space triangular MXU contraction
(pallas_fwd._scan_mm), and the full 7-channel allmap accumulated per chunk:

  * expected depth: Σ w·z with z the per-(pixel,key) intersection depth;
  * view-space normals: one [3,C]x[P,C] MXU contraction;
  * median depth: the reference's "last contributor whose entry
    transmittance exceeds 0.5" — the in-chunk candidate is selected with a
    kpos-argmax + one-hot sum (kpos is unique per lane);
  * distortion Σ w(m²A + D2 − 2mD): telescoped into running chunk sums of
    (w, wm, wm²) — no prefix scans at all.

Training keeps the autodiff XLA path (surfel.py); this kernel serves
render_2dgs-style evaluation. Stream rows (24, sublane-aligned):
0-8 adj(M) row-major (a1, a2, a3: s = adj @ (px, py, 1), see
surfel.surfel_adj), 9-11 zrow, 12-13 center xy, 14-16 color, 17-19 view
normal, 20 log2(opacity) (common.log2_opacity), 21-23 pad. Color and
normal sit ADJACENT so the
compositors accumulate both with ONE [6,C] bf16x3 MXU contraction
(pallas_fwd._acc_mm) instead of two 6-pass HIGHEST dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (
    TILE,
    RasterConfig,
    _tile_bounds,
    gather_rows_u16_t,
    grid_dims,
    log2_opacity,
    pad_cols,
    sorted_expansion,
)
from .pallas_fwd import _acc_mm, _scan_mm, _strict_lower_tri, tiles_cp_to_image
from .surfel import (
    ALPHA_MAX,
    ALPHA_MIN,
    FAR_PLANE,
    FILTER_INV_SQUARE,
    NEAR_PLANE,
    T_EPS,
    SurfelOutput,
    SurfelPrep,
    surfel_adj,
    surfel_cull_ellipses,
    _surfel_prep_to_common,
    preprocess_surfel,
)

SURFEL_ROWS = 24
NC2 = -0.5 * 1.4426950408889634  # -0.5 * log2(e)

# diagnosis-only toggles (scripts/profile_fusions.py): skip pieces of the
# eval body to attribute its cost (the body runs ~5x its VPU-throughput
# bound where the 3DGS body runs ~2.6x). NEVER set in production — they
# change the output semantics.
import os as _os
_DIAG_SKIP_MED = _os.environ.get("DIAG_2D_SKIP_MED", "") == "1"
_DIAG_SKIP_DIST = _os.environ.get("DIAG_2D_SKIP_DIST", "") == "1"
_DIAG_SKIP_UV = _os.environ.get("DIAG_2D_SKIP_UV", "") == "1"


def surfel_stream(prep: SurfelPrep, width: int, height: int, cfg: RasterConfig,
                  interpret: bool = False):
    """Depth-ordered per-tile surfel stream [24, K2] + tile ranges.

    Exact alpha>=1/255 tile cull: {rho3d <= t2} projects to a screen conic
    (the UV-disk under the splat homography) and {rho2d <= t2} is the
    low-pass circle — surfel_cull_ellipses completes both to the centered
    quadratic form the shared expansion cull evaluates, keeping a key iff
    EITHER passes (alpha = opa exp(-min(rho3d, rho2d)/2)). Culled keys have
    alpha < 1/255 at every pixel of their tile, so outputs are unchanged
    while the stream (and every downstream stage) shrinks; the post-cull
    slice to cfg.stream_cap is the compaction, for free.
    """
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    k_cap = cfg.max_keys
    k2 = cfg.stream_cap

    common = _surfel_prep_to_common(prep)
    ell, circ = surfel_cull_ellipses(prep)
    adj = surfel_adj(prep.M)  # [N, 9]: s = adj @ (px, py, 1)
    # payload table [N, 21], permuted inside the expansion's single N-row
    # u16 gather (~3x the 32-bit row-gather throughput)
    extra = pad_cols(
        jnp.concatenate(
            [adj, prep.zrow, prep.xy, prep.color, prep.normal,
             log2_opacity(prep.opacity)[:, None]],
            axis=1,
        ),
        SURFEL_ROWS,
    )
    sorted_tile, g_sorted, order, total, kept, table = sorted_expansion(
        common, width, height, k_cap, cull=True, interpret=interpret,
        geo1=ell, geo2=circ, extra=extra,
    )

    sorted_tile = sorted_tile[:k2]
    g_sorted = g_sorted[:k2]
    # pre-padded table (pad_cols at N): the gather emits [24, K2] directly
    data = gather_rows_u16_t(table, g_sorted)
    tile_start, tile_count = _tile_bounds(sorted_tile, num_tiles)
    dropped = (
        jnp.maximum(total - k_cap, 0) + jnp.maximum(kept - k2, 0)
    ).astype(jnp.int32)
    return data, tile_start, tile_count, dropped


GROUP2D = 8  # tiles per program (GROUP2D=16 measured a wash: 29.68 vs 29.76)
# Round-5 attribution sweep (profile_fusions render2d, v5e, bench scale,
# per-fusion times): composite 29.76 ms paired. DIAG skips: UV solve only
# -1.9 ms (pre-scan work hides under the MXU scan), median -4.5, distortion
# -6.6, ALL THREE -10.7 (19.1 ms floor). PAIR2D=False measured FASTER
# (28.70 vs 29.76): unlike the lean 3DGS body (7.91 -> 7.06 with pairing),
# the fat surfel body's doubled live state costs more in register/VMEM
# pressure than the overlapped chains win back. pallas_chunk=256 (half the
# serial visits) is also a wash (27.97): the body is THROUGHPUT-bound on
# its post-scan op count, not visit latency — real cuts must remove ops or
# keys, and the med/dist/Σwz bookkeeping is the reference's channel
# contract. Keep the serial loop.
PAIR2D = False


def _surfel_fwd_kernel(
    tile_start_ref, tile_count_ref, bg_ref,
    data_ref,
    out_color_ref,    # [G, 3, P]
    out_alpha_ref,    # [G, 1, P]
    out_depth_ref,    # [G, 1, P]
    out_normal_ref,   # [G, 3, P]
    out_median_ref,   # [G, 1, P]
    out_dist_ref,     # [G, 1, P]
    chunk_vmem, sem,
    *, tiles_x: int, chunk: int, group: int,
):
    pid = pl.program_id(0)
    p = TILE * TILE
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px_loc = (pix_row % TILE).astype(jnp.float32)
    py_loc = (pix_row // TILE).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    lane_f = lane.astype(jnp.float32)
    ltri = _strict_lower_tri(chunk)

    def _copy(start, ci, slot):
        base = (start // 128) * 128
        offset = pl.multiple_of(base + ci * chunk, 128)
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(offset, chunk)], chunk_vmem.at[slot], sem.at[slot]
        )

    def _n_chunks(start, count):
        head = start - (start // 128) * 128
        return jnp.where(count > 0, (head + count + chunk - 1) // chunk, 0)

    # hide HBM latency: chunk 0 of every tile in the group goes in flight now
    for g in range(group):
        t = pid * group + g
        start = tile_start_ref[t]

        @pl.when(tile_count_ref[t] > 0)
        def _(start=start, g=g):
            _copy(start, jnp.int32(0), g).start()

    def _chunk_math(cur, ci, head, count, pix_x, pix_y, carry):
        """One [p, C] surfel chunk body: UV solve -> alpha -> scan -> blend
        -> median/distortion bookkeeping. Pure math shared by the
        single-tile and PAIR-interleaved loops; safe on masked/stale chunks
        (kpos outside [head, head+count) zeroes alpha, making every update
        a no-op; never-DMA'd slots are zeroed at program start so the math
        runs on finite values)."""
        (t_carry, acc_cn, acc_d, med, acc_dist, a_run, d_run, d2_run) = carry
        # adj(M) rows: s = adj @ (px, py, 1) — the ray-splat solve is
        # LINEAR in the pixel (see surfel.surfel_adj)
        a1x, a1y, a1z = cur[0:1, :], cur[1:2, :], cur[2:3, :]
        a2x, a2y, a2z = cur[3:4, :], cur[4:5, :], cur[5:6, :]
        a3x, a3y, a3z = cur[6:7, :], cur[7:8, :], cur[8:9, :]
        zu, zv, zc = cur[9:10, :], cur[10:11, :], cur[11:12, :]
        cx, cy = cur[12:13, :], cur[13:14, :]
        lopa = cur[20:21, :]                   # log2(opacity)

        if _DIAG_SKIP_UV:
            # cost probe: alpha from the low-pass circle only (no ray-splat
            # solve, no divide)
            dx = cx - pix_x
            dy = cy - pix_y
            rho = FILTER_INV_SQUARE * (dx * dx + dy * dy)
            alpha = jnp.minimum(ALPHA_MAX, jnp.exp2(NC2 * rho + lopa))
            z = zc * jnp.ones_like(alpha)
        else:
            sx = a1x * pix_x + a1y * pix_y + a1z       # [p, C]
            sy = a2x * pix_x + a2y * pix_y + a2z
            s_z = a3x * pix_x + a3y * pix_y + a3z
            sz = jnp.where(jnp.abs(s_z) > 1e-9, s_z, 1e-9)
            rz = 1.0 / sz  # one divide + two muls beats two divides
            u = jnp.clip(sx * rz, -1e3, 1e3)
            v = jnp.clip(sy * rz, -1e3, 1e3)

            rho3d = u * u + v * v
            dx = cx - pix_x
            dy = cy - pix_y
            rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
            use3d = rho3d <= rho2d
            rho = jnp.minimum(rho3d, rho2d)
            # ONE exp2: -0.5*log2(e) folded into a constant multiply and
            # the opacity folded into the exponent add (row 20 = log2 opa;
            # pallas_surfel_train._surfel_geometry has the derivation)
            alpha = jnp.minimum(ALPHA_MAX, jnp.exp2(NC2 * rho + lopa))
            z = jnp.where(use3d, u * zu + v * zv + zc, zc)
        kpos = ci * chunk + lane
        valid = (kpos >= head) & (kpos < head + count)
        alpha = jnp.where(valid & (alpha >= ALPHA_MIN) & (z >= NEAR_PLANE), alpha, 0.0)

        # exclusive (1-alpha) product in log space: one triangular MXU
        # contraction replaces the log2(C)-step Hillis-Steele (pallas_fwd)
        # base-2 scan: the ln2/log2e factors cancel between log and
        # exp, saving one [p,C] multiply per lowering (pallas_fwd)
        om = 1.0 - alpha
        cum_excl = jnp.exp2(_scan_mm(jnp.log2(om), ltri))
        t_before = t_carry * cum_excl
        t_after = t_before * om
        # sticky-stop via the ZEROED running carry (see pallas_fwd):
        # once the last lane crosses T_EPS the carry is 0 and the
        # prefix test excludes everything — no flag, no [p,C] AND
        include = t_after >= T_EPS
        w = jnp.where(include, alpha * t_before, 0.0)

        # color+normal accumulate in ONE [6, C] x [C, p] bf16x3
        # contraction (rows 14-19 adjacent by stream layout)
        acc_cn = acc_cn + _acc_mm(cur[14:20, :], w, ((1,), (1,)))
        acc_d = acc_d + jnp.sum(w * z, axis=1, keepdims=True)

        if not _DIAG_SKIP_MED:
            # median: z of the last included key with entry transmittance > 0.5
            cond = include & (t_before > 0.5) & (alpha > 0.0)
            r = jnp.where(cond, lane_f, -1.0)
            kbest = jnp.max(r, axis=1, keepdims=True)
            zsel = jnp.sum(jnp.where((r == kbest) & cond, z, 0.0), axis=1, keepdims=True)
            med = jnp.where(kbest >= 0.0, zsel, med)

        # distortion with cross-chunk (A, D, D2) carries. The in-chunk
        # pair sum TELESCOPES: sum_i w_i (m_i^2 A_pre_i + D2_pre_i -
        # 2 m_i D_pre_i) = a_run*S2 + d2_run*S0 - 2 d_run*S1 +
        # (S0*S2 - S1^2) with S0/S1/S2 the plain chunk sums of
        # w/wm/wm2 (each unordered pair {i,j} contributes
        # w_i w_j (m_i - m_j)^2 exactly once) — no prefix scans at all.
        # The three triangular MXU contractions this replaces were the
        # surfel compositor's MXU bottleneck (256 rows x 2 bf16 passes
        # each). Sums <= 1 (transmittance), so the S0*S2 - S1^2
        # cancellation costs ~1e-7 absolute.
        if _DIAG_SKIP_DIST:
            # cost probe: keep only the Σw carry (the alpha output needs it)
            a_run = a_run + jnp.sum(w, axis=1, keepdims=True)
        else:
            # m = FF (1 - NEAR/z) folded to FF - FFN/z: one fewer [p,C] op
            ff = FAR_PLANE / (FAR_PLANE - NEAR_PLANE)
            m = ff - (ff * NEAR_PLANE) / jnp.maximum(z, 1e-6)
            wm = w * m
            wm2 = wm * m
            s0 = jnp.sum(w, axis=1, keepdims=True)
            s1 = jnp.sum(wm, axis=1, keepdims=True)
            s2 = jnp.sum(wm2, axis=1, keepdims=True)
            acc_dist = acc_dist + (
                a_run * s2 + d2_run * s0 - 2.0 * d_run * s1 + s0 * s2 - s1 * s1
            )
            a_run = a_run + s0
            d_run = d_run + s1
            d2_run = d2_run + s2

        # Next-chunk carry = the chunk's full product (last-lane
        # t_after), ZEROED once it crosses T_EPS so every later chunk
        # excludes itself through the prefix test. The OUTPUT
        # transmittance is free from the distortion bookkeeping
        # (a_run = Σ w telescopes to 1 - T_terminated over the included
        # prefix), never this carry. No min-reduce, no sticky flag.
        last = t_after[:, chunk - 1 : chunk]
        t_carry = jnp.where(last < T_EPS, 0.0, last)
        return (t_carry, acc_cn, acc_d, med, acc_dist, a_run, d_run, d2_run)

    def _tile_out(g, carry):
        (_, acc_cn, acc_d, med, acc_dist, a_run, *_rest) = carry
        acc_c, acc_n = acc_cn[:3], acc_cn[3:]
        # a_run = Σ weight = 1 - T_terminated (telescoped, see the body)
        t_row = (1.0 - a_run).reshape(1, p)
        bg = bg_ref
        out_color_ref[g, 0, :] = acc_c[0, :] + t_row[0, :] * bg[0]
        out_color_ref[g, 1, :] = acc_c[1, :] + t_row[0, :] * bg[1]
        out_color_ref[g, 2, :] = acc_c[2, :] + t_row[0, :] * bg[2]
        out_alpha_ref[g, 0, :] = 1.0 - t_row[0, :]
        out_depth_ref[g, 0, :] = acc_d.reshape(1, p)[0, :]
        out_normal_ref[g] = acc_n
        out_median_ref[g, 0, :] = med.reshape(1, p)[0, :]
        out_dist_ref[g, 0, :] = acc_dist.reshape(1, p)[0, :]

    zeros1 = jnp.zeros((p, 1), jnp.float32)
    carry0 = (
        jnp.ones((p, 1), jnp.float32),
        jnp.zeros((6, p), jnp.float32), zeros1,
        zeros1, zeros1, zeros1, zeros1, zeros1,
    )

    if PAIR2D:
        # PAIR-INTERLEAVED loop (see pallas_fwd's PAIR_TILES block for the
        # rationale and the DMA-slot discipline): two tiles' chunk chains
        # share one while body; rotating slots split even/odd per member.
        assert group % 2 == 0
        # zero the rotating + chunk-0 slots of empty tiles once: stale
        # reads of a never-DMA'd slot would feed uninitialized VMEM into
        # the masked math (w=0 rows cannot mask NaN: 0 * NaN)
        zero_slot = jnp.zeros(chunk_vmem.shape[1:], jnp.float32)
        for s in range(6):
            chunk_vmem[group + s] = zero_slot
        for g in range(group):
            t = pid * group + g

            @pl.when(tile_count_ref[t] == 0)
            def _(g=g):
                chunk_vmem[g] = zero_slot

        for g2 in range(group // 2):
            gA, gB = 2 * g2, 2 * g2 + 1
            tA = pid * group + gA
            tB = tA + 1
            startA = tile_start_ref[tA]
            countA = tile_count_ref[tA]
            headA = startA - (startA // 128) * 128
            nA = _n_chunks(startA, countA)
            startB = tile_start_ref[tB]
            countB = tile_count_ref[tB]
            headB = startB - (startB // 128) * 128
            nB = _n_chunks(startB, countB)

            def _pix(t):
                tx = (t % tiles_x).astype(jnp.float32)
                ty = (t // tiles_x).astype(jnp.float32)
                return (tx * TILE) + px_loc, (ty * TILE) + py_loc

            pixA = _pix(tA)
            pixB = _pix(tB)

            # chunk-1 prefetches (chunk 0 went in flight at program start)
            @pl.when(nA > 1)
            def _(startA=startA):
                _copy(startA, jnp.int32(1), group + 0).start()

            @pl.when(nB > 1)
            def _(startB=startB):
                _copy(startB, jnp.int32(1), group + 1).start()

            def pair_body(carry, gA=gA, gB=gB, startA=startA, headA=headA,
                          countA=countA, nA=nA, pixA=pixA, startB=startB,
                          headB=headB, countB=countB, nB=nB, pixB=pixB):
                ci, cA, cB = carry
                sA = jnp.where(ci == 0, gA, group + 2 * ((ci - 1) % 3))
                sB = jnp.where(ci == 0, gB, group + 2 * ((ci - 1) % 3) + 1)

                # DMA start/wait guards must pair exactly (CLAUDE.md
                # kernel-fault warning): both condition on ci vs n
                @pl.when(ci < nA)
                def _(sA=sA):
                    _copy(startA, ci, sA).wait()

                @pl.when(ci + 2 < nA)
                def _():
                    _copy(startA, ci + 2, group + 2 * ((ci + 1) % 3)).start()

                @pl.when(ci < nB)
                def _(sB=sB):
                    _copy(startB, ci, sB).wait()

                @pl.when(ci + 2 < nB)
                def _():
                    _copy(
                        startB, ci + 2, group + 2 * ((ci + 1) % 3) + 1
                    ).start()

                cA = _chunk_math(chunk_vmem.at[sA], ci, headA, countA,
                                 pixA[0], pixA[1], cA)
                cB = _chunk_math(chunk_vmem.at[sB], ci, headB, countB,
                                 pixB[0], pixB[1], cB)
                return (ci + 1, cA, cB)

            def pair_cond(carry, nA=nA, nB=nB):
                ci, cA, cB = carry
                aliveA = (ci < nA) & (jnp.max(cA[0]) >= T_EPS)
                aliveB = (ci < nB) & (jnp.max(cB[0]) >= T_EPS)
                return aliveA | aliveB

            ci_final, cA, cB = jax.lax.while_loop(
                pair_cond, pair_body, (jnp.int32(0), carry0, carry0)
            )

            # drain in-flight prefetches (2-deep pipeline per member)
            for d in (0, 1):
                @pl.when(ci_final + d < nA)
                def _(gA=gA, startA=startA, ci_final=ci_final, d=d):
                    ci_d = ci_final + d
                    slot = jnp.where(
                        ci_d == 0, gA, group + 2 * ((ci_d - 1) % 3)
                    )
                    _copy(startA, ci_d, slot).wait()

                @pl.when(ci_final + d < nB)
                def _(gB=gB, startB=startB, ci_final=ci_final, d=d):
                    ci_d = ci_final + d
                    slot = jnp.where(
                        ci_d == 0, gB, group + 2 * ((ci_d - 1) % 3) + 1
                    )
                    _copy(startB, ci_d, slot).wait()

            _tile_out(gA, cA)
            _tile_out(gB, cB)
        return

    for g in range(group):
        t = pid * group + g
        start = tile_start_ref[t]
        count = tile_count_ref[t]
        head = start - (start // 128) * 128
        n_chunks = _n_chunks(start, count)
        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        pix_x = (tx * TILE) + px_loc
        pix_y = (ty * TILE) + py_loc

        # 2-deep pipeline: chunk 1 in flight before the loop, each iteration
        # prefetches ci+2 (see pallas_fwd)
        @pl.when(n_chunks > 1)
        def _(start=start):
            _copy(start, jnp.int32(1), group).start()

        def body(carry, g=g, start=start, head=head, count=count,
                 n_chunks=n_chunks, pix_x=pix_x, pix_y=pix_y):
            ci, inner = carry
            slot = jnp.where(ci == 0, g, group + (ci - 1) % 3)
            _copy(start, ci, slot).wait()

            @pl.when(ci + 2 < n_chunks)
            def _():
                _copy(start, ci + 2, group + (ci + 1) % 3).start()

            inner = _chunk_math(chunk_vmem.at[slot], ci, head, count,
                                pix_x, pix_y, inner)
            return (ci + 1, inner)

        def cond_fn(carry, n_chunks=n_chunks):
            ci, inner = carry
            return (ci < n_chunks) & (jnp.max(inner[0]) >= T_EPS)

        ci_final, inner = jax.lax.while_loop(
            cond_fn, body, (jnp.int32(0), carry0)
        )

        # drain in-flight prefetches on early exit (2-deep pipeline)
        for d in (0, 1):
            @pl.when(ci_final + d < n_chunks)
            def _(g=g, start=start, ci_final=ci_final, d=d):
                ci_d = ci_final + d
                slot = jnp.where(ci_d == 0, g, group + (ci_d - 1) % 3)
                _copy(start, ci_d, slot).wait()

        _tile_out(g, inner)


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg", "interpret"))
def _surfel_kernel_call(data, tile_start, tile_count, bg, *, width, height, cfg,
                        interpret=False):
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    p = TILE * TILE
    chunk = cfg.pallas_chunk
    group = GROUP2D
    n_groups = -(-num_tiles // group)
    t_pad = n_groups * group
    pad = t_pad - num_tiles
    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
    tile_start_p = jnp.pad(tile_start, (0, pad))
    tile_count_p = jnp.pad(tile_count, (0, pad))

    # rotating DMA slots: 6 for the pair-interleaved loop (3 per member,
    # even/odd), 3 for the serial loop's 2-deep prefetch
    n_slots = group + (6 if PAIR2D else 3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((group, 3, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 3, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, SURFEL_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    kernel = functools.partial(_surfel_fwd_kernel, tiles_x=tiles_x, chunk=chunk,
                               group=group)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
        ],
        interpret=interpret,
    )(tile_start_p, tile_count_p, bg4, data)
    return tuple(o[:num_tiles] for o in outs)


def rasterize_surfel_pallas_fwd_only(
    means3d, opacities, cam, bg, *,
    shs=None, sh_degree: int = 0, colors_precomp=None,
    scales=None, quats=None, scale_modifier: float = 1.0,
    screen_deltas=None, alive=None, cfg: RasterConfig = RasterConfig(),
    interpret: bool = False,
) -> SurfelOutput:
    """Non-differentiable surfel forward (render_2dgs eval path)."""
    w, h = cam.width, cam.height
    prep = preprocess_surfel(
        means3d, opacities, cam, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scales=scales, quats=quats,
        scale_modifier=scale_modifier, screen_deltas=screen_deltas, alive=alive,
    )
    data, tile_start, tile_count, dropped = surfel_stream(prep, w, h, cfg,
                                                           interpret=interpret)
    data = jnp.concatenate(
        [data, jnp.zeros((SURFEL_ROWS, cfg.pallas_chunk), jnp.float32)], axis=1
    )
    color_t, alpha_t, depth_t, normal_t, median_t, dist_t = _surfel_kernel_call(
        data, tile_start, tile_count, bg, width=w, height=h, cfg=cfg,
        interpret=interpret,
    )
    return SurfelOutput(
        tiles_cp_to_image(color_t, w, h),
        tiles_cp_to_image(alpha_t, w, h),
        tiles_cp_to_image(depth_t, w, h),
        tiles_cp_to_image(normal_t, w, h),
        tiles_cp_to_image(median_t, w, h),
        tiles_cp_to_image(dist_t, w, h),
        prep.radii, dropped, jnp.int32(0),
    )
