"""Differentiable Pallas 2DGS surfel rasterizer (training path).

Mirrors pallas.py's COMPACT-stream custom-VJP design with the surfel math
of pallas_surfel.py, replacing the XLA-autodiff training path (~1 s/step
at kitchen scale). Gradient semantics match the reference
diff-surfel-rasterization backward (loss use at
/root/reference/train_2dgs.py:141-150, channel contract at
gs2dgs/gaussian_renderer/__init__.py:111-154):

  * forward kernel = the eval kernel plus training residuals: n_contrib
    (position of the last contributing key, reference last_contributor),
    n_med (position of the median-depth contributor), and the per-pixel
    distortion moments sum(w*m), sum(w*m^2);
  * the distortion VJP needs only those totals: with A = sum(w) = alpha
    output, dL/dw_i collapses to m^2(A-w) + (D2-w m^2) - 2m(D-w m) and
    dL/dm_i to 2w(m(A-w) - (D-w m)) because prefix+suffix sums telescope;
  * the backward kernel re-walks each tile back-to-front like
    pallas_bwd.py (log-space transmittance reconstruction and suffix sums
    of w*u as triangular MXU contractions, double-buffered reads and
    pipelined gradient write-out), recomputes the ray-splat homography,
    and emits
    per-key gradients for all 21 stream rows (adj(M) 9, zrow 3, center xy
    2, color 3, normal 3, opacity 1) at COMPACT stream positions on the
    global chunk grid, side-routing each program's final carry block (the
    only block another program can share) exactly like pallas_bwd;
  * gradients through the alpha=0.99 clamp propagate unconditionally
    (CUDA semantics); u,v clip gates and the rho3d/rho2d min-branch follow
    the XLA path's autodiff exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (
    RasterConfig,
    TILE,
    gather_rows_u16_t,
    grid_dims,
    log2_opacity,
    pad_cols,
)
from .pallas import _compact_routing, _f32, _i32, compact_block_scatter
from .pallas_fwd import _acc_mm, _scan_mm, _strict_lower_tri, tiles_cp_to_image
from .pallas_bwd import LN2, _rev_cumsum_mxu, _suffix_tri
from .pallas_surfel import SURFEL_ROWS
from .surfel import (
    ALPHA_MAX,
    ALPHA_MIN,
    FAR_PLANE,
    FILTER_INV_SQUARE,
    NEAR_PLANE,
    T_EPS,
    SurfelOutput,
    _surfel_prep_to_common,
    preprocess_surfel,
    surfel_adj,
    surfel_cull_ellipses,
)

FF = FAR_PLANE / (FAR_PLANE - NEAR_PLANE)
NC = -0.5 * 1.4426950408889634  # -0.5 * log2(e): base-2 exponent


def _surfel_geometry(cur, pix_x, pix_y):
    """Shared fwd/bwd recompute: stream chunk -> per-(pixel,key) quantities.

    Stream rows 0-8 carry adj(M) (a1 a2 a3 row-major): the ray-splat solve
    is the LINEAR form s = adj @ (px, py, 1) (see surfel.surfel_adj) —
    three 2-FMA rows instead of the homogeneous-cross chain. fwd and bwd
    share this helper, so both passes agree bit-for-bit on alpha.
    """
    a1x, a1y, a1z = cur[0:1, :], cur[1:2, :], cur[2:3, :]
    a2x, a2y, a2z = cur[3:4, :], cur[4:5, :], cur[5:6, :]
    a3x, a3y, a3z = cur[6:7, :], cur[7:8, :], cur[8:9, :]
    zu, zv, zc = cur[9:10, :], cur[10:11, :], cur[11:12, :]
    cx, cy = cur[12:13, :], cur[13:14, :]
    lopa = cur[20:21, :]                      # log2(opacity)

    sx = a1x * pix_x + a1y * pix_y + a1z      # [p, C]
    sy = a2x * pix_x + a2y * pix_y + a2z
    s_z = a3x * pix_x + a3y * pix_y + a3z
    sz = jnp.where(jnp.abs(s_z) > 1e-9, s_z, 1e-9)
    rz = 1.0 / sz
    u_raw = sx * rz
    v_raw = sy * rz
    u = jnp.clip(u_raw, -1e3, 1e3)
    v = jnp.clip(v_raw, -1e3, 1e3)

    rho3d = u * u + v * v
    dx = cx - pix_x
    dy = cy - pix_y
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    # ONE exp2 with the -0.5*log2(e) folded into a constant multiply and
    # the opacity folded into the exponent's add (row 20 carries
    # log2(opacity), see common.log2_opacity): alpha_u = opa exp(-rho/2)
    # bit-for-bit between fwd and bwd. The rho gradient chain is
    # UNCHANGED: d alpha_u/d rho = NC*ln2*alpha_u = -0.5*alpha_u, and
    # d alpha_u/d lopa = ln2*alpha_u (the bwd reuses its drho product).
    alpha_u = jnp.exp2(NC * rho + lopa)
    alpha = jnp.minimum(ALPHA_MAX, alpha_u)
    z = jnp.where(use3d, u * zu + v * zv + zc, zc)
    return dict(
        s=(sx, sy, s_z), sz=sz,
        rz=rz, u_raw=u_raw, v_raw=v_raw, u=u, v=v, use3d=use3d,
        dx=dx, dy=dy, alpha_u=alpha_u, alpha=alpha, z=z,
        zu=zu, zv=zv,
    )


GROUP2D_TRAIN = 8  # tiles per training program (fwd and bwd share it: the
                   # bwd merge-carry accumulates a group's tile-straddling
                   # chunk blocks in VMEM within one program)
# Round-5 measurement: pairing HURTS the fat surfel bodies (see
# pallas_surfel.PAIR2D — eval 29.76 paired vs 28.70 unpaired). The training
# body carries 11 loop tensors; pairing doubles the live state and the
# register/VMEM pressure costs more than the overlapped chains win back.
# The BACKWARD kernel is NOT paired either way: its merge-carry writer
# requires strictly non-increasing global block visits across tiles, which
# interleaving two tiles would break.
PAIR2D_TRAIN = False


def _surfel_train_fwd_kernel(
    tile_start_ref, tile_count_ref, bg_ref,
    data_ref,
    out_color_ref,    # [G, 3, P]
    out_alpha_ref,    # [G, 1, P]
    out_depth_ref,    # [G, 1, P]
    out_normal_ref,   # [G, 3, P]
    out_median_ref,   # [G, 1, P]
    out_dist_ref,     # [G, 1, P]
    out_ncon_ref,     # [G, 1, P] i32
    out_nmed_ref,     # [G, 1, P] i32
    out_wm_ref,       # [G, 1, P] sum(w*m)
    out_wm2_ref,      # [G, 1, P] sum(w*m^2)
    chunk_vmem, sem,
    *, tiles_x: int, chunk: int, group: int,
):
    pid = pl.program_id(0)
    p = TILE * TILE
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px_loc = (pix_row % TILE).astype(jnp.float32)
    py_loc = (pix_row // TILE).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ltri = _strict_lower_tri(chunk)

    def _copy(start, ci, slot):
        # chunk-granular base: read windows sit on the global chunk grid
        # (compact stream: a tile may start mid-chunk)
        base = (start // chunk) * chunk
        offset = pl.multiple_of(base + ci * chunk, 128)
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(offset, chunk)], chunk_vmem.at[slot], sem.at[slot]
        )

    def _n_chunks(start, count):
        head = start % chunk
        return jnp.where(count > 0, (head + count + chunk - 1) // chunk, 0)

    # chunk 0 of every tile in the group goes in flight up front
    for g in range(group):
        t = pid * group + g
        start = tile_start_ref[t]

        @pl.when(tile_count_ref[t] > 0)
        def _(start=start, g=g):
            _copy(start, jnp.int32(0), g).start()

    def _chunk_math(cur, ci, head, count, pix_x, pix_y, carry):
        """One [p, C] train-forward chunk body (eval math + n_contrib /
        n_med / t_term residuals). Shared by the serial and PAIR loops;
        safe on masked/stale chunks — kpos outside [head, head+count)
        zeroes alpha, and never-DMA'd slots are zeroed at program start."""
        (t_run, t_term, acc_cn, acc_d, med, acc_dist,
         a_run, d_run, d2_run, n_con, n_med) = carry
        geo = _surfel_geometry(cur, pix_x, pix_y)
        alpha, z = geo["alpha"], geo["z"]
        kpos = ci * chunk + lane
        valid = (kpos >= head) & (kpos < head + count)
        alpha = jnp.where(
            valid & (alpha >= ALPHA_MIN) & (z >= NEAR_PLANE), alpha, 0.0
        )

        # exclusive (1-alpha) product in log space: one triangular MXU
        # contraction replaces the log2(C)-step Hillis-Steele (see pallas_fwd)
        # base-2 scan: the ln2/log2e factors cancel between log and
        # exp, saving one [p,C] multiply per lowering (pallas_fwd)
        om = 1.0 - alpha
        logx = jnp.log2(om)
        cum_excl = jnp.exp2(_scan_mm(logx, ltri))
        t_before = t_run * cum_excl
        t_after = t_before * om
        # sticky-stop via the ZEROED running carry (see pallas_fwd):
        # once the last lane crosses T_EPS the carry is 0, t_after
        # stays 0 and the prefix test excludes everything — no flag
        include = t_after >= T_EPS
        w = jnp.where(include, alpha * t_before, 0.0)

        # color+normal accumulate in ONE [6, C] x [C, p] bf16x3
        # contraction (rows 14-19 adjacent by stream layout)
        acc_cn = acc_cn + _acc_mm(cur[14:20, :], w, ((1,), (1,)))
        acc_d = acc_d + jnp.sum(w * z, axis=1, keepdims=True)

        contrib = jnp.logical_and(include, alpha > 0.0)
        # f32 position bookkeeping (exact < 2^24; i32 cast once per tile):
        # the f32 max-reduces lower better than i32 (pallas_fwd round-5)
        pos1 = ((kpos - head) + 1).astype(jnp.float32)
        n_con = jnp.maximum(
            n_con,
            jnp.max(jnp.where(contrib, pos1, 0.0), axis=1, keepdims=True),
        )

        # median: last contributor with entry transmittance > 0.5
        cond = contrib & (t_before > 0.5)
        r = jnp.max(jnp.where(cond, pos1, 0.0), axis=1, keepdims=True)
        zsel = jnp.sum(jnp.where(pos1 == r, z, 0.0), axis=1, keepdims=True)
        has = r > 0.0
        med = jnp.where(has, zsel, med)
        n_med = jnp.where(has, r, n_med)

        # telescoped distortion: the in-chunk pair sum equals
        # a_run*S2 + d2_run*S0 - 2 d_run*S1 + (S0*S2 - S1^2) with
        # S0/S1/S2 the chunk sums of w/wm/wm2 — no prefix scans
        # (see pallas_surfel.py; removes the compositor's three
        # triangular MXU contractions)
        # FF (1 - NEAR/z) folded to FF - FFN/z: one fewer [p,C] op
        m = FF - (FF * NEAR_PLANE) / jnp.maximum(z, 1e-6)
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

        # t_term = the smallest included t_after (the included set is a
        # per-pixel prefix) — the terminated transmittance the backward
        # reconstructs t_before from. Accumulated as the LOG-SUM of
        # included om (one masked lane SUM per chunk, exp2 once per
        # tile): exact to ~1e-6 RELATIVE — crucially NOT the cancellative
        # 1 - Σweight form (see pallas_fwd's t_term note).
        t_term = t_term + jnp.sum(
            jnp.where(include, logx, 0.0), axis=1, keepdims=True
        )
        last = t_after[:, chunk - 1 : chunk]
        t_run = jnp.where(last < T_EPS, 0.0, last)
        return (t_run, t_term, acc_cn, acc_d, med, acc_dist,
                a_run, d_run, d2_run, n_con, n_med)

    def _tile_out(g, carry):
        (_, t_term, acc_cn, acc_d, med, acc_dist,
         a_run, d_run, d2_run, n_con, n_med) = carry
        acc_c, acc_n = acc_cn[:3], acc_cn[3:]
        t_row = jnp.exp2(t_term).reshape(1, p)
        bg = bg_ref
        out_color_ref[g, 0, :] = acc_c[0, :] + t_row[0, :] * bg[0]
        out_color_ref[g, 1, :] = acc_c[1, :] + t_row[0, :] * bg[1]
        out_color_ref[g, 2, :] = acc_c[2, :] + t_row[0, :] * bg[2]
        out_alpha_ref[g, 0, :] = 1.0 - t_row[0, :]
        out_depth_ref[g, 0, :] = acc_d.reshape(1, p)[0, :]
        out_normal_ref[g] = acc_n
        out_median_ref[g, 0, :] = med.reshape(1, p)[0, :]
        out_dist_ref[g, 0, :] = acc_dist.reshape(1, p)[0, :]
        out_ncon_ref[g, 0, :] = n_con.astype(jnp.int32).reshape(1, p)[0, :]
        out_nmed_ref[g, 0, :] = n_med.astype(jnp.int32).reshape(1, p)[0, :]
        out_wm_ref[g, 0, :] = d_run.reshape(1, p)[0, :]
        out_wm2_ref[g, 0, :] = d2_run.reshape(1, p)[0, :]

    ones1 = jnp.ones((p, 1), jnp.float32)
    zeros1 = jnp.zeros((p, 1), jnp.float32)
    # t_term carried as the log-sum (zeros); n_con/n_med as f32
    carry0 = (
        ones1, zeros1,
        jnp.zeros((6, p), jnp.float32), zeros1,
        zeros1, zeros1, zeros1, zeros1, zeros1,
        zeros1, zeros1,
    )

    if PAIR2D_TRAIN:
        # PAIR-INTERLEAVED loop (pallas_fwd PAIR_TILES discipline)
        assert group % 2 == 0
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
            headA = startA % chunk
            nA = _n_chunks(startA, countA)
            startB = tile_start_ref[tB]
            countB = tile_count_ref[tB]
            headB = startB % chunk
            nB = _n_chunks(startB, countB)

            def _pix(t):
                tx = (t % tiles_x).astype(jnp.float32)
                ty = (t // tiles_x).astype(jnp.float32)
                return (tx * TILE) + px_loc, (ty * TILE) + py_loc

            pixA = _pix(tA)
            pixB = _pix(tB)

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
        head = start % chunk
        n_chunks = _n_chunks(start, count)
        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        pix_x = (tx * TILE) + px_loc
        pix_y = (ty * TILE) + py_loc

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


def _surfel_bwd_kernel(
    tile_start_ref, tile_count_ref, bg_ref,
    data_ref,
    g_color_ref, g_alpha_ref, g_depth_ref, g_normal_ref, g_median_ref,
    g_dist_ref,
    alpha_out_ref, ncon_ref, nmed_ref, wm_ref, wm2_ref,
    out_grads_ref,    # [K_pad/C, 24, C]
    side_ref,         # [1, 24, C] f32 VMEM: this program's final carry block
    idx_ref,          # [1, 8, 128] i32 VMEM: side block's global index
                      # (broadcast over the block; Mosaic's (8,128)-divisible
                      # output-block rule forbids a [1,128] row)
    chunk_vmem, grad_vmem, sem_in, sem_out,
    *, tiles_x: int, chunk: int, group: int,
):
    pid = pl.program_id(0)
    tri = _suffix_tri(chunk)
    p = TILE * TILE
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px_loc = (pix_row % TILE).astype(jnp.float32)
    py_loc = (pix_row // TILE).astype(jnp.float32)
    bg = bg_ref

    def _copy_in(start, ci, slot):
        base = (start // chunk) * chunk
        offset = pl.multiple_of(base + ci * chunk, 128)
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(offset, chunk)], chunk_vmem.at[slot],
            sem_in.at[slot],
        )

    def _wait_out(slot_idx):
        pltpu.make_async_copy(
            grad_vmem.at[slot_idx], out_grads_ref.at[0], sem_out.at[slot_idx]
        ).wait()

    def _hi(g):
        t = pid * group + g
        start = tile_start_ref[t]
        count = tile_count_ref[t]
        head = start % chunk
        n_con = ncon_ref[g]
        max_inc = jnp.minimum(jnp.max(n_con), count)
        return jnp.where(count > 0, (head + max_inc + chunk - 1) // chunk, 0)

    # prefetch the last chunk of every tile in the group
    for g in range(group):
        t = pid * group + g
        start = tile_start_ref[t]
        hi = _hi(g)

        @pl.when(hi > 0)
        def _(start=start, hi=hi, g=g):
            _copy_in(start, hi - 1, g).start()

    # merge-carry writer (see pallas_bwd._bwd_kernel): tiles in REVERSE
    # order + reverse chunk walks => global block visits non-increasing;
    # the open carry block accumulates tile-straddling contributions in
    # VMEM and is flushed once a lower block appears
    carry_w = (jnp.int32(-1), jnp.int32(1), jnp.float32(0.0), jnp.float32(0.0))

    for g in reversed(range(group)):
        t = pid * group + g
        start = tile_start_ref[t]
        count = tile_count_ref[t]
        cbase = start // chunk
        head = start % chunk
        hi = _hi(g)
        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        pix_x = (tx * TILE) + px_loc
        pix_y = (ty * TILE) + py_loc

        g_c = g_color_ref[g]                       # [3, P]
        g_a = g_alpha_ref[g]                       # [1, P]
        g_d = g_depth_ref[g]                       # [1, P]
        g_n = g_normal_ref[g]                      # [3, P]
        g_med = g_median_ref[g].reshape(p, 1)
        g_dist = g_dist_ref[g].reshape(p, 1)
        a_all = alpha_out_ref[g].reshape(p, 1)     # sum(w) = 1 - T_final
        t_final_row = 1.0 - alpha_out_ref[g]       # [1, P]
        n_con_col = ncon_ref[g].reshape(p, 1)
        n_med_col = nmed_ref[g].reshape(p, 1)
        d_all = wm_ref[g].reshape(p, 1)
        d2_all = wm2_ref[g].reshape(p, 1)

        g_t = bg[0] * g_c[0:1, :] + bg[1] * g_c[1:2, :] + bg[2] * g_c[2:3, :] - g_a
        gt_term = (t_final_row * g_t).reshape(p, 1)
        g_d_col = g_d.reshape(p, 1)
        g_cn = jnp.concatenate([g_c, g_n], axis=0)   # [6, P] color+normal

        def body(carry, g=g, start=start, head=head, count=count, hi=hi,
                 cbase=cbase, pix_x=pix_x, pix_y=pix_y, g_cn=g_cn,
                 g_med=g_med, g_dist=g_dist, a_all=a_all, gt_term=gt_term,
                 g_d_col=g_d_col, n_con_col=n_con_col, n_med_col=n_med_col,
                 d_all=d_all, d2_all=d2_all):
            ci, t_run, s_run, cblk, cslot, w0, w1 = carry
            in_slot = jnp.where(ci == hi - 1, g, group + ci % 2)

            @pl.when(ci - 1 >= 0)
            def _():
                _copy_in(start, ci - 1, group + (ci - 1) % 2).start()

            _copy_in(start, ci, in_slot).wait()
            cur = chunk_vmem.at[in_slot]
            geo = _surfel_geometry(cur, pix_x, pix_y)
            alpha, z = geo["alpha"], geo["z"]
            alpha_u = geo["alpha_u"]
            u, v, use3d = geo["u"], geo["v"], geo["use3d"]
            zu, zv = geo["zu"], geo["zv"]
            dx, dy = geo["dx"], geo["dy"]
            sx, sy, s_z = geo["s"]
            sz = geo["sz"]

            kpos = ci * chunk + lane
            in_seg = (kpos >= head) & (kpos < head + count)
            amask = in_seg & (alpha >= ALPHA_MIN) & (z >= NEAR_PLANE)
            alpha_eff = jnp.where(amask, alpha, 0.0)

            include = in_seg & ((kpos - head) < n_con_col)      # [p, C]
            om = jnp.where(include, 1.0 - alpha_eff, 1.0)
            # T_before = T_run / prod_{j>=i} om_j, reconstructed in log space via
            # one triangular MXU contraction (alpha <= 0.99 bounds each term)
            revlog = _scan_mm(jnp.log2(om), tri)  # base-2 (see pallas_fwd)
            t_before = t_run * jnp.exp2(-revlog)
            w = jnp.where(include, alpha_eff * t_before, 0.0)

            # ONE reciprocal serves both m and dm/dz (was a divide each):
            # m = FF (1 - NEAR/z), dm/dz = FF NEAR / z^2 = FF NEAR izm^2
            izm = 1.0 / jnp.maximum(z, 1e-6)
            m = FF - (FF * NEAR_PLANE) * izm
            wm = w * m
            wm2 = wm * m
            # telescoped distortion coefficients (prefix+suffix totals)
            a_bar = a_all - w
            d_bar = d_all - wm
            d2_bar = d2_all - wm2
            psi = m * m * a_bar + d2_bar - 2.0 * m * d_bar

            # u_i(p) = c.g_C + n.g_N + z g_D + g_dist psi: one
            # [6]-contraction over the adjacent color+normal rows
            uu = _acc_mm(g_cn, cur[14:20, :], ((0,), (0,)))
            uu = uu + g_d_col * z + g_dist * psi

            wu = w * uu
            revsum_incl = _rev_cumsum_mxu(wu, tri)
            s_i = s_run + revsum_incl - wu

            # no select: alpha_eff is already 0 outside amask
            one_minus = 1.0 - alpha_eff
            dalpha = t_before * uu - (s_i + gt_term) / one_minus
            emit = amask & include
            dalpha = jnp.where(emit, dalpha, 0.0)

            # dL/dz: expected-depth, distortion (dm/dz), median select
            dm = g_dist * 2.0 * w * (m * a_bar - d_bar)
            dmdz = (FF * NEAR_PLANE) * izm * izm
            ismed = ((kpos - head) + 1) == n_med_col
            dz = w * g_d_col + dm * dmdz + jnp.where(ismed, g_med, 0.0)

            # alpha = min(0.99, alpha_u), alpha_u = 2^(NC rho + lopa); CUDA
            # propagates through opa*G unconditionally. d_lopa reuses drho:
            # d alpha_u/d lopa = ln2 alpha_u, so
            # d_lopa = ln2 Σ alpha_u dalpha = -2 ln2 Σ drho — no big_g
            # product or extra [p,C] multiply
            drho = -0.5 * alpha_u * dalpha
            # rho = min(rho3d, rho2d); z = use3d ? u zu + v zv + zc : zc
            du = jnp.where(use3d, 2.0 * u * drho + zu * dz, 0.0)
            dv = jnp.where(use3d, 2.0 * v * drho + zv * dz, 0.0)
            # clip gates (jnp.clip VJP semantics)
            du = jnp.where((geo["u_raw"] >= -1e3) & (geo["u_raw"] <= 1e3), du, 0.0)
            dv = jnp.where((geo["v_raw"] >= -1e3) & (geo["v_raw"] <= 1e3), dv, 0.0)
            d_zc_px = dz
            d_zu_px = jnp.where(use3d, u * dz, 0.0)
            d_zv_px = jnp.where(use3d, v * dz, 0.0)

            not3d = jnp.logical_not(use3d)
            two_f = 2.0 * FILTER_INV_SQUARE
            d_cx_px = jnp.where(not3d, two_f * dx * drho, 0.0)
            d_cy_px = jnp.where(not3d, two_f * dy * drho, 0.0)

            # u = sx/sz, v = sy/sz (sz gradient only where |s_z| > 1e-9)
            inv_sz = geo["rz"]
            dsx = du * inv_sz
            dsy = dv * inv_sz
            dsz = -(u * du + v * dv) * inv_sz
            dsz = jnp.where(jnp.abs(s_z) > 1e-9, dsz, 0.0)
            # s = adj @ (px, py, 1): d_adj rows are pixel-weighted sums of
            # ds (the cross-product VJP moved outside the kernel — autodiff
            # through surfel_adj maps d_adj back to d_M)

            def pxsum(x):
                return jnp.sum(x, axis=0, keepdims=True)        # [1, C]

            # d_color+d_normal in one [6, C] contraction; rows 14-19 =
            # d_color, d_normal, row 20 = d_lopa (matches the stream/table
            # layout so the scatter target columns line up; the caller's
            # autodiff chains d_lopa -> d_opacity through log2_opacity)
            d_cn = _acc_mm(g_cn, w, ((1,), (0,)))               # [6, C]
            g24 = jnp.concatenate(
                [
                    pxsum(dsx * pix_x), pxsum(dsx * pix_y), pxsum(dsx),
                    pxsum(dsy * pix_x), pxsum(dsy * pix_y), pxsum(dsy),
                    pxsum(dsz * pix_x), pxsum(dsz * pix_y), pxsum(dsz),
                    pxsum(d_zu_px), pxsum(d_zv_px), pxsum(d_zc_px),
                    pxsum(d_cx_px), pxsum(d_cy_px),
                    d_cn, (-2.0 * LN2) * pxsum(drho),
                    jnp.zeros((3, chunk), jnp.float32),
                ],
                axis=0,
            )                                                   # [24, C]

            # merge-carry write (out-of-segment lanes are exactly zero, so
            # accumulating straddling tiles' blocks is a plain add)
            B = cbase + ci
            is_merge = B == cblk
            for k in (0, 1):
                @pl.when(is_merge & (cslot == k))
                def _(k=k):
                    grad_vmem[k] = grad_vmem[k] + g24

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
                    grad_vmem[k] = g24

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
            return carry[0] >= 0

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
    side_ref[0] = jnp.zeros((SURFEL_ROWS, chunk), jnp.float32)
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


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg", "interpret"))
def _surfel_train_fwd_call(data, tile_start, tile_count, bg, *, width, height,
                           cfg, interpret=False):
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    p = TILE * TILE
    chunk = cfg.pallas_chunk
    group = GROUP2D_TRAIN
    n_groups = -(-num_tiles // group)
    t_pad = n_groups * group
    pad = t_pad - num_tiles
    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
    tile_start_p = jnp.pad(tile_start, (0, pad))
    tile_count_p = jnp.pad(tile_count, (0, pad))

    def spec(c):
        return pl.BlockSpec((group, c, p), lambda t, *_: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    n_slots = group + (6 if PAIR2D_TRAIN else 3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[spec(3), spec(1), spec(1), spec(3), spec(1), spec(1),
                   spec(1), spec(1), spec(1), spec(1)],
        scratch_shapes=[
            pltpu.VMEM((n_slots, SURFEL_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    kernel = functools.partial(_surfel_train_fwd_kernel, tiles_x=tiles_x,
                               chunk=chunk, group=group)

    def sh(c, dt=jnp.float32):
        return jax.ShapeDtypeStruct((t_pad, c, p), dt)

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[sh(3), sh(1), sh(1), sh(3), sh(1), sh(1),
                   sh(1, jnp.int32), sh(1, jnp.int32), sh(1), sh(1)],
        interpret=interpret,
    )(tile_start_p, tile_count_p, bg4, data)
    return tuple(o[:num_tiles] for o in outs)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "k_pad", "interpret")
)
def _surfel_bwd_call(
    data, tile_start, tile_count, bg,
    g_color_t, g_alpha_t, g_depth_t, g_normal_t, g_median_t, g_dist_t,
    alpha_t, ncon_t, nmed_t, wm_t, wm2_t,
    *, width, height, cfg, k_pad, interpret=False,
):
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    p = TILE * TILE
    chunk = cfg.pallas_chunk
    group = GROUP2D_TRAIN
    n_groups = -(-num_tiles // group)
    t_pad = n_groups * group
    pad = t_pad - num_tiles
    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
    assert k_pad % chunk == 0
    zeros_out = jnp.zeros((k_pad // chunk, SURFEL_ROWS, chunk), jnp.float32)

    def _pad_t(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    def spec(c):
        return pl.BlockSpec((group, c, p), lambda t, *_: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # data
            spec(3), spec(1), spec(1), spec(3), spec(1), spec(1),
            spec(1), spec(1), spec(1), spec(1), spec(1),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, SURFEL_ROWS, chunk), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 128), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((group + 2, SURFEL_ROWS, chunk), jnp.float32),
            pltpu.VMEM((2, SURFEL_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((group + 2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(ts, tc, bgr, data_ref, gc, ga, gd, gn, gm, gdist,
               ao, nc, nm, wm, wm2, zeros_ref, out_ref, side_ref, idx_ref,
               chunk_vmem, grad_vmem, sem_in, sem_out):
        del zeros_ref
        _surfel_bwd_kernel(
            ts, tc, bgr, data_ref, gc, ga, gd, gn, gm, gdist,
            ao, nc, nm, wm, wm2, out_ref, side_ref, idx_ref,
            chunk_vmem, grad_vmem, sem_in, sem_out,
            tiles_x=tiles_x, chunk=chunk, group=group,
        )

    out_grads, side, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_pad // chunk, SURFEL_ROWS, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, SURFEL_ROWS, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 8, 128), jnp.int32),
        ],
        input_output_aliases={15: 0},  # zeros input (after 3 prefetch args)
        interpret=interpret,
    )(
        _pad_t(tile_start), _pad_t(tile_count), bg4,
        data, _pad_t(g_color_t), _pad_t(g_alpha_t), _pad_t(g_depth_t),
        _pad_t(g_normal_t), _pad_t(g_median_t), _pad_t(g_dist_t),
        _pad_t(alpha_t), _pad_t(ncon_t), _pad_t(nmed_t), _pad_t(wm_t),
        _pad_t(wm2_t), zeros_out,
    )
    # each program's final (lowest) carry block, added here because its
    # block may also hold the previous program's main-flushed partials
    out_grads = out_grads.at[idx[:, 0, 0]].add(side)
    return out_grads


SURFEL_COLS = 21  # table columns: M 9, zrow 3, xy 2, color 3, normal 3, opa 1


@functools.lru_cache(maxsize=64)
def _make_surfel_composite(width: int, height: int, cfg: RasterConfig,
                           interpret: bool):
    chunk = cfg.pallas_chunk
    k2 = cfg.stream_cap
    # backward output capacity: the compact stream rounded up to whole
    # chunk blocks (see pallas.py)
    k_pad = -(-k2 // chunk) * chunk

    def _build_stream(table, g_pad):
        # table arrives pre-padded to SURFEL_ROWS columns (pad_cols at N),
        # so the one K-row gather emits the kernel row count directly
        data = gather_rows_u16_t(table, g_pad)  # [24, K2] transposed
        # chunk-sized tail pad so kernel DMA windows never run off the end
        return jnp.concatenate(
            [data, jnp.zeros((SURFEL_ROWS, chunk), jnp.float32)], axis=1
        )

    @jax.custom_vjp
    def composite(table, g_pad_f, g_drop_f, tile_start_f, tile_count_f, bg):
        data = _build_stream(table, _i32(g_pad_f))
        outs = _surfel_train_fwd_call(
            data, _i32(tile_start_f), _i32(tile_count_f), bg,
            width=width, height=height, cfg=cfg, interpret=interpret,
        )
        return tuple(outs[:6])

    def composite_fwd(table, g_pad_f, g_drop_f, tile_start_f, tile_count_f, bg):
        g_pad = _i32(g_pad_f)
        tile_start = _i32(tile_start_f)
        tile_count = _i32(tile_count_f)
        data = _build_stream(table, g_pad)
        outs = _surfel_train_fwd_call(
            data, tile_start, tile_count, bg,
            width=width, height=height, cfg=cfg, interpret=interpret,
        )
        (color_t, alpha_t, depth_t, normal_t, median_t, dist_t,
         ncon_t, nmed_t, wm_t, wm2_t) = outs
        res = (data, _i32(g_drop_f), tile_start, tile_count, bg,
               alpha_t, ncon_t, nmed_t, wm_t, wm2_t, table.shape[0])
        return tuple(outs[:6]), res

    def composite_bwd(res, grads):
        (data, g_drop, tile_start, tile_count, bg,
         alpha_t, ncon_t, nmed_t, wm_t, wm2_t, n_rows) = res
        (g_color_t, g_alpha_t, g_depth_t, g_normal_t, g_median_t,
         g_dist_t) = grads

        grads_padded = _surfel_bwd_call(
            data, tile_start, tile_count, bg,
            g_color_t, g_alpha_t, g_depth_t, g_normal_t, g_median_t, g_dist_t,
            alpha_t, ncon_t, nmed_t, wm_t, wm2_t,
            width=width, height=height, cfg=cfg, k_pad=k_pad, interpret=interpret,
        )
        # block-compacted unsorted scatter-add onto gaussians (full-scatter
        # cond fallback inside; see pallas.compact_block_scatter)
        # the table's zero-pad columns have identically-zero cotangent
        # (rows >= SURFEL_COLS are never read): scatter the useful rows and
        # pad the result back to the table width
        d_table = compact_block_scatter(
            grads_padded, g_drop, tile_start, tile_count, ncon_t,
            n_rows, cfg.bwd_blocks(k_pad // chunk), useful_rows=SURFEL_COLS,
        )
        d_table = jnp.concatenate(
            [d_table,
             jnp.zeros((n_rows, SURFEL_ROWS - SURFEL_COLS), jnp.float32)],
            axis=1,
        )

        t_final = 1.0 - alpha_t
        d_bg = jnp.sum(t_final * g_color_t, axis=(0, 2))

        zf = lambda x: jnp.zeros_like(x, jnp.float32)  # noqa: E731
        return (d_table, jnp.zeros(k2, jnp.float32), zf(g_drop),
                zf(tile_start), zf(tile_count), d_bg)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def rasterize_surfel_pallas(
    means3d, opacities, cam, bg, *,
    shs=None, sh_degree: int = 0, colors_precomp=None,
    scales=None, quats=None, scale_modifier: float = 1.0,
    screen_deltas=None, alive=None, cfg: RasterConfig = RasterConfig(),
    interpret: bool = False,
) -> SurfelOutput:
    """Differentiable 2DGS surfel forward with Pallas fwd+bwd kernels
    (drop-in replacement for rasterize_surfel_xla)."""
    w, h = cam.width, cam.height
    prep = preprocess_surfel(
        means3d, opacities, cam, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scales=scales, quats=quats,
        scale_modifier=scale_modifier, screen_deltas=screen_deltas, alive=alive,
    )
    prep_sg = jax.lax.stop_gradient(_surfel_prep_to_common(prep))
    # exact surfel tile cull: homography-projected UV-disk conic OR the
    # low-pass circle (see surfel_cull_ellipses) — culled keys are below
    # the 1/255 alpha threshold at every pixel of their tile, so outputs
    # AND gradients are unchanged (the compositor skips them either way)
    ell, circ = surfel_cull_ellipses(prep)
    # rows 0-8: adj(M) — the kernel's ray-splat solve is linear in the
    # pixel (surfel.surfel_adj); its d_adj gradient flows back to M through
    # this differentiable gather (permuted inside the expansion's single
    # N-row gather). No id column: i32 bit patterns bitcast into f32 do
    # not survive TPU XLA's denormal flushing.
    # row 20 carries log2(opacity) (common.log2_opacity): the kernels fold
    # opacity into the exponent add and autodiff chains d_lopa -> d_opacity
    extra = pad_cols(
        jnp.concatenate(
            [
                surfel_adj(prep.M), prep.zrow, prep.xy,
                prep.color, prep.normal, log2_opacity(prep.opacity)[:, None],
            ],
            axis=1,
        ),
        SURFEL_ROWS,
    )
    g_pad, g_drop, tile_start, tile_count, dropped, order, table = (
        _compact_routing(
            prep_sg, w, h, cfg, cull=True, interpret=interpret,
            geo1=jax.lax.stop_gradient(ell), geo2=jax.lax.stop_gradient(circ),
            extra=extra,
        )
    )

    composite = _make_surfel_composite(w, h, cfg, interpret)
    color_t, alpha_t, depth_t, normal_t, median_t, dist_t = composite(
        table, _f32(g_pad), _f32(g_drop),
        _f32(tile_start), _f32(tile_count), bg.astype(jnp.float32),
    )
    color = tiles_cp_to_image(color_t, w, h)
    alpha = tiles_cp_to_image(alpha_t, w, h)
    depth = tiles_cp_to_image(depth_t, w, h)
    normal = tiles_cp_to_image(normal_t, w, h)
    median = tiles_cp_to_image(median_t, w, h)
    dist = tiles_cp_to_image(dist_t, w, h)
    num_dropped = dropped.astype(jnp.int32)
    return SurfelOutput(color, alpha, depth, normal, median, dist,
                        prep.radii, num_dropped, jnp.int32(0))
