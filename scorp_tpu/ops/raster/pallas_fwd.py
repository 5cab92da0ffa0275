"""Pallas TPU forward compositor: per-tile front-to-back alpha blending.

The production equivalent of the reference CUDA renderCUDA kernel
(semantics in SURVEY.md §2.3a / §3.2), designed for the TPU memory
hierarchy instead of translated:

  * grid = one program per GROUP of 16x16 tiles (default 8). Grouping
    amortizes the per-program fixed cost (measured ~1-2 us/program on v5e:
    output DMA turnaround + scalar setup dominates tiles whose stream is a
    single chunk — the p50 on real scenes) and lets the kernel issue the
    chunk-0 DMA of every tile in the group up front, hiding HBM latency
    that a per-tile grid pays serially;
  * each tile's depth-sorted Gaussian stream (built by common.bin_stream)
    is DMA'd HBM->VMEM in chunks of `pallas_chunk` and processed as
    [P=256 pixels, C] vector blocks;
  * the Gaussian exponent is evaluated on the MXU: power(px,py) is a
    quadratic polynomial in the (tile-local) pixel coordinates, so one
    [P,8]x[8,C] contraction replaces the per-key-pixel VPU chain
    (dx/dy/conic products). Tile-local coordinates keep it exact: the 0.3px
    low-pass dilation bounds conic entries by ~3.3, so every matmul term is
    O(10^3) and f32 accumulation holds power to ~1e-4 absolute;
  * the sequential front-to-back transmittance recurrence runs in log2
    space on the MXU: cumprod_i (1-a_j) = exp2(sum log2(1-a_j)) with the
    prefix sum as one [P,C]x[C,C] triangular contraction — replacing the
    log2(C)-step masked Hillis-Steele roll chain that dominated the VPU
    cost. Base 2 throughout (incl. the alpha exponent, whose sqrt(log2 e)
    is folded into the stream's Cholesky rows by common.conic_chol): each
    transcendental's lowering drops its ln2/log2(e) multiply. alpha <=
    0.99 keeps log2(1-a) in [-6.7, 0], so the exp/log round trip costs
    ~1e-6 relative — below the alpha-threshold tie noise;
  * the CUDA early-termination rule is exact here because the running
    transmittance is monotone non-increasing: a Gaussian is included iff
    T*prod_{j<=i}(1-a_j) >= 1e-4 and no earlier key of the pixel already
    crossed the threshold — stickiness comes from ZEROING the running
    carry at the crossing chunk (t_after stays 0 ever after, so the
    prefix test needs no sticky flag), and the chunk loop exits early
    once every pixel has saturated, mirroring the warp-wide
    `__syncthreads_count(done)` break;
  * outputs are [T, ch, P] blocks so the lane dimension stays 256-wide.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import TILE, RasterConfig, StreamBins, grid_dims

T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
GROUP = 16  # tiles per program (16 beats 8 on the 3DGS path: train 68.9
# -> 67.6 ms, render +0.3 FPS; 32 measured a WASH on the round-4 body —
# composite 7.88 -> 7.90 ms, don't retry; the surfel kernels measured the
# OPPOSITE — GROUP2D stays 8, train2d 132.7 -> 136.1 at 16, likely the
# 24-row x 19-slot VMEM footprint)
MXU_SCAN = True   # log-space transmittance via triangular MXU contraction
# quadratic-basis exponent on the MXU: measured a net LOSS on v5e in BOTH
# forms — HIGHEST (6 f32-emulation passes) and bf16x3 (3 single passes,
# basis exact in bf16, composite 12.85 -> 13.80 ms at 1.5M keys): the
# 8-deep contraction pads to the 128-wide MXU and the operand staging
# costs more than the ~9-op [P,C] VPU dx/dy chain it replaces. Kept as an
# off-by-default experiment flag; do not retry without changing the shape.
MXU_POWER = False
MXU_POWER_BF16 = True  # bf16x3 split form (False = HIGHEST; both lose)
PREFETCH0 = True  # issue chunk-0 DMAs of all group tiles up front
# software-pipelined chunk loop: the next chunk's alpha chain (VPU: dx/dy/
# exp/masks) is computed between issuing the current chunk's scan
# contractions (MXU) and consuming their result. MEASURED A LOSS on v5e at
# 250k/1600x1066: render 37.6 -> 32.6 FPS, train 70.8 -> 74.6 ms (alpha
# rides the loop carry: +[256,128] f32 carry traffic each body, 4th DMA
# slot, and one wasted next-alpha chain per tile exit — cond-gating that
# waste did NOT recover it, 32.2 FPS). Conclusion: the serial body already
# overlaps MXU/VPU through the hardware queues; don't hand-pipeline this
# loop again. Kept as an off-by-default experiment flag.
PIPELINE = False
# PAIR-INTERLEAVED serial loop: two tiles' chunk bodies share one while
# loop so their independent dependency chains overlap (the body is
# LATENCY-bound, not throughput-bound: see _chunk_math's caller). Applies
# to the serial path only (PIPELINE off).
PAIR_TILES = True
# diagnosis-only toggles (scripts/profile_fusions.py): skip parts of the
# track_ncontrib bookkeeping to attribute the train-vs-render fwd gap.
# NEVER set in production — they break backward semantics.
import os as _os
_DIAG_SKIP_NCON = _os.environ.get("DIAG_SKIP_NCON", "") == "1"
_DIAG_SKIP_TTERM = _os.environ.get("DIAG_SKIP_TTERM", "") == "1"


def _masked_cumprod_lanes(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Inclusive cumulative product along the last (lane) axis via
    Hillis-Steele doubling with multiplicative-identity fill."""
    p, c = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (p, c), 1)
    steps = int(math.log2(chunk))
    assert 2**steps == chunk, "pallas_chunk must be a power of two"
    for s in [1 << i for i in range(steps)]:
        rolled = pltpu.roll(x, s, 1)
        x = x * jnp.where(col >= s, rolled, 1.0)
    return x


def _cumprod_excl_lanes(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Exclusive cumulative product along lanes (identity in lane 0)."""
    p, c = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (p, c), 1)
    shifted = jnp.where(col >= 1, pltpu.roll(x, 1, 1), 1.0)
    return _masked_cumprod_lanes(shifted, chunk)


def _strict_lower_tri(chunk: int) -> jnp.ndarray:
    """L[j, i] = 1 iff j < i: x @ L = exclusive prefix sums along lanes."""
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j < i).astype(jnp.float32)


def _pixel_basis(p: int) -> jnp.ndarray:
    """[P, 8] quadratic monomial basis of the tile-local pixel coords:
    [1, px, py, px^2, px*py, py^2, 0, 0]."""
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (pix_row % TILE).astype(jnp.float32)
    py = (pix_row // TILE).astype(jnp.float32)
    one = jnp.ones((p, 1), jnp.float32)
    zero = jnp.zeros((p, 1), jnp.float32)
    return jnp.concatenate(
        [one, px, py, px * px, px * py, py * py, zero, zero], axis=1
    )


def _power_coefs(cur, tx_px, ty_px, chunk: int) -> jnp.ndarray:
    """[8, C] per-key coefficients so that power = basis @ coefs.

    power = -0.5*(A dx^2 + C dy^2) - B dx dy with dx = gx - px. In
    tile-local coordinates (gl = g - tile_origin):
      c0 = -0.5(A glx^2 + C gly^2) - B glx gly
      c_px = A glx + B gly,  c_py = C gly + B glx
      c_px2 = -0.5 A, c_pxpy = -B, c_py2 = -0.5 C
    """
    glx = cur[0:1, :] - tx_px          # [1, C]
    gly = cur[1:2, :] - ty_px
    # rows 2-4 are the conic Cholesky factor; reconstruct A, B, C ([1, C])
    l11 = cur[2:3, :]
    l21 = cur[3:4, :]
    l22 = cur[4:5, :]
    ca = l11 * l11
    cb = l11 * l21
    cc = l21 * l21 + l22 * l22
    c0 = -0.5 * (ca * glx * glx + cc * gly * gly) - cb * glx * gly
    c_px = ca * glx + cb * gly
    c_py = cc * gly + cb * glx
    zero = jnp.zeros((1, chunk), jnp.float32)
    return jnp.concatenate(
        [c0, c_px, c_py, -0.5 * ca, -cb, -0.5 * cc, zero, zero], axis=0
    )


def _mm(a, b, contract, precision=jax.lax.Precision.HIGHEST):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


# scan-contraction precision. bf16x3 (Precision.HIGH) would halve the MXU
# passes and the log magnitudes (bounded by the 0.99 alpha clamp) could
# afford it, but Mosaic's dot lowering only supports DEFAULT and HIGHEST —
# HIGH raises NotImplementedError at compile time (interpret mode hides it).
SCAN_PREC = jax.lax.Precision.HIGHEST

# Accumulation contractions (color+depth vs weight in forward, the
# cotangent dots in backward) at bf16x3: both operands split into hi+lo
# bf16 components and the lo*lo term (~2^-32 relative) dropped — THREE
# single-pass MXU contractions instead of HIGHEST's six. Product error
# ~2^-17 relative, far below the 5e-3 parity budget (colors/weights are
# O(1), depth O(10)).
ACC_BF16X3 = True


def _acc_mm(a, b, contract):
    """Accumulation matmul with the configured precision strategy."""
    if not ACC_BF16X3:
        return _mm(a, b, contract)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        # explicit DEFAULT precision: see _scan_mm_parts
        return jax.lax.dot_general(
            x, y,
            dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(ah, bh) + (d(ah, bl) + d(al, bh))


# Manual bf16x2 split for the triangular scan contractions: the triangular
# matrix is 0/1 (exact in bf16) and x splits into two bf16 components
# covering 16 mantissa bits, so x@tri runs as TWO single-pass bf16 matmuls
# (f32 accumulate) instead of HIGHEST's six — input rounding ~2^-17
# relative, well under the alpha-threshold tie noise the parity budget
# already absorbs. Flag measured on-device; interpret-mode tests run both.
SCAN_BF16X2 = True


def _power_mm(basis: jnp.ndarray, coefs: jnp.ndarray) -> jnp.ndarray:
    """[P, 8] basis @ [8, C] coefs with the configured MXU strategy.

    bf16x3: the basis is exact in bf16 (tile-local monomials are integers
    <= 225 < 2^8), and the coefs split exactly into three bf16 components
    covering all 24 f32 mantissa bits — three single-pass contractions with
    f32 accumulation reproduce the f32 product to ~1e-4 absolute (the f32
    accumulation order is the only difference).
    """
    if not MXU_POWER_BF16:
        return _mm(basis, coefs, ((1,), (0,)))
    b = basis.astype(jnp.bfloat16)
    c1 = coefs.astype(jnp.bfloat16)
    r1 = coefs - c1.astype(jnp.float32)
    c2 = r1.astype(jnp.bfloat16)
    c3 = (r1 - c2.astype(jnp.float32)).astype(jnp.bfloat16)

    def bmm(c):
        # explicit DEFAULT precision: see _scan_mm
        return jax.lax.dot_general(
            b, c,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return bmm(c1) + bmm(c2) + bmm(c3)


def _scan_mm_parts(x: jnp.ndarray, tri: jnp.ndarray) -> tuple:
    """Triangular scan contraction x @ tri, returned as UNSUMMED parts.

    The caller sums them (s1 + s2 or s1 + 0.0): keeping the combining add
    out of this helper lets a pipelined kernel place independent VPU work
    between the matmul issues and the first use of their results, so the
    MXU passes overlap it instead of serializing.
    """
    if not SCAN_BF16X2:
        return _mm(x, tri, ((1,), (0,)), SCAN_PREC), None
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tri_b = tri.astype(jnp.bfloat16)

    def bmm(a):
        # precision must be EXPLICIT DEFAULT: the package-wide
        # jax_default_matmul_precision=highest would stamp fp32 contract
        # precision onto this bf16 dot, which Mosaic rejects ("Bad lhs
        # type"); DEFAULT on bf16 operands is the single exact MXU pass.
        return jax.lax.dot_general(
            a, tri_b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return bmm(hi), bmm(lo)


def _scan_mm(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Triangular scan contraction x @ tri with the configured strategy."""
    s1, s2 = _scan_mm_parts(x, tri)
    return s1 if s2 is None else s1 + s2


def _fwd_tile_pipelined(
    g, start, count, head, n_chunks, tx_px, ty_px,
    chunk_vmem, _copy,
    *, chunk, group, track_ncontrib, ltri, lane,
):
    """Software-pipelined per-tile chunk loop (see PIPELINE).

    Iteration ci issues the scan contractions of chunk ci (MXU) and, while
    they run, computes chunk ci+1's alpha chain (VPU: dx/dy/exp/masks) —
    the alpha rides the loop carry. DMA uses 4 rotating slots with a
    3-deep prefetch (chunk ci+1 must be RESIDENT during body ci, one
    deeper than the serial path's 2). Guards: the ci+1 wait/start are
    n_chunks-bounded exactly like the starts (semaphore discipline — see
    CLAUDE.md kernel-fault warning); an out-of-range alpha read sees a
    stale-but-stable slot and is masked to zero by the kpos range test,
    NaN-safe because jnp.where selects before any NaN can propagate.
    """
    p = TILE * TILE
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    pix_x = tx_px + (pix_row % TILE).astype(jnp.float32)
    pix_y = ty_px + (pix_row // TILE).astype(jnp.float32)

    def _alpha_of(slot, ci):
        # rows 2-4 hold the conic CHOLESKY factor (common.conic_chol):
        # power = -0.5 (u^2 + v^2) <= 0 by construction
        cur = chunk_vmem.at[slot]
        dx = cur[0:1, :] - pix_x
        dy = cur[1:2, :] - pix_y
        u = cur[2:3, :] * dx + cur[3:4, :] * dy
        v = cur[4:5, :] * dy
        power = -0.5 * (u * u + v * v)
        # row 9 = log2(opacity) (see the serial body)
        alpha = jnp.minimum(ALPHA_MAX, jnp.exp2(power + cur[9:10, :]))
        kpos = ci * chunk + lane  # position relative to `base`
        valid = (kpos >= head) & (kpos < head + count)
        return jnp.where(valid & (alpha >= ALPHA_MIN), alpha, 0.0)

    # 3-deep prologue: chunks 1 and 2 in flight (chunk 0's DMA was issued
    # by the group prefetch), then wait chunk 0 and compute its alpha
    @pl.when(n_chunks > 1)
    def _():
        _copy(start, jnp.int32(1), group).start()

    @pl.when(n_chunks > 2)
    def _():
        _copy(start, jnp.int32(2), group + 1).start()

    @pl.when(count > 0)
    def _():
        _copy(start, jnp.int32(0), g).wait()

    alpha0 = _alpha_of(g, jnp.int32(0))

    def body(carry):
        ci, t_carry, stopped, acc_cd, n_con, alpha = carry
        slot = jnp.where(ci == 0, g, group + (ci - 1) % 4)

        # 1) issue this chunk's scan contractions (MXU); the combining add
        # happens at step 3, after the independent VPU work
        logx = jnp.log2(1.0 - alpha)
        s1, s2 = _scan_mm_parts(logx, ltri)

        # 2) next chunk's alpha chain (VPU) while the MXU runs
        next_slot = group + ci % 4

        @pl.when(ci + 1 < n_chunks)
        def _():
            _copy(start, ci + 1, next_slot).wait()

        @pl.when(ci + 3 < n_chunks)
        def _():
            _copy(start, ci + 3, group + (ci + 2) % 4).start()

        # cond-gated: at the tile's last chunk (~every 2.2 bodies on real
        # scenes) the next-alpha chain would be pure waste
        alpha_next = jax.lax.cond(
            ci + 1 < n_chunks,
            lambda: _alpha_of(next_slot, ci + 1),
            lambda: jnp.zeros((p, chunk), jnp.float32),
        )

        # 3) consume the scan: exclusive running (1-alpha) product in log
        # space; then the CUDA termination rule (see the serial body)
        cum_excl = jnp.exp2(s1 if s2 is None else s1 + s2)
        t_before = t_carry * cum_excl
        t_after = t_before * (1.0 - alpha)
        include = jnp.logical_and(stopped < 0.5, t_after >= T_EPS)
        weight = jnp.where(include, alpha * t_before, 0.0)
        if track_ncontrib:
            kpos = ci * chunk + lane
            contrib = jnp.logical_and(include, alpha > 0.0)
            pos1 = (kpos - head) + 1
            n_con = jnp.maximum(
                n_con,
                jnp.max(jnp.where(contrib, pos1, 0), axis=1, keepdims=True),
            )
        t_carry = jnp.min(
            jnp.where(include, t_after, t_carry), axis=1, keepdims=True
        )
        stopped = jnp.maximum(
            stopped,
            (t_after[:, chunk - 1 : chunk] < T_EPS).astype(jnp.float32),
        )

        # 4) accumulation contraction issued last: its result is first
        # needed an iteration later, so it overlaps the next body's VPU work
        cur = chunk_vmem.at[slot]
        acc_cd = acc_cd + _acc_mm(cur[5:9, :], weight, ((1,), (1,)))
        return ci + 1, t_carry, stopped, acc_cd, n_con, alpha_next

    def cond(carry):
        ci, _, stopped, _, _, _ = carry
        return (ci < n_chunks) & (jnp.min(stopped) < 0.5)

    t0 = jnp.ones((p, 1), jnp.float32)
    stop0 = jnp.zeros((p, 1), jnp.float32)
    acc_cd0 = jnp.zeros((4, p), jnp.float32)
    n0 = jnp.zeros((p, 1), jnp.int32)
    ci_final, t_final, _, acc_cd, n_inc, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, stop0, acc_cd0, n0, alpha0)
    )
    acc_c, acc_d = acc_cd[:3], acc_cd[3:4]

    # drain in-flight prefetches on early exit: body(ci) waits ci+1 and
    # starts ci+3, so at exit chunks ci_final+1 and ci_final+2 can be in
    # flight unwaited (both n_chunks-guarded at start)
    for d in (1, 2):
        @pl.when(ci_final + d < n_chunks)
        def _(ci_final=ci_final, d=d):
            _copy(start, ci_final + d, group + (ci_final + d - 1) % 4).wait()

    return ci_final, t_final, acc_c, acc_d, n_inc


def _fwd_kernel(
    # scalar prefetch
    tile_start_ref,  # [T_pad] i32
    tile_count_ref,  # [T_pad] i32
    bg_ref,          # [4] f32 (rgb + pad)
    # inputs
    data_ref,        # [16, K] f32 in ANY/HBM
    # outputs (per-group blocks)
    out_color_ref,   # [G, 3, P]
    out_depth_ref,   # [G, 1, P]
    out_alpha_ref,   # [G, 1, P]
    out_ncontrib_ref,  # [G, 1, P] i32: keys processed before termination
    # scratch
    chunk_vmem,      # [G+3, 16, C] f32 (per-tile chunk-0 slots + 3 rotating)
    sem,             # [G+3] DMA semaphores
    *,
    tiles_x: int,
    chunk: int,
    group: int,
    track_ncontrib: bool = True,
):
    pid = pl.program_id(0)
    p = TILE * TILE
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ones_row = jnp.ones((1, chunk), jnp.float32)
    basis = _pixel_basis(p) if MXU_POWER else None
    ltri = _strict_lower_tri(chunk) if MXU_SCAN else None
    def _copy(start, ci, slot):
        base = (start // 128) * 128
        offset = pl.multiple_of(base + ci * chunk, 128)
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(offset, chunk)], chunk_vmem.at[slot], sem.at[slot]
        )

    def _n_chunks(start, count):
        # 0 for empty tiles regardless of alignment: the chunk-0 prefetch is
        # guarded on count > 0, so the loop must not wait on its semaphore
        head = start - (start // 128) * 128
        return jnp.where(count > 0, (head + count + chunk - 1) // chunk, 0)

    # hide HBM latency: chunk 0 of every tile in the group goes in flight now
    if PREFETCH0:
        for g in range(group):
            t = pid * group + g
            start = tile_start_ref[t]

            @pl.when(tile_count_ref[t] > 0)
            def _(start=start, g=g):
                _copy(start, jnp.int32(0), g).start()

    pipelined = PIPELINE and MXU_SCAN and not MXU_POWER

    def _chunk_math(cur, ci, head, count, tx_px, ty_px,
                    t_run, t_term, acc_cd, n_con):
        """One [p, C] chunk body: alpha -> scan -> blend -> carries.

        Pure math shared by the single-tile and PAIR-interleaved loops;
        safe on masked/stale chunks (kpos outside [head, head+count) zeroes
        alpha, making every update a no-op). See the inline comments for
        the numerics."""
        if MXU_POWER:
            coefs = _power_coefs(cur, tx_px, ty_px, chunk)
            power = _power_mm(basis, coefs)              # [p, C] MXU
        else:
            # rows 2-4 hold the scaled conic CHOLESKY factor
            # (common.conic_chol, base-2 exponent units): power =
            # -0.5 (u^2 + v^2) is the LOG2 exponent, u = l11 dx +
            # l21 dy, v = l22 dy — 8 VPU ops, power <= 0 by
            # construction (the PSD validity test the conic form
            # needed disappears), and exp2 is the hardware exponential
            # without the log2(e) multiply jnp.exp's lowering adds
            pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
            pix_x = tx_px + (pix_row % TILE).astype(jnp.float32)
            pix_y = ty_px + (pix_row // TILE).astype(jnp.float32)
            dx = cur[0:1, :] - pix_x
            dy = cur[1:2, :] - pix_y
            u = cur[2:3, :] * dx + cur[3:4, :] * dy
            v = cur[4:5, :] * dy
            power = -0.5 * (u * u + v * v)
        # row 9 is log2(opacity): alpha = 2^(power + lopa) folds the
        # per-key opacity into the exponent's add (one [p,C] multiply
        # saved per chunk; bit-identical recompute in the backward)
        lopa = cur[9:10, :]
        alpha = jnp.minimum(ALPHA_MAX, jnp.exp2(power + lopa))
        kpos = ci * chunk + lane  # position relative to `base`
        valid = (kpos >= head) & (kpos < head + count)
        alpha = jnp.where(valid & (alpha >= ALPHA_MIN), alpha, 0.0)

        # exclusive running (1-alpha) product along the chunk, in log2
        # space: one triangular MXU contraction instead of a lane scan.
        # Base 2 throughout — the ln2/log2(e) factors between log and
        # exp cancel exactly, saving one [p,C] multiply inside EACH
        # transcendental's lowering (exp(x) lowers as exp2(x*log2e),
        # log(x) as log2(x)*ln2).
        om = 1.0 - alpha
        logx = jnp.log2(om)                               # [p, C] <= 0
        if MXU_SCAN:
            s_excl = _scan_mm(logx, ltri)
            cum_excl = jnp.exp2(s_excl)
        else:
            s_excl = None
            cum_excl = _cumprod_excl_lanes(om, chunk)
        t_before = t_run * cum_excl
        t_after = t_before * om
        # CUDA rule: the key that would drop T below 1e-4 is excluded
        # and the pixel is done. Within a chunk t_after is monotone
        # nonincreasing, so the threshold test is a prefix; stickiness
        # across chunks comes from ZEROING the running carry once the
        # last lane crosses (t_after stays 0 ever after) — no separate
        # sticky flag, no [p,C] AND per chunk.
        include = t_after >= T_EPS
        weight = jnp.where(include, alpha * t_before, 0.0)

        if track_ncontrib:
            # train path: color+depth accumulate in ONE [4, C] x [C, p]
            # contraction (rows 5-8 adjacent by stream layout)
            acc_cd = acc_cd + _acc_mm(cur[5:9, :], weight, ((1,), (1,)))
        else:
            # render path: a constant ones row rides the contraction so
            # accumulator row 4 collects Σ weight, which telescopes
            # EXACTLY to 1 - T_terminated over the included prefix:
            # Σ a_i ∏_{j<i}(1-a_j) = 1 - ∏(1-a_i). The terminated
            # transmittance is a free byproduct of the matmul — see the
            # t_carry note below.
            acc_cd = acc_cd + _acc_mm(
                jnp.concatenate([cur[5:9, :], ones_row], axis=0),
                weight, ((1,), (1,)),
            )
        if track_ncontrib and not _DIAG_SKIP_NCON:
            # n_contrib = 1-based stream position (from the segment
            # start) of the last included key with alpha > 0 — the
            # reference last_contributor, a prefix length for backward.
            # f32 max-reduce + f32 carry (i32 cast once per tile).
            contrib = jnp.logical_and(include, alpha > 0.0)
            pos1 = ((kpos - head) + 1).astype(jnp.float32)  # [1, C]
            n_con = jnp.maximum(
                n_con,
                jnp.max(jnp.where(contrib, pos1, 0.0), axis=1,
                        keepdims=True),
            )
        if track_ncontrib and _os.environ.get("DIAG_TTERM_SLICE", "") == "1":
            # cost probe ONLY (wrong at crossing chunks): full-chunk log sum
            # from two slices of already-computed values, no lane reduce
            t_term = t_term + (
                s_excl[:, chunk - 1 : chunk] + logx[:, chunk - 1 : chunk]
            )
        elif track_ncontrib and not _DIAG_SKIP_TTERM:
            # train path: t_term = the smallest included t_after (the
            # included set is a per-pixel prefix) — the terminated
            # transmittance the backward reconstructs t_before from
            # multiplicatively. Accumulated as the LOG-SUM of included
            # om (one masked lane SUM per chunk, exp2 once per tile):
            # exact to ~1e-6 RELATIVE — crucially NOT the render path's
            # cancellative 1 - Σweight form, whose ~1e-5 ABSOLUTE error
            # vs T_term as small as 1e-4 corrupts saturated-pixel
            # gradients (measured: grads-at-saturation parity fails at
            # rtol 1e-3).
            t_term = t_term + jnp.sum(
                jnp.where(include, logx, 0.0), axis=1, keepdims=True
            )
        # running carry: the chunk's FULL product (last-lane t_after;
        # masked lanes have alpha = 0 so they don't perturb it), ZEROED
        # once it crosses T_EPS so every later chunk's t_after sits at 0
        # and the include prefix test stays false — the sticky-stop rule
        # with no flag. The OUTPUT transmittance is t_term (train) or
        # the telescoped Σ-weight accumulator row (render), never this
        # carry, so the zeroing is unobservable.
        last = t_after[:, chunk - 1 : chunk]
        t_run = jnp.where(last < T_EPS, 0.0, last)
        return t_run, t_term, acc_cd, n_con

    def _tile_outputs(g, t_term_c, acc_cd, n_con_c):
        if track_ncontrib:
            t_final = jnp.exp2(t_term_c)
            n_inc = n_con_c.astype(jnp.int32)
        else:
            t_final, n_inc = t_term_c, n_con_c
        acc_c, acc_d = acc_cd[:3], acc_cd[3:4]
        if track_ncontrib:
            a_row = 1.0 - t_final.reshape(1, p)
        else:
            # acc row 4 = Σ weight = 1 - T_terminated (telescoped)
            a_row = acc_cd[4:5]
        bg = bg_ref
        out_color_ref[g, 0, :] = acc_c[0, :] + (1.0 - a_row[0, :]) * bg[0]
        out_color_ref[g, 1, :] = acc_c[1, :] + (1.0 - a_row[0, :]) * bg[1]
        out_color_ref[g, 2, :] = acc_c[2, :] + (1.0 - a_row[0, :]) * bg[2]
        out_depth_ref[g, 0, :] = acc_d[0, :]
        out_alpha_ref[g, 0, :] = a_row[0, :]
        out_ncontrib_ref[g, 0, :] = n_inc.reshape(1, p)[0, :]

    t0 = jnp.ones((p, 1), jnp.float32)
    acc_rows = 4 if track_ncontrib else 5
    acc_cd0 = jnp.zeros((acc_rows, p), jnp.float32)
    zeros_p1 = jnp.zeros((p, 1), jnp.float32)
    # track path: t_term carried as the log-sum (zeros), n_con as f32
    tt0 = zeros_p1 if track_ncontrib else t0
    n0 = zeros_p1 if track_ncontrib else jnp.zeros((p, 1), jnp.int32)

    if PAIR_TILES and not pipelined:
        # PAIR-INTERLEAVED loop: two tiles' chunk chains run in one while
        # body. The serial body is LATENCY-bound (measured: the render body
        # costs ~490 ns/visit against a ~230 ns throughput model, and ANY
        # extra dependent [p,C] chain — reduce, scratch write, or carry —
        # adds ~430 ns/visit in every formulation tried), so interleaving
        # two INDEPENDENT tiles lets the VLIW scheduler overlap the two
        # dependency chains. Masked math keeps inactive tiles correct: a
        # tile past its last chunk (or saturated, t_run zeroed) computes on
        # a stale-but-finite slot and kpos/include mask every update to a
        # no-op. The rotating DMA slots split even/odd per pair member.
        assert group % 2 == 0
        # zero the rotating + chunk-0 slots once: stale reads of an EMPTY
        # tile's never-DMA'd slot would otherwise feed uninitialized VMEM
        # (possible NaN bit patterns) into the acc matmul, where w=0 rows
        # cannot mask NaN (0 * NaN). 8 KB stores, program-setup cost only.
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
            txA = ((tA % tiles_x) * TILE).astype(jnp.float32)
            tyA = ((tA // tiles_x) * TILE).astype(jnp.float32)
            startB = tile_start_ref[tB]
            countB = tile_count_ref[tB]
            headB = startB - (startB // 128) * 128
            nB = _n_chunks(startB, countB)
            txB = ((tB % tiles_x) * TILE).astype(jnp.float32)
            tyB = ((tB // tiles_x) * TILE).astype(jnp.float32)

            # chunk-1 prefetches (chunk 0 went in flight at program start)
            @pl.when(nA > 1)
            def _(startA=startA):
                _copy(startA, jnp.int32(1), group + 0).start()

            @pl.when(nB > 1)
            def _(startB=startB):
                _copy(startB, jnp.int32(1), group + 1).start()

            def pair_body(carry, gA=gA, gB=gB, startA=startA, headA=headA,
                          countA=countA, nA=nA, txA=txA, tyA=tyA,
                          startB=startB, headB=headB, countB=countB, nB=nB,
                          txB=txB, tyB=tyB):
                (ci, t_runA, t_termA, accA, nconA,
                 t_runB, t_termB, accB, nconB) = carry
                sA = jnp.where(ci == 0, gA, group + 2 * ((ci - 1) % 3))
                sB = jnp.where(ci == 0, gB, group + 2 * ((ci - 1) % 3) + 1)

                # DMA guards must pair start/wait exactly (see CLAUDE.md
                # kernel-fault warning): both sides condition on ci vs n
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

                t_runA, t_termA, accA, nconA = _chunk_math(
                    chunk_vmem.at[sA], ci, headA, countA, txA, tyA,
                    t_runA, t_termA, accA, nconA,
                )
                t_runB, t_termB, accB, nconB = _chunk_math(
                    chunk_vmem.at[sB], ci, headB, countB, txB, tyB,
                    t_runB, t_termB, accB, nconB,
                )
                return (ci + 1, t_runA, t_termA, accA, nconA,
                        t_runB, t_termB, accB, nconB)

            def pair_cond(carry, nA=nA, nB=nB):
                ci, t_runA = carry[0], carry[1]
                t_runB = carry[5]
                aliveA = (ci < nA) & (jnp.max(t_runA) >= T_EPS)
                aliveB = (ci < nB) & (jnp.max(t_runB) >= T_EPS)
                return aliveA | aliveB

            (ci_final, t_runA, t_termA, accA, nconA,
             t_runB, t_termB, accB, nconB) = jax.lax.while_loop(
                pair_cond, pair_body,
                (jnp.int32(0), t0, tt0, acc_cd0, n0, t0, tt0, acc_cd0, n0),
            )

            # drain in-flight prefetches (2-deep pipeline per tile)
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

            _tile_outputs(gA, t_termA, accA, nconA)
            _tile_outputs(gB, t_termB, accB, nconB)
        return

    for g in range(group):
        t = pid * group + g
        start = tile_start_ref[t]
        count = tile_count_ref[t]
        head = start - (start // 128) * 128
        n_chunks = _n_chunks(start, count)
        tx_px = ((t % tiles_x) * TILE).astype(jnp.float32)
        ty_px = ((t // tiles_x) * TILE).astype(jnp.float32)

        if not PREFETCH0:
            @pl.when(count > 0)
            def _(start=start, g=g):
                _copy(start, jnp.int32(0), g).start()

        if pipelined:
            ci_final, t_final, acc_c, acc_d, n_inc = _fwd_tile_pipelined(
                g, start, count, head, n_chunks, tx_px, ty_px,
                chunk_vmem, _copy,
                chunk=chunk, group=group, track_ncontrib=track_ncontrib,
                ltri=ltri, lane=lane,
            )
            t_row = t_final.reshape(1, p)
            bg = bg_ref
            out_color_ref[g, 0, :] = acc_c[0, :] + t_row[0, :] * bg[0]
            out_color_ref[g, 1, :] = acc_c[1, :] + t_row[0, :] * bg[1]
            out_color_ref[g, 2, :] = acc_c[2, :] + t_row[0, :] * bg[2]
            out_depth_ref[g, 0, :] = acc_d[0, :]
            out_alpha_ref[g, 0, :] = 1.0 - t_row[0, :]
            out_ncontrib_ref[g, 0, :] = n_inc.reshape(1, p)[0, :]
            continue

        # 2-deep pipeline: chunk 1 goes in flight before the loop, and each
        # iteration prefetches ci+2, so a chunk's DMA has ~2 compute bodies
        # of lookahead to cover HBM latency
        @pl.when(n_chunks > 1)
        def _(start=start):
            _copy(start, jnp.int32(1), group).start()

        def body(carry, g=g, start=start, head=head, count=count,
                 n_chunks=n_chunks, tx_px=tx_px, ty_px=ty_px):
            ci, t_run, t_term, acc_cd, n_con = carry
            slot = jnp.where(ci == 0, g, group + (ci - 1) % 3)
            _copy(start, ci, slot).wait()

            @pl.when(ci + 2 < n_chunks)
            def _():
                _copy(start, ci + 2, group + (ci + 1) % 3).start()

            t_run, t_term, acc_cd, n_con = _chunk_math(
                chunk_vmem.at[slot], ci, head, count, tx_px, ty_px,
                t_run, t_term, acc_cd, n_con,
            )
            return ci + 1, t_run, t_term, acc_cd, n_con

        def cond(carry, n_chunks=n_chunks):
            ci, t_run, *_ = carry
            return (ci < n_chunks) & (jnp.max(t_run) >= T_EPS)

        ci_final, _, t_term_c, acc_cd, n_con_c = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, tt0, acc_cd0, n0)
        )

        # drain in-flight prefetches if the loop exited early (up to two:
        # ci_final and ci_final+1 — the 2-deep pipeline keeps both in flight)
        for d in (0, 1):
            @pl.when(ci_final + d < n_chunks)
            def _(g=g, start=start, ci_final=ci_final, d=d):
                ci_d = ci_final + d
                slot = jnp.where(ci_d == 0, g, group + (ci_d - 1) % 3)
                _copy(start, ci_d, slot).wait()

        _tile_outputs(g, t_term_c, acc_cd, n_con_c)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "interpret", "track_ncontrib")
)
def composite_stream_pallas(
    bins: StreamBins,
    bg: jnp.ndarray,
    width: int,
    height: int,
    cfg: RasterConfig,
    interpret: bool = False,
    track_ncontrib: bool = True,
):
    """Returns (color [T,3,P], depth [T,1,P], alpha [T,1,P], n_contrib)."""
    data = jnp.concatenate(
        [bins.data, jnp.zeros((bins.data.shape[0], cfg.pallas_chunk), jnp.float32)], axis=1
    )
    return _composite_kernel_call(
        data, bins.tile_start, bins.tile_count, bg,
        width=width, height=height, cfg=cfg, interpret=interpret,
        track_ncontrib=track_ncontrib,
    )


@functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "interpret", "track_ncontrib")
)
def _composite_kernel_call(
    data, tile_start, tile_count, bg, *, width, height, cfg, interpret=False,
    track_ncontrib=True,
):
    """Raw kernel invocation; `data` must already be chunk-padded at the end.

    The pad is mandatory for memory safety, not just masking: DMA windows
    are 128-aligned (base = start//128*128), so a segment ending at the
    unpadded capacity K reads up to base + n_chunks*chunk <= K + chunk - 1
    — one chunk of slack keeps the HBM read in bounds. Both callers
    (composite_stream_pallas, pallas._build_stream) append the pad.
    """
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    p = TILE * TILE
    chunk = cfg.pallas_chunk
    group = GROUP
    n_groups = -(-num_tiles // group)
    t_pad = n_groups * group
    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
    pad = t_pad - num_tiles
    tile_start_p = jnp.pad(tile_start, (0, pad))
    tile_count_p = jnp.pad(tile_count, (0, pad))

    # rotating DMA slots: 6 for the pair-interleaved loop (3 per member,
    # even/odd), 4 for the pipelined loop's 3-deep prefetch, 3 otherwise
    if PIPELINE and MXU_SCAN and not MXU_POWER:
        n_rot = 4
    elif PAIR_TILES:
        n_rot = 6
    else:
        n_rot = 3
    n_slots = group + n_rot
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((group, 3, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, data.shape[0], chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, chunk=chunk, group=group,
        track_ncontrib=track_ncontrib,
    )
    out_color, out_depth, out_alpha, out_ncontrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.int32),
        ],
        interpret=interpret,
    )(tile_start_p, tile_count_p, bg4, data)
    return (
        out_color[:num_tiles],
        out_depth[:num_tiles],
        out_alpha[:num_tiles],
        out_ncontrib[:num_tiles],
    )


def tiles_cp_to_image(tile_img: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """[num_tiles, C, TILE*TILE] -> [C, H, W]."""
    tiles_x, tiles_y = grid_dims(width, height)
    c = tile_img.shape[1]
    img = tile_img.reshape(tiles_y, tiles_x, c, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c, tiles_y * TILE, tiles_x * TILE)
    return img[:, :height, :width]


def rasterize_pallas_fwd_only(
    means3d, opacities, cam, bg, *,
    shs=None, sh_degree: int = 0, colors_precomp=None,
    scales=None, quats=None, cov3d_precomp=None, scale_modifier: float = 1.0,
    screen_deltas=None, alive=None, cfg: RasterConfig = RasterConfig(),
    interpret: bool = False,
):
    """Non-differentiable forward (inference/eval path). Returns the same
    RasterOutput as rasterize_xla."""
    from .common import bin_stream, preprocess
    from .xla import RasterOutput

    w, h = cam.width, cam.height
    prep = preprocess(
        means3d, opacities, cam,
        shs=shs, sh_degree=sh_degree, colors_precomp=colors_precomp,
        scales=scales, quats=quats, cov3d_precomp=cov3d_precomp,
        scale_modifier=scale_modifier, screen_deltas=screen_deltas, alive=alive,
    )
    bins = bin_stream(prep, w, h, cfg, interpret=interpret)
    color_t, depth_t, alpha_t, _ = composite_stream_pallas(
        bins, bg, w, h, cfg, interpret=interpret, track_ncontrib=False
    )
    color = tiles_cp_to_image(color_t, w, h)
    depth = tiles_cp_to_image(depth_t, w, h)
    alpha = tiles_cp_to_image(alpha_t, w, h)
    return RasterOutput(color, depth, alpha, prep.radii,
                        bins.num_dropped_keys, jnp.int32(0))
