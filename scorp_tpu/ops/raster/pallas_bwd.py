"""Pallas TPU backward compositor.

Reverse-mode of the per-tile front-to-back blend, mirroring the reference
CUDA backward's structure (walk each tile's stream back-to-front,
reconstruct transmittance by progressive division, accumulate suffix sums)
but vectorized over [P pixels, C keys] blocks:

  * forward residuals are the final transmittance (1 - alpha output) and
    `n_contrib` (number of stream positions before termination) — inclusion
    in backward is the prefix test kpos < n_contrib, exactly CUDA's
    last_contributor logic;
  * within a chunk, T_before_i = T_run / ∏_{j>=i}(1-α_j) comes from one
    reverse Hillis-Steele cumprod (numerically safe: the termination rule
    keeps every running product >= T_EPS), and the suffix sums
    S_i = Σ_{j>i} w_j u_j from a reverse cumsum;
  * per-key gradients are reduced over pixels (MXU contractions for
    color/depth, sublane reductions for the geometry terms) and written to
    a chunk-aligned padded buffer — each tile owns disjoint, chunk-aligned
    output segments, so no atomics and no cross-program races;
  * gradient formulas match the CUDA backward, including its treatment of
    the 0.99 alpha clamp (gradients propagate through opa·exp(power)
    unconditionally) and the exclusion of skipped/post-termination keys.

The mapping back to per-gaussian gradients happens outside: a gather from
the padded layout to the key stream, then JAX autodiff of bin_stream's
sort/gather performs the segment reduction onto gaussians.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import TILE, RasterConfig, grid_dims

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _rev_scan_lanes(x: jnp.ndarray, chunk: int, op, fill: float) -> jnp.ndarray:
    """Reverse (suffix) inclusive scan along lanes via Hillis-Steele."""
    p, c = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (p, c), 1)
    steps = int(math.log2(chunk))
    assert 2**steps == chunk
    for s in [1 << i for i in range(steps)]:
        rolled = pltpu.roll(x, chunk - s, 1)  # element i takes value from i+s
        x = op(x, jnp.where(col < c - s, rolled, fill))
    return x


def _suffix_tri(chunk: int) -> jnp.ndarray:
    """U[j, i] = 1 iff j >= i: x @ U = inclusive suffix sums along lanes."""
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j >= i).astype(jnp.float32)


def _rev_cumsum_mxu(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Suffix-inclusive sum along lanes as one MXU contraction (exact f32;
    ~2x cheaper than the log2(C)-step Hillis-Steele on the VPU)."""
    return jax.lax.dot_general(
        x, tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bwd_kernel(
    # scalar prefetch
    tile_start_ref,   # [T] i32
    tile_count_ref,   # [T] i32
    chunk_base_ref,   # [T] i32 (output segment offsets, in chunks)
    bg_ref,           # [4] f32
    # inputs
    data_ref,         # [16, K+pad] f32 ANY
    g_color_ref,      # [1, 3, P] VMEM block
    g_depth_ref,      # [1, 1, P]
    g_alpha_ref,      # [1, 1, P]
    alpha_out_ref,    # [1, 1, P] forward alpha (T_final = 1 - alpha)
    ncontrib_ref,     # [1, 1, P] i32
    # outputs
    out_grads_ref,    # [K_pad/C, 16, C] f32 ANY (one block per chunk slot)
    # scratch
    chunk_vmem,       # [16, C]
    grad_vmem,        # [16, C]
    sem_in,
    sem_out,
    *,
    tiles_x: int,
    chunk: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    cbase = chunk_base_ref[t]
    base = (start // 128) * 128
    head = start - base
    tri = _suffix_tri(chunk)

    p = TILE * TILE
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    pix_x = (tx * TILE) + (pix_row % TILE).astype(jnp.float32)   # [p,1]
    pix_y = (ty * TILE) + (pix_row // TILE).astype(jnp.float32)

    g_c = g_color_ref[0]                       # [3, P]
    g_d = g_depth_ref[0]                       # [1, P]
    g_a = g_alpha_ref[0]                       # [1, P]
    t_final_row = 1.0 - alpha_out_ref[0]       # [1, P]
    n_con = ncontrib_ref[0]                    # [1, P] i32

    # dL/dT_final = bg . g_color - g_alpha, folded with T_final once
    bg = bg_ref
    g_t = bg[0] * g_c[0:1, :] + bg[1] * g_c[1:2, :] + bg[2] * g_c[2:3, :] - g_a
    gt_term = (t_final_row * g_t).reshape(p, 1)   # [p,1]
    g_d_col = g_d.reshape(p, 1)
    n_con_col = n_con.reshape(p, 1)

    max_inc = jnp.minimum(jnp.max(n_con), count)
    hi = (head + max_inc + chunk - 1) // chunk  # chunks overlapping included keys

    def body(carry):
        ci, t_run, s_run = carry
        offset = pl.multiple_of(base + ci * chunk, 128)
        copy = pltpu.make_async_copy(data_ref.at[:, pl.ds(offset, chunk)], chunk_vmem, sem_in)
        copy.start()
        copy.wait()

        gx = chunk_vmem[0:1, :]
        gy = chunk_vmem[1:2, :]
        ca = chunk_vmem[2:3, :]
        cb = chunk_vmem[3:4, :]
        cc = chunk_vmem[4:5, :]
        colors = chunk_vmem[5:8, :]
        opa = chunk_vmem[8:9, :]
        depth = chunk_vmem[9:10, :]

        dx = gx - pix_x                  # [p, C]
        dy = gy - pix_y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        big_g = jnp.exp(power)
        alpha_u = opa * big_g
        alpha = jnp.minimum(ALPHA_MAX, alpha_u)
        kpos = ci * chunk + lane         # [1, C] position relative to base
        in_seg = (kpos >= head) & (kpos < head + count)
        amask = in_seg & (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha_eff = jnp.where(amask, alpha, 0.0)

        include = in_seg & ((kpos - head) < n_con_col)            # [p, C]
        om = jnp.where(include, 1.0 - alpha_eff, 1.0)

        revprod = _rev_scan_lanes(om, chunk, jnp.multiply, 1.0)   # ∏_{j>=i}
        t_before = t_run / revprod                                # [p, C]
        w = jnp.where(include, alpha_eff * t_before, 0.0)

        # u_i(p) = c_i . g_C(p) + d_i g_D(p)
        u = jax.lax.dot_general(
            g_c, colors, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                          # [p, C]
        u = u + g_d_col * depth

        wu = w * u
        revsum_incl = _rev_cumsum_mxu(wu, tri)
        s_i = s_run + revsum_incl - wu                             # suffix j>i

        one_minus = jnp.where(amask, 1.0 - alpha_eff, 1.0)
        dalpha = t_before * u - (s_i + gt_term) / one_minus
        emit = amask & include
        dalpha = jnp.where(emit, dalpha, 0.0)

        dpow = alpha_u * dalpha                                    # [p, C]
        d_color = jax.lax.dot_general(
            g_c, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                          # [3, C]
        d_depth = jax.lax.dot_general(
            g_d, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                          # [1, C]
        d_ca = jnp.sum(-0.5 * dx * dx * dpow, axis=0, keepdims=True)
        d_cb = jnp.sum(-(dx * dy) * dpow, axis=0, keepdims=True)
        d_cc = jnp.sum(-0.5 * dy * dy * dpow, axis=0, keepdims=True)
        d_gx = jnp.sum(-(ca * dx + cb * dy) * dpow, axis=0, keepdims=True)
        d_gy = jnp.sum(-(cc * dy + cb * dx) * dpow, axis=0, keepdims=True)
        d_opa = jnp.sum(big_g * dalpha, axis=0, keepdims=True)

        grad_vmem[0:1, :] = d_gx
        grad_vmem[1:2, :] = d_gy
        grad_vmem[2:3, :] = d_ca
        grad_vmem[3:4, :] = d_cb
        grad_vmem[4:5, :] = d_cc
        grad_vmem[5:8, :] = d_color
        grad_vmem[8:9, :] = d_opa
        grad_vmem[9:10, :] = d_depth
        grad_vmem[10:16, :] = jnp.zeros((6, chunk), jnp.float32)

        # one [16, chunk] block per chunk slot; the caller transposes each
        # block to rows (a local (16,chunk) relayout XLA does at bandwidth,
        # forcing a row-major materialization so the downstream per-key row
        # gather stays on the fast path)
        wcopy = pltpu.make_async_copy(
            grad_vmem, out_grads_ref.at[cbase + ci], sem_out
        )
        wcopy.start()
        wcopy.wait()

        t_run = t_run / revprod[:, 0:1]
        s_run = s_run + revsum_incl[:, 0:1]
        return ci - 1, t_run, s_run

    def cond(carry):
        ci, _, _ = carry
        return ci >= 0

    t0 = t_final_row.reshape(p, 1)
    s0 = jnp.zeros((p, 1), jnp.float32)
    jax.lax.while_loop(cond, body, (hi - 1, t0, s0))


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
    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
    assert k_pad % chunk == 0
    zeros_out = jnp.zeros((k_pad // chunk, data.shape[0], chunk), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # data
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to output)
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((data.shape[0], chunk), jnp.float32),
            pltpu.VMEM((data.shape[0], chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(ts, tc, cb, bgr, data_ref, gc, gd, ga, ao, nc, zeros_ref, out_ref,
               chunk_vmem, grad_vmem, sem_in, sem_out):
        del zeros_ref
        _bwd_kernel(
            ts, tc, cb, bgr, data_ref, gc, gd, ga, ao, nc, out_ref,
            chunk_vmem, grad_vmem, sem_in, sem_out,
            tiles_x=tiles_x, chunk=chunk,
        )

    (out_grads,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_pad // chunk, data.shape[0], chunk), jnp.float32)
        ],
        input_output_aliases={10: 0},  # zeros input (after 4 prefetch args) -> output
        interpret=interpret,
    )(
        tile_start, tile_count, chunk_base, bg4,
        data, g_color_t, g_depth_t, g_alpha_t, alpha_t, ncontrib_t, zeros_out,
    )
    return out_grads
