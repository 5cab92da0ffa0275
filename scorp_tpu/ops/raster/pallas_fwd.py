"""Pallas TPU forward compositor: per-tile front-to-back alpha blending.

The production equivalent of the reference CUDA renderCUDA kernel
(semantics in SURVEY.md §2.3a / §3.2), designed for the TPU memory
hierarchy instead of translated:

  * grid = one program per 16x16 tile; the tile's depth-sorted Gaussian
    stream (built by common.bin_stream) is DMA'd HBM->VMEM in chunks of
    `pallas_chunk` and processed as [P=256 pixels, C] vector blocks;
  * the sequential front-to-back transmittance recurrence becomes a
    Hillis-Steele cumulative product along the chunk axis (log2(C) masked
    rolls) — per-pixel blending weights w_i = α_i·T·∏_{j<i}(1-α_j) then
    come out in one shot, and the color accumulation Σ w_i c_i is a
    [P,C]x[C,3] MXU contraction;
  * the CUDA early-termination rule is exact here because the running
    transmittance is monotone non-increasing: a Gaussian is included iff
    T·∏_{j<=i}(1-α_j) >= 1e-4, and the chunk loop exits early once every
    pixel has saturated (while_loop condition), mirroring the warp-wide
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


def _fwd_kernel(
    # scalar prefetch
    tile_start_ref,  # [T] i32
    tile_count_ref,  # [T] i32
    bg_ref,          # [4] f32 (rgb + pad)
    # inputs
    data_ref,        # [10, K] f32 in ANY/HBM
    # outputs (per-tile blocks)
    out_color_ref,   # [1, 3, P]
    out_depth_ref,   # [1, 1, P]
    out_alpha_ref,   # [1, 1, P]
    out_ncontrib_ref,  # [1, 1, P] i32: keys processed before termination
    # scratch
    chunk_vmem,      # [2, 16, C] f32 (double buffer)
    sem,             # [2] DMA semaphores
    *,
    tiles_x: int,
    chunk: int,
    track_ncontrib: bool = True,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    # DMA windows must start 128-lane aligned: round the tile's stream
    # segment down and mask the head lanes instead
    base = (start // 128) * 128
    head = start - base
    n_chunks = (head + count + chunk - 1) // chunk

    p = TILE * TILE
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    pix_x = (tx * TILE) + (pix_row % TILE).astype(jnp.float32)   # [p,1]
    pix_y = (ty * TILE) + (pix_row // TILE).astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def _copy(ci, slot):
        offset = pl.multiple_of(base + ci * chunk, 128)
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(offset, chunk)], chunk_vmem.at[slot], sem.at[slot]
        )

    # double-buffered pipeline: chunk ci is in flight when its body starts
    @pl.when(n_chunks > 0)
    def _():
        _copy(jnp.int32(0), 0).start()

    def body(carry):
        ci, t_carry, stopped, acc_c, acc_d, n_con = carry
        slot = ci % 2
        _copy(ci, slot).wait()

        @pl.when(ci + 1 < n_chunks)
        def _():
            _copy(ci + 1, 1 - slot).start()

        cur = chunk_vmem.at[slot]
        gx = cur[0:1, :]             # [1, C]
        gy = cur[1:2, :]
        ca = cur[2:3, :]
        cb = cur[3:4, :]
        cc = cur[4:5, :]
        opa = cur[8:9, :]

        dx = gx - pix_x              # [p, C]
        dy = gy - pix_y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))
        kpos = ci * chunk + lane  # position relative to `base`
        valid = (kpos >= head) & (kpos < head + count) & (power <= 0.0)
        alpha = jnp.where(valid & (alpha >= ALPHA_MIN), alpha, 0.0)

        # exclusive/inclusive running (1-alpha) products along the chunk
        cum_excl = _cumprod_excl_lanes(1.0 - alpha, chunk)         # [p, C]
        t_before = t_carry * cum_excl
        t_after = t_before * (1.0 - alpha)
        # CUDA rule: the key that would drop T below 1e-4 is excluded and the
        # pixel is done (sticky): within a chunk t_after is monotone, so the
        # threshold test is a prefix; stickiness across chunks needs the flag.
        # (carried as f32 0/1 — Mosaic can't legalize i1 while-loop carries)
        include = jnp.logical_and(stopped < 0.5, t_after >= T_EPS)
        weight = jnp.where(include, alpha * t_before, 0.0)

        colors = cur[5:8, :]                                       # [3, C]
        acc_c = acc_c + jax.lax.dot_general(
            colors, weight,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                           # [3, p]
        depth = cur[9:10, :]
        acc_d = acc_d + jax.lax.dot_general(
            depth, weight,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                           # [1, p]
        if track_ncontrib:
            # n_contrib = 1-based stream position (from the segment start) of
            # the last included key with alpha > 0 — the reference
            # last_contributor, consumed by the backward as a prefix length.
            contrib = jnp.logical_and(include, alpha > 0.0)
            pos1 = (kpos - head) + 1                                # [1, C]
            n_con = jnp.maximum(
                n_con,
                jnp.max(jnp.where(contrib, pos1, 0), axis=1, keepdims=True),
            )
        # included set is a per-pixel prefix -> post-chunk T is the smallest
        # included t_after (reduce_min; Mosaic has no reduce_prod)
        t_carry = jnp.min(
            jnp.where(include, t_after, t_carry), axis=1, keepdims=True
        )
        stopped = jnp.maximum(
            stopped,
            (t_after[:, chunk - 1 : chunk] < T_EPS).astype(jnp.float32),
        )
        return ci + 1, t_carry, stopped, acc_c, acc_d, n_con

    def cond(carry):
        ci, _, stopped, _, _, _ = carry
        return (ci < n_chunks) & (jnp.min(stopped) < 0.5)

    t0 = jnp.ones((p, 1), jnp.float32)
    stop0 = jnp.zeros((p, 1), jnp.float32)
    acc_c0 = jnp.zeros((3, p), jnp.float32)
    acc_d0 = jnp.zeros((1, p), jnp.float32)
    n0 = jnp.zeros((p, 1), jnp.int32)
    ci_final, t_final, _, acc_c, acc_d, n_inc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, stop0, acc_c0, acc_d0, n0)
    )
    # drain the in-flight prefetch if the loop exited early
    @pl.when(ci_final < n_chunks)
    def _():
        _copy(ci_final, ci_final % 2).wait()

    t_row = t_final.reshape(1, p)
    bg = bg_ref
    out_color_ref[0, 0, :] = acc_c[0, :] + t_row[0, :] * bg[0]
    out_color_ref[0, 1, :] = acc_c[1, :] + t_row[0, :] * bg[1]
    out_color_ref[0, 2, :] = acc_c[2, :] + t_row[0, :] * bg[2]
    out_depth_ref[0, 0, :] = acc_d[0, :]
    out_alpha_ref[0, 0, :] = 1.0 - t_row[0, :]
    out_ncontrib_ref[0, 0, :] = n_inc.reshape(1, p)[0, :]


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
    """Raw kernel invocation; `data` must already be chunk-padded at the end."""
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    p = TILE * TILE
    chunk = cfg.pallas_chunk
    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1, jnp.float32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, data.shape[0], chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, chunk=chunk, track_ncontrib=track_ncontrib
    )
    out_color, out_depth, out_alpha, out_ncontrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.int32),
        ],
        interpret=interpret,
    )(tile_start, tile_count, bg4, data)
    return out_color, out_depth, out_alpha, out_ncontrib


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
    bins = bin_stream(prep, w, h, cfg)
    color_t, depth_t, alpha_t, _ = composite_stream_pallas(
        bins, bg, w, h, cfg, interpret=interpret, track_ncontrib=False
    )
    color = tiles_cp_to_image(color_t, w, h)
    depth = tiles_cp_to_image(depth_t, w, h)
    alpha = tiles_cp_to_image(alpha_t, w, h)
    return RasterOutput(color, depth, alpha, prep.radii,
                        bins.num_dropped_keys, jnp.int32(0))
