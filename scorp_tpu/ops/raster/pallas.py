"""Differentiable Pallas rasterizer: custom-VJP compositing over the
depth-sorted key stream.

Division of labor:
  * preprocess (projection/EWA/SH) and bin_stream's f32 payload path are
    plain JAX — autodiff produces their exact reverse (including the
    scatter-adds that reduce per-key gradients onto gaussians through the
    sort permutation and the expansion gather);
  * the compositing loop is a jax.custom_vjp pair of Pallas kernels
    (pallas_fwd / pallas_bwd); residuals are the forward alpha map and the
    per-pixel contributor count;
  * integer plumbing (tile_start/tile_count) rides through the custom_vjp
    boundary bitcast to f32 so cotangents stay well-typed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import (
    TILE,
    DATA_ROWS_PADDED,
    RasterConfig,
    bin_stream,
    grid_dims,
    preprocess,
)
from .pallas_bwd import backward_kernel_call
from .pallas_fwd import _composite_kernel_call, tiles_cp_to_image
from .xla import RasterOutput


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


@functools.lru_cache(maxsize=64)
def _make_composite(width: int, height: int, cfg: RasterConfig, interpret: bool):
    tiles_x, tiles_y = grid_dims(width, height)
    num_tiles = tiles_x * tiles_y
    chunk = cfg.pallas_chunk
    # worst-case per-tile padding: head (<=127) + chunk rounding (<= chunk-1)
    k_pad = cfg.max_keys + num_tiles * (chunk + 128)

    def _chunk_geometry(tile_start, tile_count):
        base = (tile_start // 128) * 128
        head = tile_start - base
        n_chunks = (head + tile_count + chunk - 1) // chunk
        chunk_base = jnp.cumsum(n_chunks) - n_chunks
        return base, chunk_base

    @jax.custom_vjp
    def composite(data, tile_start_f, tile_count_f, bg):
        color_t, depth_t, alpha_t, _ = _composite_kernel_call(
            data, _i32(tile_start_f), _i32(tile_count_f), bg,
            width=width, height=height, cfg=cfg, interpret=interpret,
        )
        return color_t, depth_t, alpha_t

    def composite_fwd(data, tile_start_f, tile_count_f, bg):
        tile_start = _i32(tile_start_f)
        tile_count = _i32(tile_count_f)
        color_t, depth_t, alpha_t, ncontrib_t = _composite_kernel_call(
            data, tile_start, tile_count, bg,
            width=width, height=height, cfg=cfg, interpret=interpret,
        )
        res = (data, tile_start, tile_count, bg, alpha_t, ncontrib_t)
        return (color_t, depth_t, alpha_t), res

    def composite_bwd(res, grads):
        data, tile_start, tile_count, bg, alpha_t, ncontrib_t = res
        g_color_t, g_depth_t, g_alpha_t = grads

        base, chunk_base = _chunk_geometry(tile_start, tile_count)
        grads_padded = backward_kernel_call(
            data, tile_start, tile_count, chunk_base, bg,
            g_color_t, g_depth_t, g_alpha_t, alpha_t, ncontrib_t,
            width=width, height=height, cfg=cfg, k_pad=k_pad, interpret=interpret,
        )

        # map chunk-aligned padded gradients back to stream positions:
        # pos[j] = j + shift[tile(j)], shift recovered with a monotone
        # scatter + cummax over tile starts; gather ROWS of the transposed
        # buffer (a minor-axis gather on [16, K_pad] is ~2.5x slower)
        k = cfg.max_keys
        shift = chunk_base * chunk - base  # [T] non-decreasing
        shift_of_j = jax.lax.cummax(
            jnp.zeros(k, jnp.int32).at[tile_start].max(shift, mode="drop")
        )
        pos = jnp.arange(k, dtype=jnp.int32) + shift_of_j
        from .common import gather_rows_u16

        d_data_stream = gather_rows_u16(
            grads_padded.T, jnp.clip(pos, 0, k_pad - 1)
        ).T
        # zero out the DMA tail padding columns of `data`
        pad_cols = data.shape[1] - k
        d_data = jnp.concatenate(
            [d_data_stream, jnp.zeros((data.shape[0], pad_cols), jnp.float32)], axis=1
        )

        # d_bg[c] = sum over pixels of T_final * g_color[c]
        t_final = 1.0 - alpha_t  # [T,1,P]
        d_bg = jnp.sum(t_final * g_color_t, axis=(0, 2))

        zero_i = jnp.zeros_like(tile_start, jnp.float32)
        return d_data, zero_i, jnp.zeros_like(tile_count, jnp.float32), d_bg

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


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
    bins = bin_stream(prep, w, h, cfg)
    data = jnp.concatenate(
        [bins.data, jnp.zeros((DATA_ROWS_PADDED, cfg.pallas_chunk), jnp.float32)], axis=1
    )
    composite = _make_composite(w, h, cfg, interpret)
    color_t, depth_t, alpha_t = composite(
        data, _f32(bins.tile_start), _f32(bins.tile_count), bg.astype(jnp.float32)
    )
    color = tiles_cp_to_image(color_t, w, h)
    depth = tiles_cp_to_image(depth_t, w, h)
    alpha = tiles_cp_to_image(alpha_t, w, h)
    return RasterOutput(color, depth, alpha, prep.radii,
                        bins.num_dropped_keys, jnp.int32(0))
