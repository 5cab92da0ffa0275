"""High-level render entry point (reference renderer contract).

Mirrors the output dictionary of the reference's
`gs3dgs/gaussian_renderer/render` (/root/reference/gs3dgs/gaussian_renderer/
__init__.py:24-133): rendered image, screen-space gradient carrier,
visibility filter (radii > 0), radii, alpha-normalized depth with
nan_to_num, and accumulated alpha. Consumes either a padded `GaussianState`
or host-side `GaussianData`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.camera import CameraJax
from .core.plyio import GaussianData
from .ops.raster import RasterConfig
from .ops.raster import rasterize
from .train.state import GaussianState, from_gaussian_data


@partial(jax.jit, static_argnames=("sh_degree", "cfg", "has_override"))
def _render_jit(
    params, alive, cam: CameraJax, bg, override_color, scale_modifier,
    *, sh_degree: int, cfg: RasterConfig, has_override: bool,
):
    kwargs = dict(
        scales=jnp.exp(params["scaling"]),
        quats=params["rotation"],
        scale_modifier=scale_modifier,
        alive=alive,
        cfg=cfg,
    )
    if has_override:
        kwargs["colors_precomp"] = override_color
    else:
        kwargs["shs"] = jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1)
        kwargs["sh_degree"] = sh_degree
    out = rasterize(
        params["xyz"], jax.nn.sigmoid(params["opacity"][:, 0]), cam, bg, **kwargs
    )
    depth = out.depth_accum / jnp.where(out.alpha == 0.0, 1.0, out.alpha)
    depth = jnp.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0)
    return {
        "render": out.color,
        "render_depth": depth,
        "render_alpha": out.alpha,
        "radii": out.radii,
        "visibility_filter": out.radii > 0,
        "num_dropped_keys": out.num_dropped_keys,
        "num_dropped_tail": out.num_dropped_tail,
    }


def render(
    cam: CameraJax,
    gaussians: GaussianState | GaussianData,
    bg: jnp.ndarray | np.ndarray,
    *,
    scaling_modifier: float = 1.0,
    override_color=None,
    sh_degree: int | None = None,
    cfg: RasterConfig | None = None,
):
    if isinstance(gaussians, GaussianData):
        gaussians = from_gaussian_data(gaussians)
    if cfg is None:
        cfg = default_raster_config(gaussians.capacity)
    degree = gaussians.sh_degree if sh_degree is None else sh_degree
    return _render_jit(
        gaussians.params,
        gaussians.alive,
        cam,
        jnp.asarray(bg, jnp.float32),
        jnp.zeros((gaussians.capacity, 3), jnp.float32) if override_color is None else override_color,
        jnp.float32(scaling_modifier),
        sh_degree=degree,
        cfg=cfg,
        has_override=override_color is not None,
    )


def default_raster_config(capacity: int, avg_tiles_per_gaussian: int = 16) -> RasterConfig:
    """Pick key/list capacities from the Gaussian capacity (power-of-two-ish
    so recompiles are rare). Conservative: no post-cull stream trim, for
    call sites without overflow-regrow handling."""
    max_keys = 1 << max(14, (capacity * avg_tiles_per_gaussian - 1).bit_length())
    return RasterConfig(max_keys=max_keys, tile_list_len=2048, chunk=64)


def tuned_raster_config(
    capacity: int,
    *,
    avg_tiles_per_gaussian: int = 16,
    max_keys: int | None = None,
    stream_keys: int | None = None,
    tile_list_len: int = 1024,
    chunk: int = 64,
    bwd_block_frac: float = 0.66,
) -> RasterConfig:
    """The measured-fast v5e raster configuration for TRAINING loops.

    pallas_chunk=128 (beats 256/512: fewer scan steps + finer early-exit
    granularity) and a post-cull stream trim at 3/4 of the expansion
    capacity (the exact ellipse-tile cull drops 15-50% of expanded keys, so
    the sorted stream — and every downstream K-proportional stage: stream
    gather, compositor chunks, backward scatter — runs at a smaller static
    size). Overflow of either capacity is reported via num_dropped_keys /
    num_dropped_tail; callers MUST handle it with regrow_config (the
    trainer apps and bench.py do).

    bwd_block_frac=0.66 compacts the backward gradient scatter-add to the
    chunk blocks that intersect a pre-termination range (measured 57.3% of
    K_pad at bench scale; overflow falls back to the full scatter inside a
    lax.cond, so the fraction is a speed knob, never a correctness one).
    """
    if max_keys is None:
        max_keys = 1 << min(22, max(14, (capacity * avg_tiles_per_gaussian - 1).bit_length()))
    if stream_keys is None:
        stream_keys = max_keys // 4 * 3
    return RasterConfig(
        max_keys=max_keys, tile_list_len=tile_list_len, chunk=chunk,
        pallas_chunk=128, stream_keys=stream_keys,
        bwd_block_frac=bwd_block_frac,
    )


def regrow_config(cfg: RasterConfig, dropped_keys: int, dropped_tail: int) -> RasterConfig:
    """Double the overflowing capacities, preserving every other field
    (pallas_chunk, chunk, and the stream-trim ratio survive regrow)."""
    if dropped_keys:
        cfg = cfg._replace(
            max_keys=cfg.max_keys * 2,
            stream_keys=cfg.stream_keys * 2 if cfg.stream_keys else 0,
        )
    if dropped_tail:
        cfg = cfg._replace(tile_list_len=cfg.tile_list_len * 2)
    return cfg
