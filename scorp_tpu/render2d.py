"""High-level 2DGS render entry point (reference renderer contract).

Mirrors the output dictionary of /root/reference/gs2dgs/gaussian_renderer/
__init__.py:24-170: rendered image, radii/visibility, alpha, world-space
normal map, expected/median depth mixed by `depth_ratio` into `render_depth`,
distortion map, and the depth-derived pseudo surface normal (scaled by
detached alpha)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.camera import CameraJax
from .core.plyio import GaussianData
from .ops.raster import RasterConfig
from .ops.raster.surfel import depth_to_normal_jax, rasterize_surfel_xla


def _surfel_raster(*args, **kwargs):
    """Platform dispatch: Pallas fwd kernel on TPU (no grads needed for
    eval rendering), XLA path on CPU."""
    if jax.default_backend() not in ("cpu",):
        from .ops.raster.pallas_surfel import rasterize_surfel_pallas_fwd_only

        return rasterize_surfel_pallas_fwd_only(*args, **kwargs)
    return rasterize_surfel_xla(*args, **kwargs)
from .render import default_raster_config
from .train.state import GaussianState, from_gaussian_data


@partial(jax.jit, static_argnames=("sh_degree", "cfg", "has_override"))
def _render2d_jit(params, alive, cam: CameraJax, bg, override_color, scale_modifier,
                  depth_ratio, *, sh_degree: int, cfg: RasterConfig, has_override: bool):
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
    out = _surfel_raster(
        params["xyz"], jax.nn.sigmoid(params["opacity"][:, 0]), cam, bg, **kwargs
    )
    alpha = out.alpha
    # view -> world normal (row-vector: n_world = n_view @ R_w2c = n_view @ V[:3,:3].T)
    n = out.normal.transpose(1, 2, 0) @ cam.viewmatrix[:3, :3].T
    render_normal = n.transpose(2, 0, 1)
    depth_exp = out.depth_accum / jnp.where(alpha == 0.0, 1.0, alpha)
    depth_exp = jnp.nan_to_num(depth_exp, nan=0.0, posinf=0.0, neginf=0.0)
    depth_med = jnp.nan_to_num(out.depth_median, nan=0.0, posinf=0.0, neginf=0.0)
    surf_depth = depth_exp * (1.0 - depth_ratio) + depth_ratio * depth_med
    surf_normal = depth_to_normal_jax(cam, surf_depth)
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)
    return {
        "render": out.color,
        "radii": out.radii,
        "visibility_filter": out.radii > 0,
        "render_alpha": alpha,
        "render_normal": render_normal,
        "render_dist": out.distortion,
        "render_depth": surf_depth,
        "surf_normal": surf_normal,
        "num_dropped_keys": out.num_dropped_keys,
        "num_dropped_tail": out.num_dropped_tail,
    }


def render2d(
    cam: CameraJax,
    gaussians: GaussianState | GaussianData,
    bg,
    *,
    scaling_modifier: float = 1.0,
    override_color=None,
    sh_degree: int | None = None,
    depth_ratio: float = 1.0,
    cfg: RasterConfig | None = None,
):
    if isinstance(gaussians, GaussianData):
        gaussians = from_gaussian_data(gaussians)
    if cfg is None:
        cfg = default_raster_config(gaussians.capacity)
    degree = gaussians.sh_degree if sh_degree is None else sh_degree
    return _render2d_jit(
        gaussians.params, gaussians.alive, cam, jnp.asarray(bg, jnp.float32),
        jnp.zeros((gaussians.capacity, 3), jnp.float32)
        if override_color is None else override_color,
        jnp.float32(scaling_modifier), jnp.float32(depth_ratio),
        sh_degree=degree, cfg=cfg, has_override=override_color is not None,
    )
