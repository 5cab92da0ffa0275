"""Camera-parallel evaluation rendering.

Per-camera renders are independent (reference eval loop renders one camera
at a time on one GPU — gs3dgs/render_3dgs.py:20-35), so the TPU-native
scale-out is embarrassingly parallel: shard a batch of B cameras over the
mesh's `data` axis, replicate the Gaussian state, and jit the vmapped
forward — XLA partitions the batch dimension with zero collectives; each
device renders B/n_devices frames over ICI-free local compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.camera import CameraJax
from ..ops.raster import RasterConfig, rasterize


@partial(jax.jit, static_argnames=("sh_degree", "cfg", "width", "height"))
def dp_render(
    params: dict,             # GaussianState.params (replicated)
    alive: jnp.ndarray,       # [cap] bool (replicated)
    cam_batch: dict,          # stacked camera leaves, leading dim B (sharded)
    bg: jnp.ndarray,          # [3]
    *,
    sh_degree: int,
    cfg: RasterConfig,
    width: int,
    height: int,
):
    """Render a batch of cameras; returns (color [B,3,H,W], alpha [B,1,H,W],
    depth [B,1,H,W]). Shard `cam_batch` leaves over the mesh's data axis and
    replicate `params`/`alive` (parallel.mesh helpers) to scale over chips."""

    def one(cam_leaves):
        cam = CameraJax(
            viewmatrix=cam_leaves["viewmatrix"],
            projmatrix=cam_leaves["projmatrix"],
            campos=cam_leaves["campos"],
            tanfovx=cam_leaves["tanfovx"],
            tanfovy=cam_leaves["tanfovy"],
            width=width,
            height=height,
        )
        shs = jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1)
        out = rasterize(
            params["xyz"],
            jax.nn.sigmoid(params["opacity"][:, 0]),
            cam, bg,
            shs=shs, sh_degree=sh_degree,
            scales=jnp.exp(params["scaling"]),
            quats=params["rotation"],
            alive=alive, cfg=cfg,
        )
        depth = out.depth_accum / jnp.where(out.alpha == 0.0, 1.0, out.alpha)
        depth = jnp.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0)
        return out.color, out.alpha, depth

    return jax.vmap(one)(cam_batch)
