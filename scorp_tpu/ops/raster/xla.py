"""Pure-XLA tile compositing (golden path, differentiable by autodiff).

The front-to-back alpha compositing loop of the reference CUDA rasterizer is
re-expressed as a chunked scan that is both XLA-friendly and exactly
semantics-preserving:

  * within a chunk of C depth-ordered Gaussians, per-pixel blending weights
    w_i = α_i · T·∏_{j<i}(1-α_j) come from a cumulative product, and the
    CUDA early-termination rule ("skip the Gaussian that would drop
    transmittance below 1e-4, then stop") becomes a cummax over the
    trigger mask — exact, because until the trigger every Gaussian is
    included, and after it none are;
  * the color accumulation Σ w_i c_i is a [C,P]x[C,3] contraction that XLA
    maps onto the MXU;
  * per-pixel state (transmittance, stopped flag) carries across chunks.

Because the whole forward is jnp, jax.grad delivers gradients that match the
hand-derived CUDA backward (including the exclusion of post-termination
Gaussians and the SH clamp gate). The naive O(N·P) renderer below is the
obviously-correct cross-check used by tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core.camera import CameraJax
from .common import (
    TILE,
    Preprocessed,
    RasterConfig,
    TileBins,
    bin_gaussians,
    preprocess,
    tile_pixel_coords,
    tiles_to_image,
)

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class RasterOutput(NamedTuple):
    color: jnp.ndarray        # [3, H, W]
    depth_accum: jnp.ndarray  # [1, H, W] alpha-weighted accumulated view z
    alpha: jnp.ndarray        # [1, H, W]
    radii: jnp.ndarray        # [N] int32
    num_dropped_keys: jnp.ndarray
    num_dropped_tail: jnp.ndarray


def _chunk_alphas(prep: Preprocessed, ids, pix_x, pix_y):
    """ids [T,C] -> (alpha [T,C,P], color [T,C,3], depth [T,C])."""
    mask = ids >= 0
    safe = jnp.maximum(ids, 0)
    xy = prep.xy[safe]          # [T,C,2]
    conic = prep.conic[safe]    # [T,C,3]
    color = prep.color[safe]    # [T,C,3]
    opa = prep.opacity[safe]    # [T,C]
    depth = prep.depth[safe]    # [T,C]

    dx = xy[..., 0][:, :, None] - pix_x[:, None, :]   # [T,C,P]
    dy = xy[..., 1][:, :, None] - pix_y[:, None, :]
    a = conic[..., 0][:, :, None]
    b = conic[..., 1][:, :, None]
    cc = conic[..., 2][:, :, None]
    power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opa[:, :, None] * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN) | ~mask[:, :, None], 0.0, alpha)
    return alpha, color, depth


def composite_tiles(
    prep: Preprocessed,
    bins: TileBins,
    pix_x: jnp.ndarray,
    pix_y: jnp.ndarray,
    cfg: RasterConfig,
    remat: bool = True,
):
    """Front-to-back blend of the per-tile lists.

    Returns (color [T,P,3], depth [T,P], transmittance [T,P]).
    """
    num_tiles, L = bins.tile_lists.shape
    C = min(cfg.chunk, L)
    assert L % C == 0, "tile_list_len must be a multiple of chunk"
    p = pix_x.shape[1]
    xs = bins.tile_lists.reshape(num_tiles, L // C, C).transpose(1, 0, 2)

    def body(carry, ids):
        t_carry, stopped, acc_c, acc_d = carry
        alpha, color, depth = _chunk_alphas(prep, ids, pix_x, pix_y)

        one_minus = 1.0 - alpha
        cum_incl = jnp.cumprod(one_minus, axis=1)                       # [T,C,P]
        t_after_raw = t_carry[:, None, :] * cum_incl
        trigger = t_after_raw < T_EPS
        stopped_at = jnp.logical_or(
            jnp.cumsum(trigger.astype(jnp.int32), axis=1) > 0, stopped[:, None, :]
        )
        include = ~stopped_at
        cum_before = jnp.concatenate(
            [jnp.ones_like(cum_incl[:, :1, :]), cum_incl[:, :-1, :]], axis=1
        )
        t_before = t_carry[:, None, :] * cum_before
        weight = jnp.where(include, alpha * t_before, 0.0)              # [T,C,P]

        acc_c = acc_c + jnp.einsum(
            "tcp,tcd->tpd", weight, color, preferred_element_type=jnp.float32
        )
        acc_d = acc_d + jnp.einsum(
            "tcp,tc->tp", weight, depth, preferred_element_type=jnp.float32
        )
        t_carry = t_carry * jnp.prod(
            1.0 - jnp.where(include, alpha, 0.0), axis=1
        )
        stopped = stopped | jnp.any(trigger, axis=1)
        return (t_carry, stopped, acc_c, acc_d), None

    if remat:
        body = jax.checkpoint(body)

    init = (
        jnp.ones((num_tiles, p), jnp.float32),
        jnp.zeros((num_tiles, p), bool),
        jnp.zeros((num_tiles, p, 3), jnp.float32),
        jnp.zeros((num_tiles, p), jnp.float32),
    )
    (t_final, _, acc_c, acc_d), _ = jax.lax.scan(body, init, xs)
    return acc_c, acc_d, t_final


def rasterize_xla(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: CameraJax,
    bg: jnp.ndarray,
    *,
    shs: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors_precomp: jnp.ndarray | None = None,
    scales: jnp.ndarray | None = None,
    quats: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    screen_deltas: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    cfg: RasterConfig = RasterConfig(),
    remat: bool = True,
) -> RasterOutput:
    """Full differentiable forward pass (preprocess -> bin -> composite)."""
    w, h = cam.width, cam.height
    prep = preprocess(
        means3d, opacities, cam,
        shs=shs, sh_degree=sh_degree, colors_precomp=colors_precomp,
        scales=scales, quats=quats, cov3d_precomp=cov3d_precomp,
        scale_modifier=scale_modifier, screen_deltas=screen_deltas, alive=alive,
    )
    bins = jax.lax.stop_gradient(
        bin_gaussians(jax.lax.stop_gradient(prep), w, h, cfg)
    )
    pix_x, pix_y = tile_pixel_coords(w, h)
    acc_c, acc_d, t_final = composite_tiles(prep, bins, pix_x, pix_y, cfg, remat=remat)

    color_tiles = acc_c + t_final[..., None] * bg[None, None, :]
    color = tiles_to_image(color_tiles, w, h)
    depth = tiles_to_image(acc_d[..., None], w, h)
    alpha = tiles_to_image((1.0 - t_final)[..., None], w, h)
    return RasterOutput(
        color, depth, alpha, prep.radii,
        bins.num_dropped_keys, bins.num_dropped_tail,
    )


def rasterize_naive(
    means3d, opacities, cam: CameraJax, bg, *,
    shs=None, sh_degree: int = 0, colors_precomp=None,
    scales=None, quats=None, cov3d_precomp=None, scale_modifier: float = 1.0,
    screen_deltas=None, alive=None,
) -> RasterOutput:
    """O(N·H·W) reference renderer: global depth sort + per-pixel compositing.

    Semantically identical to the tiled path (including the conservative
    tile-rect inclusion test and early termination); for tiny test scenes.
    """
    w, h = cam.width, cam.height
    prep = preprocess(
        means3d, opacities, cam,
        shs=shs, sh_degree=sh_degree, colors_precomp=colors_precomp,
        scales=scales, quats=quats, cov3d_precomp=cov3d_precomp,
        scale_modifier=scale_modifier, screen_deltas=screen_deltas, alive=alive,
    )
    n = means3d.shape[0]
    order = jax.lax.stop_gradient(
        jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf), stable=True)
    )

    xy = prep.xy[order]
    conic = prep.conic[order]
    color = prep.color[order]
    opa = prep.opacity[order]
    depth = prep.depth[order]
    valid = prep.valid[order]
    rect = prep.rect[order]

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    tile_x = (xs / TILE).astype(jnp.int32)
    tile_y = (ys / TILE).astype(jnp.int32)

    # [N, P] inclusion by tile-rect coverage (matches binning conservatism)
    covers = (
        (rect[:, 0][:, None] <= tile_x[None, :])
        & (tile_x[None, :] < rect[:, 2][:, None])
        & (rect[:, 1][:, None] <= tile_y[None, :])
        & (tile_y[None, :] < rect[:, 3][:, None])
        & valid[:, None]
    )
    dx = xy[:, 0][:, None] - xs[None, :]
    dy = xy[:, 1][:, None] - ys[None, :]
    power = -0.5 * (conic[:, 0][:, None] * dx * dx + conic[:, 2][:, None] * dy * dy) \
        - conic[:, 1][:, None] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opa[:, None] * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN) | ~covers, 0.0, alpha)

    cum_incl = jnp.cumprod(1.0 - alpha, axis=0)
    trigger = cum_incl < T_EPS
    stopped_at = jnp.cumsum(trigger.astype(jnp.int32), axis=0) > 0
    include = ~stopped_at
    cum_before = jnp.concatenate([jnp.ones_like(cum_incl[:1]), cum_incl[:-1]], axis=0)
    weight = jnp.where(include, alpha * cum_before, 0.0)               # [N,P]

    acc_c = jnp.einsum("np,nd->pd", weight, color)
    acc_d = jnp.einsum("np,n->p", weight, depth)
    t_final = jnp.prod(1.0 - jnp.where(include, alpha, 0.0), axis=0)

    img = (acc_c + t_final[:, None] * bg[None, :]).T.reshape(3, h, w)
    depth_img = acc_d.reshape(1, h, w)
    alpha_img = (1.0 - t_final).reshape(1, h, w)
    return RasterOutput(img, depth_img, alpha_img, prep.radii,
                        jnp.int32(0), jnp.int32(0))
