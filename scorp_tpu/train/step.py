"""The jitted 3DGS training step.

One compiled program per (resolution, sh_degree, capacity) covering the
whole hot loop of the reference trainer (/root/reference/train_3dgs.py:72-193):
render -> photometric + depth + isotropic losses -> backward through the
differentiable rasterizer -> per-group Adam -> densification statistics.

Loss recipe (train_3dgs.py:106-150, OptimizationParams defaults at
gs3dgs/arguments/__init__.py:74-107):
  loss = (1-λ_dssim)·L1 + λ_dssim·(1-SSIM)
       + [iter > depth_from_iter] · ( λ_sensor·L1(depth | 0.3<d<7, rend>0)
                                    + 10·w(iter)·L1(minmax-norm depths | masked)
                                    + λ_iso·isotropic(scaling) )
with w(iter) log-lerped 0.25 -> 0.075 over the run.

The screen-space densification gradient is obtained by differentiating
against a zero NDC offset added to the projected means — the functional
equivalent of the reference's `screenspace_points.retain_grad()` trick.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import CameraJax
from ..ops.losses import isotropic_loss, l1_loss, ssim
from ..ops.raster import RasterConfig
from ..ops.raster import rasterize
from .state import AdamState, GaussianState, adam_update, expon_lr


@dataclass(frozen=True)
class OptParams:
    """Optimization hyperparameters (reference defaults)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    lambda_depth_sensor: float = 1.5
    lambda_isotropic: float = 0.0005
    opacity_cull: float = 0.6
    max_screen_size: float = 0.5
    depth_from_iter: int = 7000
    dn_l1_weight_init: float = 0.25
    dn_l1_weight_final: float = 0.075
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 25_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = True
    spatial_lr_scale: float = 1.0  # forced to 1.0 like gaussian_model.py:196


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    depth_loss: jnp.ndarray
    psnr: jnp.ndarray
    num_dropped_keys: jnp.ndarray
    num_dropped_tail: jnp.ndarray
    num_alive: jnp.ndarray


def _masked_mean(x, mask):
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)


def _masked_minmax_normalize(x, mask):
    big = jnp.float32(3.0e38)
    mn = jax.lax.stop_gradient(jnp.min(jnp.where(mask, x, big)))
    mx = jax.lax.stop_gradient(jnp.max(jnp.where(mask, x, -big)))
    return (x - mn) / jnp.maximum(mx - mn, 1e-8)


def compute_lrs(opt: OptParams, iteration):
    xyz_lr = expon_lr(
        iteration.astype(jnp.float32),
        opt.position_lr_init * opt.spatial_lr_scale,
        opt.position_lr_final * opt.spatial_lr_scale,
        opt.position_lr_max_steps,
        lr_delay_mult=opt.position_lr_delay_mult,
    )
    return {
        "xyz": xyz_lr,
        "f_dc": opt.feature_lr,
        "f_rest": opt.feature_lr / 20.0,
        "opacity": opt.opacity_lr,
        "scaling": opt.scaling_lr,
        "rotation": opt.rotation_lr,
    }


@partial(
    jax.jit,
    static_argnames=("opt", "sh_degree", "cfg", "has_depth_cam", "has_depth_est", "frozen"),
    donate_argnums=(1,),  # adam moments; state stats buffers may alias (zeros)
)
def train_step(
    state: GaussianState,
    adam: AdamState,
    cam: CameraJax,
    gt_image: jnp.ndarray,            # [3, H, W]
    gt_depth_cam: jnp.ndarray,        # [1, H, W] (zeros if absent)
    gt_depth_est: jnp.ndarray,        # [1, H, W] (zeros if absent)
    iteration: jnp.ndarray,           # scalar i32 (1-based)
    bg: jnp.ndarray,                  # [3]
    freeze_rows=0,                    # zero grads of the first K rows (2DGS tuning mask)
    *,
    opt: OptParams,
    sh_degree: int,
    cfg: RasterConfig,
    has_depth_cam: bool = False,
    has_depth_est: bool = False,
    frozen: tuple[str, ...] = (),
):
    alive = state.alive
    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    cap = state.capacity

    def loss_fn(params, deltas):
        shs = jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1)
        out = rasterize(
            params["xyz"],
            jax.nn.sigmoid(params["opacity"][:, 0]),
            cam,
            bg,
            shs=shs,
            sh_degree=sh_degree,
            scales=jnp.exp(params["scaling"]),
            quats=params["rotation"],
            screen_deltas=deltas,
            alive=alive,
            cfg=cfg,
        )
        image = out.color
        rend_depth = out.depth_accum / jnp.where(out.alpha == 0.0, 1.0, out.alpha)
        rend_depth = jnp.nan_to_num(rend_depth, nan=0.0, posinf=0.0, neginf=0.0)

        ll1 = l1_loss(image, gt_image)
        loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim(image, gt_image))

        after_warmup = (iteration > opt.depth_from_iter).astype(jnp.float32)
        depth_loss = jnp.float32(0.0)
        if has_depth_cam:
            m = (gt_depth_cam > 0.3) & (gt_depth_cam < 7.0) & (rend_depth > 0.0)
            depth_loss = depth_loss + opt.lambda_depth_sensor * _masked_mean(
                jnp.abs(rend_depth - gt_depth_cam), m
            )
        if has_depth_est:
            w = expon_lr(
                iteration.astype(jnp.float32),
                opt.dn_l1_weight_init, opt.dn_l1_weight_final, opt.iterations,
            )
            m = (rend_depth > 0.0) & (gt_depth_est > 0.0)
            pn = _masked_minmax_normalize(gt_depth_est, m)
            rn = _masked_minmax_normalize(rend_depth, m)
            depth_loss = depth_loss + 10.0 * w * _masked_mean(jnp.abs(rn - pn), m)
        depth_loss = depth_loss * after_warmup

        if opt.lambda_isotropic > 0:
            s = jnp.exp(params["scaling"])
            iso = jnp.abs(s - s.mean(axis=1, keepdims=True))
            iso = jnp.sum(jnp.where(alive[:, None], iso, 0.0)) / (n_alive * s.shape[1])
            loss = loss + after_warmup * opt.lambda_isotropic * iso

        loss = loss + depth_loss
        aux = (out, ll1, depth_loss, image)
        return loss, aux

    deltas0 = jnp.zeros((cap, 2), jnp.float32)
    (loss, (out, ll1, depth_loss, image)), (param_grads, delta_grads) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, deltas0)

    # densification statistics (only while densification is active)
    track = iteration < opt.densify_until_iter
    visible = out.radii > 0
    gnorm = jnp.linalg.norm(delta_grads, axis=-1)
    state = state._replace(
        max_radii2d=jnp.where(
            track & visible,
            jnp.maximum(state.max_radii2d, out.radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
        xyz_grad_accum=jnp.where(track & visible, state.xyz_grad_accum + gnorm, state.xyz_grad_accum),
        denom=jnp.where(track & visible, state.denom + 1.0, state.denom),
    )

    # Adam step (skipped on the final iteration, train_3dgs.py:190-193)
    # 2DGS tuning mask: freeze the first K rows by zeroing their gradients
    # (gs2dgs/scene/gaussian_model.py:498-508)
    row = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    unfrozen = row >= freeze_rows
    # jnp.where SELECT (never multiply): dead rows can carry NaN cotangents
    # (0-cotangent x inf local derivative through guarded divisions), and
    # NaN * 0 is still NaN. Dead rows mathematically have zero gradient, so
    # selecting 0 is exact — and keeps Adam/params of dead slots finite
    # forever (the round-4 densify-at-scale NaN entered through here).
    keep_row = jnp.logical_and(alive, unfrozen)
    param_grads = {
        k: jnp.where(keep_row.reshape((cap,) + (1,) * (v.ndim - 1)), v, 0.0)
        for k, v in param_grads.items()
    }
    lrs = compute_lrs(opt, iteration)
    new_params, new_adam = adam_update(state.params, param_grads, adam, lrs, frozen=frozen)
    do_step = iteration < opt.iterations
    params = jax.tree_util.tree_map(
        lambda new, old: jnp.where(do_step, new, old), new_params, state.params
    )
    adam = jax.tree_util.tree_map(
        lambda new, old: jnp.where(do_step, new, old), new_adam, adam
    )
    state = state._replace(params=params)

    mse = jnp.mean((jnp.clip(image, 0.0, 1.0) - jnp.clip(gt_image, 0.0, 1.0)) ** 2)
    metrics = StepMetrics(
        loss=loss,
        l1=ll1,
        depth_loss=depth_loss,
        psnr=-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
        num_dropped_keys=out.num_dropped_keys,
        num_dropped_tail=out.num_dropped_tail,
        num_alive=jnp.sum(alive.astype(jnp.int32)),
    )
    return state, adam, metrics
