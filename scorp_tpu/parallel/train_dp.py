"""Camera-batch data-parallel training step.

Replicated Gaussian state, a batch of B cameras (with their ground truths)
sharded across the mesh's `data` axis. Each device renders and
differentiates its own cameras; the batch mean of the loss gradient and the
batch sums of the densification statistics are the only cross-device
communication (ICI psums XLA inserts from the shardings). One Adam step
applies the averaged gradient — the B-camera generalization of the
reference's single-camera iteration, with the full train_3dgs loss recipe
(photometric + sensor-depth + normalized mono-depth + isotropic) and the
reference's per-camera densification accounting: each camera contributes its
own NDC screen-gradient norm and visibility to xyz_grad_accum/denom, exactly
as B sequential reference iterations would.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.camera import CameraJax
from ..ops.losses import l1_loss, ssim
from ..ops.raster import RasterConfig
from ..ops.raster import rasterize
from ..train.state import AdamState, GaussianState, adam_update, expon_lr
from ..train.step import (
    OptParams,
    _masked_mean,
    _masked_minmax_normalize,
    compute_lrs,
)


@partial(
    jax.jit,
    static_argnames=(
        "opt", "sh_degree", "cfg", "width", "height",
        "has_depth_cam", "has_depth_est",
    ),
)
def dp_train_step(
    state: GaussianState,
    adam: AdamState,
    cam_batch: dict,          # dict of stacked camera arrays, leading dim B
    gt_images: jnp.ndarray,   # [B, 3, H, W]
    iteration: jnp.ndarray,
    bg: jnp.ndarray,          # [3]
    gt_depth_cam: jnp.ndarray | None = None,   # [B, 1, H, W]
    gt_depth_est: jnp.ndarray | None = None,   # [B, 1, H, W]
    *,
    opt: OptParams,
    sh_degree: int,
    cfg: RasterConfig,
    width: int,
    height: int,
    has_depth_cam: bool = False,
    has_depth_est: bool = False,
):
    alive = state.alive
    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    cap = state.capacity
    after_warmup = (iteration > opt.depth_from_iter).astype(jnp.float32)

    if gt_depth_cam is None:
        gt_depth_cam = jnp.zeros_like(gt_images[:, :1])
    if gt_depth_est is None:
        gt_depth_est = jnp.zeros_like(gt_images[:, :1])

    def per_camera_loss(params, deltas, cam_leaves, gt, d_cam, d_est):
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
            screen_deltas=deltas,
            alive=alive, cfg=cfg,
        )
        image = out.color
        rend_depth = out.depth_accum / jnp.where(out.alpha == 0.0, 1.0, out.alpha)
        rend_depth = jnp.nan_to_num(rend_depth, nan=0.0, posinf=0.0, neginf=0.0)

        ll1 = l1_loss(image, gt)
        loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (
            1.0 - ssim(image, gt)
        )
        depth_loss = jnp.float32(0.0)
        if has_depth_cam:
            m = (d_cam > 0.3) & (d_cam < 7.0) & (rend_depth > 0.0)
            depth_loss = depth_loss + opt.lambda_depth_sensor * _masked_mean(
                jnp.abs(rend_depth - d_cam), m
            )
        if has_depth_est:
            w = expon_lr(
                iteration.astype(jnp.float32),
                opt.dn_l1_weight_init, opt.dn_l1_weight_final, opt.iterations,
            )
            m = (rend_depth > 0.0) & (d_est > 0.0)
            pn = _masked_minmax_normalize(d_est, m)
            rn = _masked_minmax_normalize(rend_depth, m)
            depth_loss = depth_loss + 10.0 * w * _masked_mean(jnp.abs(rn - pn), m)
        loss = loss + depth_loss * after_warmup
        return loss, (out.radii, ll1)

    def batch_loss(params, deltas_b):
        losses, (radii, ll1s) = jax.vmap(
            lambda deltas, cam_leaves, gt, dc, de: per_camera_loss(
                params, deltas, cam_leaves, gt, dc, de
            )
        )(deltas_b, cam_batch, gt_images, gt_depth_cam, gt_depth_est)
        loss = losses.mean()
        # isotropic regularizer is per-state, not per-camera
        if opt.lambda_isotropic > 0:
            s = jnp.exp(params["scaling"])
            iso = jnp.abs(s - s.mean(axis=1, keepdims=True))
            iso = jnp.sum(jnp.where(alive[:, None], iso, 0.0)) / (n_alive * s.shape[1])
            loss = loss + after_warmup * opt.lambda_isotropic * iso
        return loss, (radii, ll1s.mean())

    b = gt_images.shape[0]
    # per-camera screen deltas so each camera's NDC gradient is separable
    # (the reference's densification stat accumulates per camera)
    deltas0 = jnp.zeros((b, cap, 2), jnp.float32)
    (loss, (radii_b, ll1)), (pgrads, dgrads_b) = jax.value_and_grad(
        batch_loss, argnums=(0, 1), has_aux=True
    )(state.params, deltas0)

    # densification stats, per camera then summed over the batch: each
    # camera adds its own grad-norm and visibility count (matches B
    # sequential reference iterations; mean-loss scaling undone by *B)
    track = iteration < opt.densify_until_iter
    visible_b = radii_b > 0                                   # [B, cap]
    gnorm_b = jnp.linalg.norm(dgrads_b, axis=-1) * b          # [B, cap]
    gacc = jnp.sum(jnp.where(visible_b, gnorm_b, 0.0), axis=0)
    dcount = jnp.sum(visible_b.astype(jnp.float32), axis=0)
    radii_max = jnp.max(radii_b, axis=0)
    any_visible = jnp.any(visible_b, axis=0)
    state = state._replace(
        max_radii2d=jnp.where(
            track & any_visible,
            jnp.maximum(state.max_radii2d, radii_max.astype(jnp.float32)),
            state.max_radii2d,
        ),
        xyz_grad_accum=jnp.where(track, state.xyz_grad_accum + gacc,
                                 state.xyz_grad_accum),
        denom=jnp.where(track, state.denom + dcount, state.denom),
    )

    lrs = compute_lrs(opt, iteration)
    new_params, adam = adam_update(state.params, pgrads, adam, lrs)
    state = state._replace(params=new_params)
    return state, adam, {"loss": loss, "l1": ll1}


@partial(
    jax.jit,
    static_argnames=(
        "opt", "sh_degree", "cfg", "width", "height",
        "has_depth_cam", "has_depth_est",
    ),
)
def dp_train_step_2d(
    state: GaussianState,
    adam: AdamState,
    cam_batch: dict,          # dict of stacked camera arrays, leading dim B
    gt_images: jnp.ndarray,   # [B, 3, H, W]
    iteration: jnp.ndarray,
    bg: jnp.ndarray,          # [3]
    gt_depth_cam: jnp.ndarray | None = None,
    gt_depth_est: jnp.ndarray | None = None,
    *,
    opt,                      # Opt2DParams
    sh_degree: int,
    cfg: RasterConfig,
    width: int,
    height: int,
    has_depth_cam: bool = False,
    has_depth_est: bool = False,
):
    """Camera-batch DP step for the 2DGS surfel trainer: the dp_train_step
    scaffolding with the train_2dgs loss recipe (photometric + normal
    consistency after 7k + distortion after 3k + depth/depth-normal terms;
    see train.step2d)."""
    from ..ops.raster import rasterize_surfel
    from ..ops.raster.surfel import depth_to_normal_jax

    alive = state.alive
    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    cap = state.capacity
    after_warmup = (iteration > opt.depth_from_iter).astype(jnp.float32)

    if gt_depth_cam is None:
        gt_depth_cam = jnp.zeros_like(gt_images[:, :1])
    if gt_depth_est is None:
        gt_depth_est = jnp.zeros_like(gt_images[:, :1])

    def per_camera_loss(params, deltas, cam_leaves, gt, d_cam, d_est):
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
        out = rasterize_surfel(
            params["xyz"],
            jax.nn.sigmoid(params["opacity"][:, 0]),
            cam, bg,
            shs=shs, sh_degree=sh_degree,
            scales=jnp.exp(params["scaling"]),
            quats=params["rotation"],
            screen_deltas=deltas, alive=alive, cfg=cfg,
        )
        image = out.color
        alpha = out.alpha
        depth_exp = out.depth_accum / jnp.where(alpha == 0.0, 1.0, alpha)
        depth_exp = jnp.nan_to_num(depth_exp, nan=0.0, posinf=0.0, neginf=0.0)
        depth_med = jnp.nan_to_num(out.depth_median, nan=0.0, posinf=0.0,
                                   neginf=0.0)
        rend_depth = (depth_exp * (1.0 - opt.depth_ratio)
                      + opt.depth_ratio * depth_med)
        nrm = out.normal.transpose(1, 2, 0) @ cam.viewmatrix[:3, :3].T
        rend_normal = nrm.transpose(2, 0, 1)
        surf_normal = depth_to_normal_jax(cam, rend_depth) * jax.lax.stop_gradient(alpha)

        ll1 = l1_loss(image, gt)
        loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (
            1.0 - ssim(image, gt)
        )
        depth_loss = jnp.float32(0.0)
        if has_depth_cam:
            m = (d_cam > 0.3) & (d_cam < 7.0) & (rend_depth > 0.0)
            depth_loss = depth_loss + opt.lambda_depth_sensor * _masked_mean(
                jnp.abs(rend_depth - d_cam), m
            )
        if has_depth_est:
            w = expon_lr(
                iteration.astype(jnp.float32),
                opt.dn_l1_weight_init, opt.dn_l1_weight_final, opt.iterations,
            )
            m = (rend_depth > 0.0) & (d_est > 0.0)
            pn = _masked_minmax_normalize(d_est, m)
            rn = _masked_minmax_normalize(rend_depth, m)
            depth_loss = depth_loss + 10.0 * w * _masked_mean(jnp.abs(rn - pn), m)
            pred_normal = jax.lax.stop_gradient(depth_to_normal_jax(cam, d_est))
            late = (iteration > opt.depth_from_iter + 1000).astype(jnp.float32)
            dn = (1.0 - (surf_normal * pred_normal).sum(axis=0)).mean()
            rn_loss = (1.0 - (rend_normal * pred_normal).sum(axis=0)).mean()
            depth_loss = depth_loss + late * w * (dn + rn_loss)

        lam_n = jnp.where(iteration > 7000, opt.lambda_normal, 0.0)
        lam_d = jnp.where(iteration > 3000, opt.lambda_dist, 0.0)
        normal_loss = lam_n * (1.0 - (rend_normal * surf_normal).sum(axis=0)).mean()
        dist_loss = lam_d * out.distortion.mean()

        loss = loss + depth_loss * after_warmup + normal_loss + dist_loss
        return loss, (out.radii, ll1)

    def batch_loss(params, deltas_b):
        losses, (radii, ll1s) = jax.vmap(
            lambda deltas, cam_leaves, gt, dc, de: per_camera_loss(
                params, deltas, cam_leaves, gt, dc, de
            )
        )(deltas_b, cam_batch, gt_images, gt_depth_cam, gt_depth_est)
        loss = losses.mean()
        # reference nesting: isotropic only when an estimated depth exists
        if has_depth_est and opt.lambda_isotropic > 0:
            s = jnp.exp(params["scaling"])
            iso = jnp.abs(s - s.mean(axis=1, keepdims=True))
            iso = jnp.sum(jnp.where(alive[:, None], iso, 0.0)) / (n_alive * s.shape[1])
            loss = loss + after_warmup * opt.lambda_isotropic * iso
        return loss, (radii, ll1s.mean())

    b = gt_images.shape[0]
    deltas0 = jnp.zeros((b, cap, 2), jnp.float32)
    (loss, (radii_b, ll1)), (pgrads, dgrads_b) = jax.value_and_grad(
        batch_loss, argnums=(0, 1), has_aux=True
    )(state.params, deltas0)

    track = iteration < opt.densify_until_iter
    visible_b = radii_b > 0
    gnorm_b = jnp.linalg.norm(dgrads_b, axis=-1) * b
    gacc = jnp.sum(jnp.where(visible_b, gnorm_b, 0.0), axis=0)
    dcount = jnp.sum(visible_b.astype(jnp.float32), axis=0)
    radii_max = jnp.max(radii_b, axis=0)
    any_visible = jnp.any(visible_b, axis=0)
    state = state._replace(
        max_radii2d=jnp.where(
            track & any_visible,
            jnp.maximum(state.max_radii2d, radii_max.astype(jnp.float32)),
            state.max_radii2d,
        ),
        xyz_grad_accum=jnp.where(track, state.xyz_grad_accum + gacc,
                                 state.xyz_grad_accum),
        denom=jnp.where(track, state.denom + dcount, state.denom),
    )

    lrs = compute_lrs(opt, iteration)
    new_params, adam = adam_update(state.params, pgrads, adam, lrs)
    state = state._replace(params=new_params)
    return state, adam, {"loss": loss, "l1": ll1}


def stack_cameras(cams: list[CameraJax]) -> dict:
    """Stack camera leaves into a batch dict (all must share resolution)."""
    assert len({(c.width, c.height) for c in cams}) == 1
    return {
        "viewmatrix": jnp.stack([c.viewmatrix for c in cams]),
        "projmatrix": jnp.stack([c.projmatrix for c in cams]),
        "campos": jnp.stack([c.campos for c in cams]),
        "tanfovx": jnp.stack([jnp.asarray(c.tanfovx) for c in cams]),
        "tanfovy": jnp.stack([jnp.asarray(c.tanfovy) for c in cams]),
    }
