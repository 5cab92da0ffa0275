"""The jitted 2DGS (surfel) training step.

Hot loop of /root/reference/train_2dgs.py:33-230: photometric + depth losses
as in the 3DGS step, plus the 2DGS regularizers (train_2dgs.py:141-150):
  * normal consistency λ_normal·mean(1 − rend_normal·surf_normal) after
    iteration 7000;
  * depth distortion λ_dist·mean(render_dist) after iteration 3000;
  * depth-normal terms after depth_from_iter + 1000 when an estimated depth
    exists: w·[(1 − surf_normal·pred_normal) + (1 − rend_normal·pred_normal)].
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.camera import CameraJax
from ..ops.losses import l1_loss, ssim
from ..ops.raster import RasterConfig, rasterize_surfel
from ..ops.raster.surfel import depth_to_normal_jax
from .state import AdamState, GaussianState, adam_update, expon_lr
from .step import OptParams, StepMetrics, _masked_mean, _masked_minmax_normalize, compute_lrs


@dataclass(frozen=True)
class Opt2DParams(OptParams):
    """2DGS deltas (gs2dgs/arguments/__init__.py:95-109)."""

    lambda_normal: float = 0.05
    lambda_dist: float = 0.0
    depth_ratio: float = 1.0
    opacity_cull: float = 0.5
    max_screen_size: float = 0.2
    # gs2dgs overrides of the 3DGS loss weights
    lambda_isotropic: float = 0.0001
    dn_l1_weight_init: float = 0.2
    dn_l1_weight_final: float = 0.05


@partial(
    jax.jit,
    static_argnames=("opt", "sh_degree", "cfg", "has_depth_cam", "has_depth_est", "frozen"),
    donate_argnums=(1,),
)
def train_step_2d(
    state: GaussianState,
    adam: AdamState,
    cam: CameraJax,
    gt_image: jnp.ndarray,
    gt_depth_cam: jnp.ndarray,
    gt_depth_est: jnp.ndarray,
    iteration: jnp.ndarray,
    bg: jnp.ndarray,
    freeze_rows=0,                    # zero grads of the first K rows (2DGS tuning mask)
    *,
    opt: Opt2DParams,
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
        depth_med = jnp.nan_to_num(out.depth_median, nan=0.0, posinf=0.0, neginf=0.0)
        rend_depth = depth_exp * (1.0 - opt.depth_ratio) + opt.depth_ratio * depth_med
        n = out.normal.transpose(1, 2, 0) @ cam.viewmatrix[:3, :3].T
        rend_normal = n.transpose(2, 0, 1)
        surf_normal = depth_to_normal_jax(cam, rend_depth) * jax.lax.stop_gradient(alpha)

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
            # depth-normal consistency after an extra 1000-iteration warmup
            pred_normal = jax.lax.stop_gradient(depth_to_normal_jax(cam, gt_depth_est))
            late = (iteration > opt.depth_from_iter + 1000).astype(jnp.float32)
            dn = (1.0 - (surf_normal * pred_normal).sum(axis=0)).mean()
            rn_loss = (1.0 - (rend_normal * pred_normal).sum(axis=0)).mean()
            depth_loss = depth_loss + late * w * (dn + rn_loss)
        # the reference adds the isotropic term only inside the depth_est
        # branch (train_2dgs.py loss nesting)
        if has_depth_est and opt.lambda_isotropic > 0:
            s = jnp.exp(params["scaling"])
            iso = jnp.abs(s - s.mean(axis=1, keepdims=True))
            iso = jnp.sum(jnp.where(alive[:, None], iso, 0.0)) / (n_alive * s.shape[1])
            loss = loss + after_warmup * opt.lambda_isotropic * iso
        depth_loss = depth_loss * after_warmup

        lam_n = jnp.where(iteration > 7000, opt.lambda_normal, 0.0)
        lam_d = jnp.where(iteration > 3000, opt.lambda_dist, 0.0)
        normal_loss = lam_n * (1.0 - (rend_normal * surf_normal).sum(axis=0)).mean()
        dist_loss = lam_d * out.distortion.mean()

        total = loss + depth_loss + normal_loss + dist_loss
        return total, (out, ll1, depth_loss, image)

    deltas0 = jnp.zeros((cap, 2), jnp.float32)
    (loss, (out, ll1, depth_loss, image)), (param_grads, delta_grads) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, deltas0)

    track = iteration < opt.densify_until_iter
    visible = out.radii > 0
    gnorm = jnp.linalg.norm(delta_grads, axis=-1)
    state = state._replace(
        max_radii2d=jnp.where(
            track & visible,
            jnp.maximum(state.max_radii2d, out.radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
        xyz_grad_accum=jnp.where(track & visible, state.xyz_grad_accum + gnorm,
                                 state.xyz_grad_accum),
        denom=jnp.where(track & visible, state.denom + 1.0, state.denom),
    )

    # 2DGS tuning mask: freeze the first K rows by zeroing their gradients
    # (gs2dgs/scene/gaussian_model.py:498-508)
    row = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    unfrozen = row >= freeze_rows
    # SELECT, never multiply: dead rows can carry NaN cotangents (see
    # step.py) and NaN * 0 is still NaN — zero them exactly via where
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
        loss=loss, l1=ll1, depth_loss=depth_loss,
        psnr=-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
        num_dropped_keys=out.num_dropped_keys,
        num_dropped_tail=out.num_dropped_tail,
        num_alive=jnp.sum(alive.astype(jnp.int32)),
    )
    return state, adam, metrics
