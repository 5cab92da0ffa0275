"""Registration-constrained appearance refinement step.

The jitted core of /root/reference/post_refine_gs.py:30-237: color-only
optimization (xyz/rotation/scaling/opacity frozen) of the merged aligned
proxies against masked object RGBA ground truth:

    loss = (1-λ)·L1(image·α, gt·α) + λ·(1-SSIM(image·α, gt·α))

with the standard per-group Adam and xyz LR schedule (the xyz group is
frozen so only the feature LRs matter).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.camera import CameraJax
from ..ops.losses import l1_loss, ssim
from ..ops.raster import RasterConfig, rasterize
from .state import AdamState, GaussianState, adam_update
from .step import OptParams, compute_lrs

FROZEN_REFINE = ("xyz", "rotation", "scaling", "opacity")


@partial(
    jax.jit,
    static_argnames=("opt", "sh_degree", "cfg", "frozen"),
    donate_argnums=(1,),
)
def refine_step(
    state: GaussianState,
    adam: AdamState,
    cam: CameraJax,
    gt_image: jnp.ndarray,   # [3, H, W]
    gt_alpha: jnp.ndarray,   # [1, H, W]
    iteration: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    opt: OptParams,
    sh_degree: int,
    cfg: RasterConfig,
    frozen: tuple[str, ...] = FROZEN_REFINE,
):
    alive = state.alive

    def loss_fn(params):
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
        mask = jnp.broadcast_to(gt_alpha, gt_image.shape)
        masked_image = out.color * mask
        masked_gt = gt_image * mask
        ll1 = l1_loss(masked_image, masked_gt)
        loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (
            1.0 - ssim(masked_image, masked_gt)
        )
        return loss, ll1

    (loss, ll1), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    # SELECT dead-row gradients to exact zero (NaN cotangents through
    # guarded divisions on padded rows — see step.py)
    cap = state.capacity
    grads = {
        k: jnp.where(alive.reshape((cap,) + (1,) * (v.ndim - 1)), v, 0.0)
        for k, v in grads.items()
    }
    lrs = compute_lrs(opt, iteration)
    new_params, new_adam = adam_update(state.params, grads, adam, lrs, frozen=frozen)
    do_step = iteration < opt.iterations
    params = jax.tree_util.tree_map(
        lambda new, old: jnp.where(do_step, new, old), new_params, state.params
    )
    adam = jax.tree_util.tree_map(
        lambda new, old: jnp.where(do_step, new, old), new_adam, adam
    )
    return state._replace(params=params), adam, {"loss": loss, "l1": ll1}
