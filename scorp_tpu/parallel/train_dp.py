"""Camera-batch data-parallel training step.

Replicated Gaussian state, a batch of B cameras (with their ground truths)
sharded across the mesh's `data` axis. Each device renders and
differentiates its own cameras; the mean over the batch is the only
cross-device communication (an ICI psum XLA inserts from the sharding).
One Adam step applies the averaged gradient — the B-camera generalization
of the reference's single-camera iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.camera import CameraJax
from ..ops.losses import l1_loss, ssim
from ..ops.raster import RasterConfig
from ..ops.raster import rasterize
from .. train.state import AdamState, GaussianState, adam_update
from ..train.step import OptParams, compute_lrs


@partial(
    jax.jit,
    static_argnames=("opt", "sh_degree", "cfg", "width", "height"),
)
def dp_train_step(
    state: GaussianState,
    adam: AdamState,
    cam_batch: dict,          # dict of stacked camera arrays, leading dim B
    gt_images: jnp.ndarray,   # [B, 3, H, W]
    iteration: jnp.ndarray,
    bg: jnp.ndarray,          # [3]
    *,
    opt: OptParams,
    sh_degree: int,
    cfg: RasterConfig,
    width: int,
    height: int,
):
    alive = state.alive
    cap = state.capacity

    def per_camera_loss(params, deltas, cam_leaves, gt):
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
        ll1 = l1_loss(out.color, gt)
        loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim(out.color, gt))
        return loss, (out.radii, ll1)

    def batch_loss(params, deltas):
        losses, (radii, ll1s) = jax.vmap(
            lambda cam_leaves, gt: per_camera_loss(params, deltas, cam_leaves, gt)
        )(cam_batch, gt_images)
        return losses.mean(), (radii, ll1s.mean())

    deltas0 = jnp.zeros((cap, 2), jnp.float32)
    (loss, (radii_b, ll1)), (pgrads, dgrads) = jax.value_and_grad(
        batch_loss, argnums=(0, 1), has_aux=True
    )(state.params, deltas0)

    # densification stats: radii max over batch, grads summed over batch
    radii = jnp.max(radii_b, axis=0)
    visible = radii > 0
    gnorm = jnp.linalg.norm(dgrads, axis=-1)
    track = iteration < opt.densify_until_iter
    state = state._replace(
        max_radii2d=jnp.where(
            track & visible,
            jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
        xyz_grad_accum=jnp.where(track & visible, state.xyz_grad_accum + gnorm,
                                 state.xyz_grad_accum),
        denom=jnp.where(track & visible, state.denom + 1.0, state.denom),
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
