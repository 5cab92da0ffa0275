"""3D mask lifting by gradient voting.

Re-implements the reference's `get_mask3d` (/root/reference/utils/mask.py:31-126)
TPU-natively. The reference renders with an all-ones override color and, per
prompt, backprops the masked / inverse-masked render means, accumulating
±‖d(render)/d(color_i)‖ votes. Because the rasterizer is linear in the
override colors, that gradient is exactly Σ_p w_ip·g_p (w = blending
weights), identical across channels, so

    ‖grad_masked‖ − ‖grad_inv‖ ∝ Σ_p w_ip·(2·mask_p − 1).

One render VJP per (camera, prompt) with the signed mask as cotangent
produces the same votes (same sign, positive scale) without the reference's
2·K backward passes per camera. The final segmentation is votes > 0, as in
segmentation_3dgs.py:124. The "binary" voting mode thresholds per-camera
contributions; "projection" votes by projected center membership.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.camera import CameraJax
from ..ops.raster import RasterConfig
from ..ops.raster import rasterize
from ..ops.raster.common import preprocess
from ..render import default_raster_config
from ..train.state import GaussianState


@partial(jax.jit, static_argnames=("cfg", "surfel"))
def _vote_step(params, alive, cam: CameraJax, signed_mask, bg, *, cfg: RasterConfig,
               surfel: bool = False):
    """One camera's signed gradient votes [N] (+ inside-mask evidence)."""

    def masked_mean(colors):
        if surfel:
            from ..ops.raster.surfel import rasterize_surfel_xla as raster_fn
        else:
            raster_fn = rasterize
        out = raster_fn(
            params["xyz"],
            jax.nn.sigmoid(params["opacity"][:, 0]),
            cam, bg,
            colors_precomp=colors,
            scales=jnp.exp(params["scaling"]),
            quats=params["rotation"],
            alive=alive, cfg=cfg,
        )
        # mean over H*W*3 of render * signed mask
        return (out.color * signed_mask[None, :, :]).mean()

    ones = jnp.ones((params["xyz"].shape[0], 3), jnp.float32)
    grad = jax.grad(masked_mean)(ones)
    # channels are identical; keep the reference's norm scaling (sqrt(3))
    return grad[:, 0] * jnp.sqrt(3.0)


@partial(jax.jit, static_argnames=("cfg",))
def _projection_vote_step(params, alive, cam: CameraJax, mask, *, cfg: RasterConfig):
    prep = preprocess(
        params["xyz"],
        jax.nn.sigmoid(params["opacity"][:, 0]),
        cam,
        colors_precomp=jnp.ones((params["xyz"].shape[0], 3)),
        scales=jnp.exp(params["scaling"]),
        quats=params["rotation"],
        alive=alive,
    )
    xy = jnp.round(prep.xy).astype(jnp.int32)
    w, h = cam.width, cam.height
    inside = (xy[:, 0] >= 0) & (xy[:, 0] < w) & (xy[:, 1] >= 0) & (xy[:, 1] < h)
    xc = jnp.clip(xy[:, 0], 0, w - 1)
    yc = jnp.clip(xy[:, 1], 0, h - 1)
    in_mask = mask[yc, xc] > 0
    return jnp.where(inside & alive, jnp.where(in_mask, 1.0, -1.0), 0.0)


def load_mask_rgba(path: str, resolution=None) -> np.ndarray:
    """Read an object RGBA image; mask = alpha > 0 (mask.py:56-58)."""
    with Image.open(path) as img:
        if resolution is not None and img.size != tuple(resolution):
            img = img.resize(resolution)
        arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[2] == 4:
        return arr[:, :, 3] > 0
    return arr.sum(axis=-1) > 0 if arr.ndim == 3 else arr > 0


def get_mask3d(
    state: GaussianState,
    cameras: list,
    prompts: list[str],
    data_dir: str,
    voting_method: Literal["gradient", "binary", "projection"] = "gradient",
    bg=None,
    cfg: RasterConfig | None = None,
    surfel: bool = False,
) -> np.ndarray:
    """Returns [num_prompts, N] boolean per-Gaussian masks (padded N)."""
    rgba_root = os.path.join(data_dir, "masked_image_rgba")
    if not os.path.exists(rgba_root):
        raise RuntimeError(f"`mask_with_image_rgba_dir` {rgba_root} does not exist")
    prompt_dirs = [os.path.join(rgba_root, p) for p in prompts]
    for d in prompt_dirs:
        if not os.path.exists(d):
            raise RuntimeError(f"prompt mask dir {d} does not exist")
    os.makedirs(os.path.join(rgba_root, "masked"), exist_ok=True)

    if cfg is None:
        cfg = default_raster_config(state.capacity)
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)

    votes = np.zeros((len(prompts), state.capacity), np.float32)
    for camera in cameras:
        cam = camera.to_jax()
        for k, d in enumerate(prompt_dirs):
            mask = load_mask_rgba(
                os.path.join(d, f"{camera.image_name}.png"), camera.resolution
            )
            if voting_method == "projection":
                v = _projection_vote_step(
                    state.params, state.alive, cam, jnp.asarray(mask), cfg=cfg
                )
            elif voting_method == "binary":
                # reference: +1 if any masked contribution, -1 if any inverse
                m = jnp.asarray(mask.astype(np.float32))
                v_in = _vote_step(state.params, state.alive, cam, m, bg, cfg=cfg, surfel=surfel)
                v_out = _vote_step(state.params, state.alive, cam, 1.0 - m, bg, cfg=cfg, surfel=surfel)
                v = (v_in > 0).astype(jnp.float32) - (v_out > 0).astype(jnp.float32)
            else:
                signed = jnp.asarray(np.where(mask, 1.0, -1.0).astype(np.float32))
                v = _vote_step(state.params, state.alive, cam, signed, bg, cfg=cfg, surfel=surfel)
            votes[k] += np.asarray(v)

    return votes > 0
