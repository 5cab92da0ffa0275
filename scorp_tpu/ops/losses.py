"""Image losses and metrics (jitted, differentiable).

Matches the reference numerics exactly:
  * l1/l2 over all elements (/root/reference/gs3dgs/utils/loss_utils.py:17-22)
  * SSIM with an 11x11 sigma=1.5 Gaussian window, zero padding, C1=0.01^2,
    C2=0.03^2 (loss_utils.py:43-73) — implemented as two separable 1D
    convolutions (the 2D window is an outer product, so this is exact).
  * PSNR/MSE per-image (/root/reference/gs3dgs/utils/image_utils.py:15-20)
  * isotropic scaling regularizer (loss_utils.py:75-85)
  * min-max depth normalization (image_utils.py:87-91)
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((pred - gt) ** 2).mean()


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image MSE over [C, H, W] leading-batched inputs -> [C, 1]."""
    return ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(axis=1, keepdims=True)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))


@lru_cache(maxsize=8)
def _gaussian_window_1d(window_size: int, sigma: float) -> tuple[float, ...]:
    vals = [
        math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
        for x in range(window_size)
    ]
    s = sum(vals)
    return tuple(v / s for v in vals)


def _sep_conv2d(img: jnp.ndarray, win: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Depthwise 2D conv with an outer-product window via two 1D convs.

    img: [C, H, W]; zero ('SAME') padding like torch F.conv2d(padding=ws//2).
    """
    c = img.shape[0]
    x = img[None]  # [1, C, H, W]
    ky = win.reshape(1, 1, window_size, 1)
    kx = win.reshape(1, 1, 1, window_size)
    dn = jax.lax.conv_dimension_numbers(x.shape, ky.shape, ("NCHW", "OIHW", "NCHW"))
    pad = window_size // 2
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(ky, (c, 1, 1, 1)), (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kx, (c, 1, 1, 1)), (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=dn, feature_group_count=c,
    )
    return x[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over [C, H, W] images (reference window + padding behavior)."""
    win = jnp.asarray(_gaussian_window_1d(window_size, 1.5), dtype=img1.dtype)

    mu1 = _sep_conv2d(img1, win, window_size)
    mu2 = _sep_conv2d(img2, win, window_size)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _sep_conv2d(img1 * img1, win, window_size) - mu1_sq
    sigma2_sq = _sep_conv2d(img2 * img2, win, window_size) - mu2_sq
    sigma12 = _sep_conv2d(img1 * img2, win, window_size) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def isotropic_loss(scaling: jnp.ndarray) -> jnp.ndarray:
    """Mean |s - mean(s)| over the (activated) scaling tensor [N, 3]."""
    mean_scaling = scaling.mean(axis=1, keepdims=True)
    return jnp.abs(scaling - mean_scaling).mean()


def depth_normalize(depth: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize; min/max are stop-gradiented like the reference."""
    min_val = jax.lax.stop_gradient(depth.min())
    max_val = jax.lax.stop_gradient(depth.max())
    return (depth - min_val) / (max_val - min_val)
