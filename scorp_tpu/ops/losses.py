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
    """Depthwise 2D conv with an outer-product window via two separable
    shift-and-add passes.

    img: [C, H, W]; zero ('SAME') padding like torch F.conv2d(padding=ws//2).

    Full f32 is mandatory, not a nicety: bf16 moments (TPU's conv default)
    make E[x^2]-mu^2 NEGATIVE on flat image regions (true local variance
    ~1e-6), flipping the sign of SSIM's sigma1+sigma2+C2 denominator — the
    loss then explodes to +-100s on smooth scenes. This used to be
    lax.conv_general_dilated at HIGHEST, but XLA lays the depthwise conv
    out channel-minor ([H, 8, W/8, C] with C=3 in the lane dim), wasting
    125/128 VPU lanes — ~12 ms/train-step at 1600x1066 fwd+bwd. Static
    tap-shifted slices of a padded image are the same exact f32 math as
    fused elementwise fmas at full lane utilization (~1 ms fwd+bwd).
    """
    pad = window_size // 2
    c, h, w = img.shape
    x = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)))
    x = sum(win[i] * x[:, i : i + h, :] for i in range(window_size))
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    return sum(win[i] * x[:, :, i : i + w] for i in range(window_size))


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


def smooth_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware second-order disparity smoothness
    (/root/reference/gs3dgs/utils/loss_utils.py:28-36)."""
    gdx = jnp.abs(disp[:, 1:-1, :-2] + disp[:, 1:-1, 2:] - 2 * disp[:, 1:-1, 1:-1])
    gdy = jnp.abs(disp[:, :-2, 1:-1] + disp[:, 2:, 1:-1] - 2 * disp[:, 1:-1, 1:-1])
    gix = jnp.mean(jnp.abs(img[:, 1:-1, :-2] - img[:, 1:-1, 2:]), 0, keepdims=True) * 0.5
    giy = jnp.mean(jnp.abs(img[:, :-2, 1:-1] - img[:, 2:, 1:-1]), 0, keepdims=True) * 0.5
    return (gdx * jnp.exp(-gix)).mean() + (gdy * jnp.exp(-giy)).mean()


def pearson_depth_loss(depth_src: jnp.ndarray, depth_target: jnp.ndarray) -> jnp.ndarray:
    """1 - Pearson correlation over [B, h, w] depth batches
    (/root/reference/gs2dgs/utils/loss_utils.py:91-115)."""
    src = depth_src - depth_src.mean(axis=(1, 2), keepdims=True)
    tgt = depth_target - depth_target.mean(axis=(1, 2), keepdims=True)
    src = src / (src.std(axis=(1, 2), keepdims=True) + 1e-6)
    tgt = tgt / (tgt.std(axis=(1, 2), keepdims=True) + 1e-6)
    return 1.0 - (src * tgt).mean(axis=(1, 2)).mean()


def random_patch_loss(
    depth_src: jnp.ndarray,
    depth_tgt: jnp.ndarray,
    box_p: int,
    p_corr: float,
    key,
    loss_func: str = "l1",
) -> jnp.ndarray:
    """Patchwise normalized depth loss
    (/root/reference/gs2dgs/utils/loss_utils.py:117-154): sample
    p_corr·(H/box)(W/box) random box_p-sized patches, compare min-max
    normalized depths."""
    src = jnp.squeeze(depth_src)
    tgt = jnp.squeeze(depth_tgt)
    h, w = src.shape
    n_corr = int(p_corr * (h // box_p) * (w // box_p))
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (n_corr,), 0, h - box_p)
    y0 = jax.random.randint(ky, (n_corr,), 0, w - box_p)

    def take(img, x, y):
        return jax.lax.dynamic_slice(img, (x, y), (box_p, box_p))

    ps = jax.vmap(lambda x, y: take(src, x, y))(x0, y0)
    pt = jax.vmap(lambda x, y: take(tgt, x, y))(x0, y0)
    if loss_func == "l1":
        return l1_loss(depth_normalize(ps), depth_normalize(pt))
    if loss_func == "l2":
        return l2_loss(depth_normalize(ps), depth_normalize(pt))
    if loss_func == "pearson":
        return pearson_depth_loss(ps, pt)
    raise ValueError(f"Unknown loss function: {loss_func}")
