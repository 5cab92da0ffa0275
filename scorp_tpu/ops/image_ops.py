"""Image-processing ops (jnp): interpolation, gradients, blur, colormaps.

Equivalents of the remaining /root/reference/gs3dgs/utils/image_utils.py
(+gs2dgs deltas) surface: bilinear grid interpolation (:29-55), Sobel
gradients (:57-74), 3x3 Gaussian blur (:80-85), min-max depth normalization,
gradient-magnitude maps, turbo colormap, and the viewer's render_net_image
channel selector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_grid(x_low, x_high, x_num, y_low, y_high, y_num):
    xs = jnp.linspace(x_low, x_high, x_num)
    ys = jnp.linspace(y_low, y_high, y_num)
    xv, yv = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([xv.flatten(), yv.flatten()]).T


def interpolate(data: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [..., H, W] at [N, 2] coords in [0, 1]."""
    h, w = data.shape[-2], data.shape[-1]
    pos = xy * jnp.array([w, h], jnp.float32)
    idx = pos.astype(jnp.int32)
    lerp = pos - idx.astype(jnp.float32)
    x0 = jnp.clip(idx[:, 0], 0, w - 1)
    y0 = jnp.clip(idx[:, 1], 0, h - 1)
    x1 = jnp.clip(x0 + 1, None, w - 1)
    y1 = jnp.clip(y0 + 1, None, h - 1)
    lx, ly = lerp[:, 0], lerp[:, 1]
    return (
        data[..., y0, x0] * (1 - lx) * (1 - ly)
        + data[..., y0, x1] * lx * (1 - ly)
        + data[..., y1, x0] * (1 - lx) * ly
        + data[..., y1, x1] * lx * ly
    )


def rgb_to_gray(image: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] -> [B, 1, H, W]."""
    return (0.299 * image[:, 0] + 0.587 * image[:, 1] + 0.114 * image[:, 2])[:, None]


def _conv2d_same(image: jnp.ndarray, kernel: jnp.ndarray, replicate: bool = False):
    """Depthwise conv with SAME semantics; [B, C, H, W] x [kh, kw]."""
    b, c, h, w = image.shape
    kh, kw = kernel.shape
    if replicate:
        image = jnp.pad(image, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
                        mode="edge")
        pad = [(0, 0), (0, 0)]
    else:
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    k = jnp.tile(kernel[None, None], (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(image.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
    return jax.lax.conv_general_dilated(
        image, k, (1, 1), pad, dimension_numbers=dn, feature_group_count=c
    )


SOBEL_X = jnp.array([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]])
SOBEL_Y = jnp.array([[-1.0, -2, -1], [0, 0, 0], [1, 2, 1]])


def compute_gradient(image: jnp.ndarray, rgb2gray: bool = False):
    """Sobel gradients of [B, 1or3, H, W] (replicate padding, /3 scaling)."""
    assert image.ndim == 4
    if image.shape[1] == 3:
        assert rgb2gray, "RGB image must be converted to grayscale first"
        image = rgb_to_gray(image)
    gx = _conv2d_same(image, SOBEL_X, replicate=True) / 3.0
    gy = _conv2d_same(image, SOBEL_Y, replicate=True) / 3.0
    return gx, gy


def blur(image: jnp.ndarray) -> jnp.ndarray:
    """3x3 Gaussian blur; accepts [H, W] or [B, C, H, W]."""
    if image.ndim == 2:
        image = image[None, None]
    kernel = jnp.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 16.0
    return _conv2d_same(image, kernel)


def gradient_map(image: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient-magnitude map of [C, H, W] -> [1, H, W]."""
    gx = _conv2d_same(image[:, None], SOBEL_X / 4.0)
    gy = _conv2d_same(image[:, None], SOBEL_Y / 4.0)
    mag = jnp.sqrt(gx**2 + gy**2)[:, 0]
    return jnp.linalg.norm(mag, axis=0, keepdims=True)


def depth_normalize(depth: jnp.ndarray) -> jnp.ndarray:
    mn = jax.lax.stop_gradient(depth.min())
    mx = jax.lax.stop_gradient(depth.max())
    return (depth - mn) / (mx - mn)


# 16-stop turbo colormap approximation (interpolated to 256 below)
_TURBO_STOPS = jnp.array([
    [0.190, 0.072, 0.232], [0.276, 0.333, 0.855], [0.271, 0.565, 0.996],
    [0.151, 0.776, 0.877], [0.100, 0.905, 0.635], [0.267, 0.970, 0.393],
    [0.535, 0.996, 0.220], [0.766, 0.935, 0.189], [0.925, 0.807, 0.228],
    [0.993, 0.637, 0.199], [0.977, 0.438, 0.110], [0.881, 0.259, 0.042],
    [0.729, 0.123, 0.012], [0.550, 0.040, 0.003], [0.378, 0.010, 0.002],
    [0.480, 0.016, 0.011],
])


def colormap(map_: jnp.ndarray) -> jnp.ndarray:
    """[1, H, W] or [H, W] scalar map -> [3, H, W] turbo-colored image."""
    m = jnp.squeeze(map_)
    m = (m - m.min()) / jnp.maximum(m.max() - m.min(), 1e-12)
    t = m * (len(_TURBO_STOPS) - 1)
    i0 = jnp.clip(t.astype(jnp.int32), 0, len(_TURBO_STOPS) - 2)
    frac = t - i0
    c = _TURBO_STOPS[i0] * (1 - frac[..., None]) + _TURBO_STOPS[i0 + 1] * frac[..., None]
    return c.transpose(2, 0, 1)


def render_net_image(render_pkg: dict, render_items: list[str], render_mode: int, camera):
    """Viewer channel selector (gs2dgs/utils/image_utils.py:41-61)."""
    output = render_items[render_mode].lower()
    if output == "alpha":
        net_image = render_pkg["render_alpha"]
    elif output == "normal":
        net_image = (render_pkg["render_normal"] + 1) / 2
    elif output == "depth":
        net_image = render_pkg["render_depth"]
    elif output == "edge":
        net_image = gradient_map(render_pkg["render"])
    elif output == "curvature":
        net_image = gradient_map((render_pkg["render_normal"] + 1) / 2)
    else:
        net_image = render_pkg["render"]
    if net_image.shape[0] == 1:
        net_image = colormap(net_image)
    return net_image
