"""Headline benchmark: 3DGS rasterizer render FPS on a kitchen-scale scene.

Scene: 250k Gaussians, 1600x1066 render (the reference's -r -1 auto-1600
resolution policy on a mipnerf360-style capture). The reference publishes no
numbers (BASELINE.md), so vs_baseline is reported against the commonly-cited
~100 FPS of the CUDA diff-gaussian-rasterization at this scale on a desktop
GPU; the driver-measured reference number supersedes it when available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def build_scene(n=250_000, seed=0, width=1600, height=1066):
    import jax.numpy as jnp

    from scorp_tpu.core.camera import look_at_camera
    from scorp_tpu.core.sh import rgb_to_sh

    rng = np.random.default_rng(seed)
    # cluster points like a room-scale capture: mixture of a box + clusters
    base = rng.uniform(-2, 2, size=(n, 3))
    cluster_idx = rng.integers(0, 32, size=n)
    centers = rng.uniform(-2, 2, size=(32, 3))
    xyz = (0.35 * base + centers[cluster_idx]).astype(np.float32)

    k = 16
    shs = np.zeros((n, k, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.05, 0.95, size=(n, 3))).astype(np.float32)
    shs[:, 1:] = rng.normal(0, 0.03, size=(n, k - 1, 3)).astype(np.float32)
    scales = np.exp(rng.normal(np.log(0.02), 0.5, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = (1.0 / (1.0 + np.exp(-rng.normal(0.0, 2.0, size=n)))).astype(np.float32)

    cam = look_at_camera(
        eye=[0, 0.5, -6.5], target=[0, 0, 0], up=[0, 1, 0],
        fovx=1.2, fovy=0.9, width=width, height=height,
    )
    return (
        jnp.asarray(xyz), jnp.asarray(shs), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(opacity), cam,
    )


def main():
    import jax
    import jax.numpy as jnp

    from scorp_tpu.ops.raster import RasterConfig
    from scorp_tpu.ops.raster import rasterize

    xyz, shs, scales, quats, opacity, cam = build_scene()
    cfg = RasterConfig(max_keys=1 << 21, tile_list_len=4096, chunk=64, pallas_chunk=256)
    bg = jnp.zeros(3, jnp.float32)

    @jax.jit
    def render_frame(xyz, shs, scales, quats, opacity):
        out = rasterize(
            xyz, opacity, cam, bg, shs=shs, sh_degree=3,
            scales=scales, quats=quats, cfg=cfg,
        )
        return out.color, out.num_dropped_keys, out.num_dropped_tail

    color, dk, dt = render_frame(xyz, shs, scales, quats, opacity)
    color.block_until_ready()
    assert int(dk) == 0 and int(dt) == 0, (int(dk), int(dt))

    n_frames = 30
    t0 = time.perf_counter()
    for _ in range(n_frames):
        color, _, _ = render_frame(xyz, shs, scales, quats, opacity)
    color.block_until_ready()
    dt_s = time.perf_counter() - t0
    fps = n_frames / dt_s

    baseline_fps = 100.0  # placeholder: typical CUDA reference FPS at this scale
    print(json.dumps({
        "metric": "render_fps_250k_1600x1066",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
