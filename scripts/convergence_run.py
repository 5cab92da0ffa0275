"""30k-iteration 3DGS convergence run on a kitchen-scale synthetic scene.

Builds a COLMAP dataset (GT = 40k clustered gaussians rendered at 800x600
from an orbit of 96 cameras via the tiled renderer), then runs the real
train_3dgs.training() loop for 30k iterations on the TPU and records
PSNR@{7k,30k}, wall-clock and final point count (BASELINE.md "Ours" row).

Usage: python scripts/convergence_run.py [outdir]
"""

import os
import sys
import time

import numpy as np
import yaml
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scorp_tpu.core import colmap
from scorp_tpu.core.camera import fov2focal, make_camera_jax
from scorp_tpu.core.plyio import GaussianData
from scorp_tpu.core.sh import rgb_to_sh
from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.pallas_fwd import rasterize_pallas_fwd_only
from scorp_tpu.ops.raster.xla import rasterize_xla


def make_scene_gaussians(n=40_000, seed=7):
    rng = np.random.default_rng(seed)
    # room-like: a CLOSED box (cameras orbit inside it, like a real indoor
    # capture — with random training backgrounds any void region is an
    # unfittable gradient source that storms the densifier) + clutter
    n_wall = (3 * n) // 5
    walls = []
    slabs = ((0, -2.6), (0, 2.6), (1, -1.6), (1, 1.6), (2, -2.6), (2, 2.6))
    for axis, offset in slabs:
        p = rng.uniform(-2.6, 2.6, size=(n_wall // 6, 3))
        p[:, 1] = np.clip(p[:, 1], -1.6, 1.6)
        p[:, axis] = offset + rng.normal(0, 0.02, len(p))
        walls.append(p)
    walls = np.concatenate(walls)[:n_wall]
    # furniture: a couple dozen solid objects of LARGE gaussians — a real
    # interior is mostly flat surfaces; dense random-colored speckle with
    # 20x overdraw is unfittable (per-pixel GT becomes a deep blend of
    # independent random colors) and storms the densifier, reference or not
    n_obj = 24
    centers = rng.uniform(-1.1, 1.1, size=(n_obj, 3)) * np.array([1, 0.55, 1])
    idx = rng.integers(0, n_obj, size=n - n_wall)
    clutter = centers[idx] + rng.normal(0, 0.16, size=(n - n_wall, 3))
    xyz = np.concatenate([walls, clutter]).astype(np.float32)
    n = len(xyz)
    # spatially-smooth wall colors; per-object base colors with small jitter
    freqs = rng.normal(0, 1.0, size=(3, 3))
    phases = rng.uniform(0, 2 * np.pi, size=3)
    colors = 0.5 + 0.3 * np.sin(xyz @ freqs.T + phases)
    obj_colors = rng.uniform(0.15, 0.85, size=(n_obj, 3))
    colors[n_wall:] = obj_colors[idx]
    colors = np.clip(colors + rng.normal(0, 0.02, size=(n, 3)), 0.05, 0.95)
    colors = colors.astype(np.float32)
    k = 16
    f_rest = rng.normal(0, 0.004, size=(n, k - 1, 3)).astype(np.float32)
    scaling = np.concatenate([
        rng.normal(np.log(0.055), 0.3, size=(n_wall, 3)),
        rng.normal(np.log(0.085), 0.3, size=(n - n_wall, 3)),
    ])
    return GaussianData(
        xyz=xyz,
        f_dc=rgb_to_sh(colors).reshape(n, 1, 3).astype(np.float32),
        f_rest=f_rest,
        opacity=rng.normal(2.6, 0.6, size=(n, 1)).astype(np.float32),
        scaling=scaling.astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
    )


def orbit_pose(angle, radius, height):
    eye = np.array([radius * np.sin(angle), height, -radius * np.cos(angle)])
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)
    T_w2c = -R_c2w.T @ eye
    return R_c2w, T_w2c


def build_dataset(root, n_views=96, width=800, height=600, fov=1.1, seed=7):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "sparse"), exist_ok=True)
    g = make_scene_gaussians(seed=seed)
    bg = jnp.zeros(3)
    cfg = RasterConfig(max_keys=1 << 21, tile_list_len=2048, chunk=64,
                       pallas_chunk=128)
    raster = (rasterize_pallas_fwd_only
              if jax.default_backend() != "cpu" else rasterize_xla)

    gx = jnp.asarray(g.xyz)
    gop = jnp.asarray(1.0 / (1.0 + np.exp(-g.opacity[:, 0])))
    gsh = jnp.asarray(np.concatenate([g.f_dc, g.f_rest], axis=1))
    gsc = jnp.asarray(np.exp(g.scaling))
    gq = jnp.asarray(g.rotation)

    cams, imgs, names = {}, {}, []
    rng = np.random.default_rng(seed + 3)
    for i in range(n_views):
        a = 2 * np.pi * i / n_views
        # inside the closed room (walls at +-2.6, ceiling +-1.6)
        radius = 1.8 + 0.25 * np.sin(3 * a)
        height_i = 0.15 + 0.45 * np.sin(2 * a + 1)
        R_c2w, T_w2c = orbit_pose(a, radius, height_i)
        cam = make_camera_jax(R_c2w, T_w2c, fov, fov * height / width * 1.0,
                              width, height)
        out = raster(gx, gop, cam, bg, shs=gsh, sh_degree=3, scales=gsc,
                     quats=gq, cfg=cfg)
        img = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
        name = f"img_{i:03d}"
        names.append(name)
        Image.fromarray(img.transpose(1, 2, 0)).save(
            os.path.join(root, "images", name + ".png"))
        qvec = colmap.rotmat2qvec(R_c2w.T)
        imgs[i + 1] = colmap.ColmapImage(
            i + 1, qvec, T_w2c, 1, name + ".png", np.zeros((0, 2)),
            np.zeros(0, np.int64))
    focal = fov2focal(fov, width)
    focal_y = fov2focal(fov * height / width, height)
    cams[1] = colmap.ColmapCamera(
        1, "PINHOLE", width, height,
        np.array([focal, focal_y, width / 2, height / 2]))
    colmap.write_intrinsics_binary(cams, os.path.join(root, "sparse", "cameras.bin"))
    colmap.write_extrinsics_binary(imgs, os.path.join(root, "sparse", "images.bin"))
    # sparse init: subsample GT centers with noise (SfM-like)
    sel = rng.choice(len(g.xyz), size=25_000, replace=False)
    pts = g.xyz[sel] + rng.normal(0, 0.03, (len(sel), 3))
    rgb = (rng.uniform(0.2, 0.8, (len(pts), 3)) * 255).astype(np.uint8)
    colmap.write_points3D_binary(pts, rgb, np.zeros((len(pts), 1)),
                                 os.path.join(root, "sparse", "points3D.bin"))
    test_names = names[::12]
    train_names = [n for n in names if n not in test_names]
    with open(os.path.join(root, "split.yml"), "w") as f:
        yaml.safe_dump({"train": train_names, "test": test_names}, f)
    print(f"dataset ready: {n_views} views at {width}x{height}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/conv_run"
    scene_dir = os.path.join(outdir, "scene")
    model_dir = os.path.join(outdir, "model")
    if not os.path.exists(os.path.join(scene_dir, "split.yml")):
        build_dataset(scene_dir)

    from scorp_tpu.apps import train_3dgs as t3

    argv = [
        "-s", scene_dir, "-m", model_dir, "--eval", "--quiet",
        "--split_yml_name", "split.yml",
        "--test_iterations", "7000", "15000", "30000",
        "--save_iterations", "30000",
    ]
    t0 = time.time()
    t3.main(argv)
    print(f"total wall-clock: {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
