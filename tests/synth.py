"""Synthetic COLMAP dataset builder for end-to-end tests: renders a known
Gaussian set with the naive golden renderer into PNG views and writes a
COLMAP sparse model + split YAML in the on-disk layout the pipeline reads."""

import os

import numpy as np
import yaml
from PIL import Image

import jax.numpy as jnp

from scorp_tpu.core import colmap
from scorp_tpu.core.camera import fov2focal, make_camera_jax
from scorp_tpu.core.plyio import GaussianData
from scorp_tpu.core.sh import rgb_to_sh
from scorp_tpu.ops.raster.xla import rasterize_naive


def make_gt_gaussians(n=64, seed=42, sh_degree=3):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0.15, 0.85, size=(n, 3)).astype(np.float32)
    k = (sh_degree + 1) ** 2
    return GaussianData(
        xyz=xyz,
        f_dc=rgb_to_sh(colors).reshape(n, 1, 3).astype(np.float32),
        f_rest=np.zeros((n, k - 1, 3), np.float32),
        opacity=np.full((n, 1), 2.5, np.float32),
        scaling=np.full((n, 3), np.log(0.18), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
    )


def orbit_pose(angle, radius=4.0, height=0.6):
    """C2W rotation (columns right/down/forward) + W2C translation for a
    camera orbiting the origin."""
    eye = np.array([radius * np.sin(angle), height, -radius * np.cos(angle)])
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)
    T_w2c = -R_c2w.T @ eye
    return R_c2w, T_w2c


def build_dataset(root, n_views=8, width=64, height=64, fov=0.9, n_gauss=64, seed=42):
    """Returns (gaussians, list[(R_c2w, T_w2c)])."""
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "sparse"), exist_ok=True)
    g = make_gt_gaussians(n=n_gauss, seed=seed)
    bg = jnp.zeros(3)

    cams, imgs = {}, {}
    names = []
    poses = []
    for i in range(n_views):
        R_c2w, T_w2c = orbit_pose(2 * np.pi * i / n_views)
        poses.append((R_c2w, T_w2c))
        cam = make_camera_jax(R_c2w, T_w2c, fov, fov, width, height)
        out = rasterize_naive(
            jnp.asarray(g.xyz),
            jnp.asarray(1.0 / (1.0 + np.exp(-g.opacity[:, 0]))),
            cam, bg,
            shs=jnp.asarray(np.concatenate([g.f_dc, g.f_rest], axis=1)),
            sh_degree=3,
            scales=jnp.asarray(np.exp(g.scaling)),
            quats=jnp.asarray(g.rotation),
        )
        img = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
        name = f"img_{i:03d}"
        names.append(name)
        Image.fromarray(img.transpose(1, 2, 0)).save(
            os.path.join(root, "images", name + ".png")
        )
        qvec = colmap.rotmat2qvec(R_c2w.T)
        imgs[i + 1] = colmap.ColmapImage(
            i + 1, qvec, T_w2c, 1, name + ".png", np.zeros((0, 2)), np.zeros(0, np.int64)
        )
    focal = fov2focal(fov, width)
    focal_y = fov2focal(fov, height)
    cams[1] = colmap.ColmapCamera(1, "PINHOLE", width, height,
                                  np.array([focal, focal_y, width / 2, height / 2]))
    colmap.write_intrinsics_binary(cams, os.path.join(root, "sparse", "cameras.bin"))
    colmap.write_extrinsics_binary(imgs, os.path.join(root, "sparse", "images.bin"))
    # noisy point cloud near the true centers
    rng = np.random.default_rng(seed + 1)
    pts = g.xyz + rng.normal(0, 0.05, g.xyz.shape)
    rgb = (rng.uniform(0.2, 0.8, (len(pts), 3)) * 255).astype(np.uint8)
    colmap.write_points3D_binary(pts, rgb, np.zeros((len(pts), 1)),
                                 os.path.join(root, "sparse", "points3D.bin"))
    with open(os.path.join(root, "split.yml"), "w") as f:
        yaml.safe_dump({"train": names[:-2], "test": names[-2:]}, f)
    return g, poses
