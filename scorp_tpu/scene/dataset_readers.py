"""Dataset readers: COLMAP scenes, ToyDesk transforms, NeRF-synthetic.

Behavioral contract from /root/reference/gs3dgs/scene/dataset_readers.py:
  * COLMAP: binary-then-text fallback under `sparse/`; PINHOLE /
    SIMPLE_PINHOLE only; optional `depths_cam/` + `depths_est/` sibling
    folders; YAML train/test split by image name when eval=True;
    points3D.bin converted to points3D.ply on first open (:167-231).
  * nerf++ normalization: radius = 1.1 x max distance of camera centers
    from their mean (:48-69).
  * ToyDesk: `transforms_full.json` camera-to-world matrices (COLMAP axes),
    random 360k-point init inside 2x the camera bbox radius (:341-415).
  * Resolution policy (gs3dgs/utils/camera_utils.py:23-44): -r in {1,2,4,8}
    divides; -1 auto-downscales >1600px-wide images to 1600.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import NamedTuple

import numpy as np
import yaml
from PIL import Image

from ..core import colmap
from ..core.camera import focal2fov, fov2focal, world_to_view
from ..core.plyio import load_point_cloud_ply, save_point_cloud_ply
from .cameras import Camera


class CameraInfo(NamedTuple):
    uid: int
    R: np.ndarray
    T: np.ndarray
    fovy: float
    fovx: float
    depth_cam_path: str | None
    depth_est_path: str | None
    image_path: str
    image_name: str
    width: int
    height: int


class SceneInfo(NamedTuple):
    points: np.ndarray
    colors: np.ndarray
    train_cameras: list[CameraInfo]
    test_cameras: list[CameraInfo]
    nerf_normalization: dict
    ply_path: str


def nerfpp_norm(cam_infos: list[CameraInfo]) -> dict:
    centers = []
    for cam in cam_infos:
        w2c = world_to_view(cam.R, cam.T)
        centers.append(np.linalg.inv(w2c)[:3, 3])
    centers = np.stack(centers, axis=0)
    avg = centers.mean(axis=0)
    diagonal = np.linalg.norm(centers - avg, axis=1).max()
    return {"translate": -avg, "radius": float(diagonal * 1.1)}


def _optional_dir(path: str, name: str) -> str | None:
    p = os.path.join(path, name)
    return p if os.path.exists(p) else None


def _apply_split(cam_infos, path, eval_mode, split_yml_name):
    if not eval_mode:
        return cam_infos, []
    split_file = os.path.join(path, split_yml_name or "")
    if not os.path.exists(split_file):
        raise FileNotFoundError(f"Split file not found at {split_file}")
    with open(split_file) as f:
        split = yaml.safe_load(f)
    train = [c for c in cam_infos if c.image_name in split["train"]]
    test = [c for c in cam_infos if c.image_name in split["test"]]
    return train, test


def read_colmap_scene(path: str, images: str | None, eval_mode: bool,
                      split_yml_name: str | None = None) -> SceneInfo:
    sparse = os.path.join(path, "sparse")
    try:
        extr = colmap.read_extrinsics_binary(os.path.join(sparse, "images.bin"))
        intr = colmap.read_intrinsics_binary(os.path.join(sparse, "cameras.bin"))
    except (FileNotFoundError, OSError):
        extr = colmap.read_extrinsics_text(os.path.join(sparse, "images.txt"))
        intr = colmap.read_intrinsics_text(os.path.join(sparse, "cameras.txt"))

    images_dir = os.path.join(path, images if images else "images")
    depth_cam_dir = _optional_dir(path, "depths_cam")
    depth_est_dir = _optional_dir(path, "depths_est")

    cam_infos = []
    for key in extr:
        e = extr[key]
        k = intr[e.camera_id]
        if k.model == "SIMPLE_PINHOLE":
            fovx = focal2fov(k.params[0], k.width)
            fovy = focal2fov(k.params[0], k.height)
        elif k.model == "PINHOLE":
            fovx = focal2fov(k.params[0], k.width)
            fovy = focal2fov(k.params[1], k.height)
        else:
            raise ValueError(
                "Only undistorted PINHOLE/SIMPLE_PINHOLE COLMAP models are supported"
            )
        R = colmap.qvec2rotmat(e.qvec).T  # store C2W rotation
        image_path = os.path.join(images_dir, os.path.basename(e.name))
        image_name = os.path.basename(image_path).split(".")[0]
        if not os.path.exists(image_path):
            image_path = image_path.rsplit(".", 1)[0] + ".png"
        if not os.path.exists(image_path):
            raise FileNotFoundError(f"Image file not found at {image_path}")
        cam_infos.append(
            CameraInfo(
                uid=k.id, R=R, T=np.asarray(e.tvec), fovy=fovy, fovx=fovx,
                depth_cam_path=os.path.join(depth_cam_dir, image_name) if depth_cam_dir else None,
                depth_est_path=os.path.join(depth_est_dir, image_name) if depth_est_dir else None,
                image_path=image_path, image_name=image_name,
                width=k.width, height=k.height,
            )
        )
    cam_infos.sort(key=lambda c: c.image_name)
    train, test = _apply_split(cam_infos, path, eval_mode, split_yml_name)
    norm = nerfpp_norm(train)

    ply_path = os.path.join(sparse, "points3D.ply")
    if not os.path.exists(ply_path):
        try:
            xyz, rgb, _ = colmap.read_points3D_binary(os.path.join(sparse, "points3D.bin"))
        except (FileNotFoundError, OSError):
            xyz, rgb, _ = colmap.read_points3D_text(os.path.join(sparse, "points3D.txt"))
        save_point_cloud_ply(ply_path, xyz, rgb)
    points, colors, _ = load_point_cloud_ply(ply_path)
    return SceneInfo(points, colors, train, test, norm, ply_path)


def read_transforms_cameras(
    path: str, images_dir: str, transforms_file: str,
    depth_cam_dir=None, depth_est_dir=None, is_opengl=False, extension=".jpg",
) -> list[CameraInfo]:
    with open(os.path.join(path, transforms_file)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    cam_infos = []
    for idx, frame in enumerate(contents["frames"]):
        cam_name = os.path.join(images_dir, frame["file_path"].rsplit("/", 1)[-1])
        if os.path.exists(cam_name + extension):
            cam_name += extension
        else:
            cam_name += ".png"
        if not os.path.exists(cam_name):
            raise FileNotFoundError(f"Image file not found at {cam_name}")
        c2w = np.array(frame["transform_matrix"])
        if is_opengl:
            c2w[:3, 1:3] *= -1  # OpenGL/Blender -> COLMAP axes
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]
        image_name = Path(cam_name).stem
        with Image.open(cam_name) as img:
            w, h = img.size
        fovy = focal2fov(fov2focal(fovx, w), h)
        cam_infos.append(
            CameraInfo(
                uid=idx, R=R, T=T, fovy=fovy, fovx=fovx,
                depth_cam_path=os.path.join(depth_cam_dir, image_name) if depth_cam_dir else None,
                depth_est_path=os.path.join(depth_est_dir, image_name) if depth_est_dir else None,
                image_path=cam_name, image_name=image_name, width=w, height=h,
            )
        )
    return cam_infos


def read_toydesk_scene(path: str, images: str | None, eval_mode: bool,
                       extension=".jpg", split_yml_name=None) -> SceneInfo:
    images_dir = os.path.join(path, images if images else "images")
    cam_infos = read_transforms_cameras(
        path, images_dir, "transforms_full.json",
        depth_cam_dir=_optional_dir(path, "depths"),
        depth_est_dir=_optional_dir(path, "depths_est"),
        extension=extension,
    )
    norm = nerfpp_norm(cam_infos)

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        # random init inside 2x the camera-translation bbox radius
        t = np.stack([c.T for c in cam_infos])
        radius = np.linalg.norm(t.max(0) - t.min(0)) / 2.0
        center = (t.max(0) + t.min(0)) / 2.0
        num_pts = 360_000
        rng = np.random.default_rng(0)
        xyz = (rng.random((num_pts, 3)) - 0.5) * 4 * radius + center
        colors = rng.random((num_pts, 3)) * (0.28209479177387814 / 255.0) + 0.5
        save_point_cloud_ply(ply_path, xyz, colors)
    points, colors, _ = load_point_cloud_ply(ply_path)
    train, test = _apply_split(cam_infos, path, eval_mode, split_yml_name)
    return SceneInfo(points, colors, train, test, norm, ply_path)


def resolve_resolution(orig_w: int, orig_h: int, requested, resolution_scale: float = 1.0):
    """The -r flag policy (camera_utils.py:23-44)."""
    if requested in (1, 2, 4, 8):
        return (
            round(orig_w / (resolution_scale * requested)),
            round(orig_h / (resolution_scale * requested)),
        )
    if requested == -1:
        global_down = orig_w / 1600 if orig_w > 1600 else 1
    else:
        global_down = orig_w / requested
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def load_camera(args, cam_id: int, info: CameraInfo, resolution_scale: float) -> Camera:
    with Image.open(info.image_path) as img:
        orig_w, orig_h = img.size
    resolution = resolve_resolution(orig_w, orig_h, args.resolution, resolution_scale)
    return Camera(
        colmap_id=info.uid, R=info.R, T=info.T, fovx=info.fovx, fovy=info.fovy,
        resolution=resolution, image_path=info.image_path,
        depth_cam_path=info.depth_cam_path, depth_est_path=info.depth_est_path,
        image_name=info.image_name, uid=cam_id,
    )


def camera_to_json(cam_id: int, cam: CameraInfo) -> dict:
    rt = np.zeros((4, 4))
    rt[:3, :3] = cam.R.T
    rt[:3, 3] = cam.T
    rt[3, 3] = 1.0
    c2w = np.linalg.inv(rt)
    return {
        "id": cam_id,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": c2w[:3, 3].tolist(),
        "rotation": [r.tolist() for r in c2w[:3, :3]],
        "fy": fov2focal(cam.fovy, cam.height),
        "fx": fov2focal(cam.fovx, cam.width),
    }
