"""Novel camera-path generation + video export (2DGS tooling).

Equivalent of /root/reference/gs2dgs/utils/render_utils.py: PCA-normalize
the training poses, generate a smooth ellipse (orbit) or spiral path of
viewer cameras, export rendered frames to a video (cv2.VideoWriter stands
in for the reference's ffmpeg invocation) and save u8/f32 images.
"""

from __future__ import annotations

import os

import numpy as np

from ..scene.cameras import MiniCam
from ..core.camera import world_to_view, projection_matrix


def _pose_pca(centers: np.ndarray):
    mean = centers.mean(axis=0)
    _, _, vt = np.linalg.svd(centers - mean)
    return mean, vt  # rows: principal axes


def generate_ellipse_path(cameras, n_frames: int = 120, z_offset: float = 0.0):
    """Orbit path through the PCA plane of the training camera centers."""
    centers = np.stack([c.camera_center for c in cameras])
    mean, axes = _pose_pca(centers)
    u, v, w = axes
    proj = (centers - mean) @ np.stack([u, v]).T
    a = np.abs(proj[:, 0]).max()
    b = np.abs(proj[:, 1]).max()
    look_at = mean + w * z_offset

    ref = cameras[0]
    out = []
    for t in np.linspace(0, 2 * np.pi, n_frames, endpoint=False):
        eye = mean + a * np.cos(t) * u + b * np.sin(t) * v
        fwd = look_at - eye
        fwd = fwd / np.linalg.norm(fwd)
        upv = -w
        right = np.cross(fwd, upv)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=1)
        T = -R.T @ eye
        w2c = world_to_view(R, T)
        proj_m = projection_matrix(0.01, 100.0, ref.fovx, ref.fovy)
        out.append(MiniCam(
            ref.resolution[0], ref.resolution[1], ref.fovy, ref.fovx, 0.01, 100.0,
            w2c.T.astype(np.float32), (w2c.T @ proj_m.T).astype(np.float32),
        ))
    return out


def generate_spiral_path(cameras, n_frames: int = 120, n_rounds: int = 2,
                         height_amp: float = 0.3):
    centers = np.stack([c.camera_center for c in cameras])
    mean, axes = _pose_pca(centers)
    u, v, w = axes
    proj = (centers - mean) @ np.stack([u, v]).T
    a = np.abs(proj[:, 0]).max()
    b = np.abs(proj[:, 1]).max()
    ref = cameras[0]
    out = []
    for i, t in enumerate(np.linspace(0, 2 * np.pi * n_rounds, n_frames)):
        hz = height_amp * np.sin(2 * np.pi * i / n_frames)
        eye = mean + a * np.cos(t) * u + b * np.sin(t) * v + hz * w
        fwd = mean - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, -w)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=1)
        T = -R.T @ eye
        w2c = world_to_view(R, T)
        proj_m = projection_matrix(0.01, 100.0, ref.fovx, ref.fovy)
        out.append(MiniCam(
            ref.resolution[0], ref.resolution[1], ref.fovy, ref.fovx, 0.01, 100.0,
            w2c.T.astype(np.float32), (w2c.T @ proj_m.T).astype(np.float32),
        ))
    return out


# reference naming
generate_path = generate_ellipse_path


def save_img_u8(img: np.ndarray, path: str):
    """[3,H,W] or [H,W,3] float image -> u8 PNG."""
    import cv2

    if img.ndim == 3 and img.shape[0] in (1, 3):
        img = img.transpose(1, 2, 0)
    arr = (np.clip(np.nan_to_num(img), 0, 1) * 255).astype(np.uint8)
    if arr.shape[-1] == 3:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, arr)


def save_img_f32(img: np.ndarray, path: str):
    if img.ndim == 3 and img.shape[0] in (1, 3):
        img = img.transpose(1, 2, 0)
    np.save(path if path.endswith(".npy") else path + ".npy", img.astype(np.float32))


def create_videos(frame_dir: str, out_path: str, fps: int = 30):
    """Encode {frame_dir}/*.png into a video (cv2 VideoWriter)."""
    import cv2

    frames = sorted(f for f in os.listdir(frame_dir) if f.endswith(".png"))
    if not frames:
        raise ValueError(f"No frames found in {frame_dir}")
    first = cv2.imread(os.path.join(frame_dir, frames[0]))
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for name in frames:
        writer.write(cv2.imread(os.path.join(frame_dir, name)))
    writer.release()
    return out_path
