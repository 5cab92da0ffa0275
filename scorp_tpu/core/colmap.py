"""COLMAP sparse-reconstruction parsers (binary + text).

Standalone implementation of the standard COLMAP on-disk format, covering
what the pipeline consumes (mirrors the surface of
/root/reference/gs3dgs/scene/colmap_loader.py:16-294): extrinsics
(`images.bin/.txt`), intrinsics (`cameras.bin/.txt`) and sparse points
(`points3D.bin/.txt`), plus qvec<->rotmat helpers.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# COLMAP camera model table: model_id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray  # [4] (w,x,y,z), world-to-camera rotation
    tvec: np.ndarray  # [3] world-to-camera translation
    camera_id: int
    name: str
    xys: np.ndarray
    point3D_ids: np.ndarray


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
    ])


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
    ]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def _read(f, n_bytes: int, fmt: str):
    return struct.unpack("<" + fmt, f.read(n_bytes))


def read_extrinsics_binary(path: str) -> dict[int, ColmapImage]:
    images = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            vals = _read(f, 64, "idddddddi")
            image_id = vals[0]
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            camera_id = vals[8]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(f, 8, "Q")
            blob = _read(f, 24 * n_pts, "ddq" * n_pts)
            xys = np.column_stack([blob[0::3], blob[1::3]]) if n_pts else np.zeros((0, 2))
            ids = np.array(blob[2::3], dtype=np.int64) if n_pts else np.zeros(0, np.int64)
            images[image_id] = ColmapImage(
                image_id, qvec, tvec, camera_id, name.decode("utf-8"), xys, ids
            )
    return images


def read_intrinsics_binary(path: str) -> dict[int, ColmapCamera]:
    cameras = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            cam_id, model_id, width, height = _read(f, 24, "iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, 8 * n_params, "d" * n_params))
            cameras[cam_id] = ColmapCamera(cam_id, name, int(width), int(height), params)
    return cameras


def read_points3D_binary(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (xyz [N,3] f64, rgb [N,3] u8, errors [N,1] f64)."""
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        xyz = np.empty((num, 3))
        rgb = np.empty((num, 3), np.uint8)
        err = np.empty((num, 1))
        for i in range(num):
            vals = _read(f, 43, "QdddBBBd")
            xyz[i] = vals[1:4]
            rgb[i] = vals[4:7]
            err[i] = vals[7]
            (track_len,) = _read(f, 8, "Q")
            f.seek(8 * track_len, 1)
    return xyz, rgb, err


def read_extrinsics_text(path: str) -> dict[int, ColmapImage]:
    images = {}
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
    for i in range(0, len(lines), 2):
        elems = lines[i].split()
        image_id = int(elems[0])
        qvec = np.array(list(map(float, elems[1:5])))
        tvec = np.array(list(map(float, elems[5:8])))
        camera_id = int(elems[8])
        name = elems[9]
        pts = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.array(list(map(float, pts))).reshape(-1, 3)[:, :2] if pts else np.zeros((0, 2))
        ids = (
            np.array(list(map(float, pts))).reshape(-1, 3)[:, 2].astype(np.int64)
            if pts else np.zeros(0, np.int64)
        )
        images[image_id] = ColmapImage(image_id, qvec, tvec, camera_id, name, xys, ids)
    return images


def read_intrinsics_text(path: str) -> dict[int, ColmapCamera]:
    cameras = {}
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            elems = ln.split()
            cam_id = int(elems[0])
            model = elems[1]
            width, height = int(elems[2]), int(elems[3])
            params = np.array(list(map(float, elems[4:])))
            cameras[cam_id] = ColmapCamera(cam_id, model, width, height, params)
    return cameras


def read_points3D_text(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    xyz_l, rgb_l, err_l = [], [], []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            elems = ln.split()
            xyz_l.append([float(x) for x in elems[1:4]])
            rgb_l.append([int(x) for x in elems[4:7]])
            err_l.append([float(elems[7])])
    return (
        np.array(xyz_l),
        np.array(rgb_l, np.uint8),
        np.array(err_l),
    )


def write_extrinsics_binary(images: dict[int, ColmapImage], path: str) -> None:
    """Inverse of read_extrinsics_binary (used by tests/tools)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for img in images.values():
            f.write(struct.pack("<idddddddi", img.id, *img.qvec, *img.tvec, img.camera_id))
            f.write(img.name.encode("utf-8") + b"\x00")
            n = len(img.point3D_ids)
            f.write(struct.pack("<Q", n))
            for j in range(n):
                f.write(struct.pack("<ddq", img.xys[j, 0], img.xys[j, 1], img.point3D_ids[j]))


def write_intrinsics_binary(cameras: dict[int, ColmapCamera], path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            model_id = CAMERA_MODEL_IDS[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, model_id, cam.width, cam.height))
            f.write(struct.pack("<" + "d" * len(cam.params), *cam.params))


def write_points3D_binary(xyz: np.ndarray, rgb: np.ndarray, err: np.ndarray, path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(
                struct.pack(
                    "<QdddBBBd", i + 1, *xyz[i], *rgb[i].tolist(), float(np.ravel(err[i])[0])
                )
            )
            f.write(struct.pack("<Q", 0))
