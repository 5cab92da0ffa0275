"""Camera matrix conventions.

Reproduces the reference's exact conventions
(/root/reference/gs3dgs/utils/graphics_utils.py:38-77 and
/root/reference/gs3dgs/scene/cameras.py:82-97):

* `R` is the camera-to-world rotation (i.e. W2C.T), `T` the world-to-camera
  translation.
* `world_view_transform` is the 4x4 world-to-camera matrix **transposed**
  (row-vector convention: `p_view_hom = p_world_hom @ world_view_transform`).
* `projection_matrix` is an OpenGL-style perspective matrix with z_sign=+1
  and z mapped via zfar/(zfar-znear), also stored transposed.
* `full_proj_transform = world_view_transform @ projection_matrix`.
* `camera_center = inv(world_view_transform)[3, :3]`.

The device-side `CameraJax` pytree carries only what the rasterizer needs,
all as static-shaped f32 arrays, so a camera can be donated straight into a
jitted render/train step.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import numpy as np
import jax.numpy as jnp


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.array([0.0, 0.0, 0.0]), scale: float = 1.0) -> np.ndarray:
    """4x4 W2C matrix; optional recentering of the camera center."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if scale != 1.0 or np.any(translate != 0.0):
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection, z_sign=+1, depth in [0, zfar/(zfar-znear)]."""
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class CameraJax:
    """Device-side camera pytree.

    `viewmatrix` / `projmatrix` are stored transposed (row-vector style) so
    that `p_hom @ viewmatrix` maps world -> view, matching the reference's
    rasterizer-settings contract. `width`/`height` are static aux data (they
    determine array shapes under jit); matrices and fov tangents are traced
    leaves, so the same compiled step serves every camera of one resolution.
    """

    viewmatrix: jnp.ndarray  # [4, 4]  W2C^T
    projmatrix: jnp.ndarray  # [4, 4]  (P @ W2C)^T = W2C^T @ P^T
    campos: jnp.ndarray      # [3]
    tanfovx: jnp.ndarray     # scalar
    tanfovy: jnp.ndarray     # scalar
    width: int               # static
    height: int              # static

    def tree_flatten(self):
        children = (self.viewmatrix, self.projmatrix, self.campos, self.tanfovx, self.tanfovy)
        return children, (self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, width=aux[0], height=aux[1])


def make_camera_jax(
    R: np.ndarray,
    T: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    trans=np.array([0.0, 0.0, 0.0]),
    scale: float = 1.0,
) -> CameraJax:
    w2c = world_to_view(R, T, trans, scale)
    view_t = w2c.T.astype(np.float32)
    proj = projection_matrix(znear, zfar, fovx, fovy)
    full_proj_t = (view_t @ proj.T).astype(np.float32)
    cam_center = np.linalg.inv(view_t)[3, :3].astype(np.float32)
    return CameraJax(
        viewmatrix=jnp.asarray(view_t),
        projmatrix=jnp.asarray(full_proj_t),
        campos=jnp.asarray(cam_center),
        tanfovx=jnp.float32(math.tan(fovx * 0.5)),
        tanfovy=jnp.float32(math.tan(fovy * 0.5)),
        width=int(width),
        height=int(height),
    )


def look_at_camera(
    eye, target, up, fovx: float, fovy: float, width: int, height: int
) -> CameraJax:
    """Convenience constructor for tests/synthetic scenes."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # Camera-to-world rotation with columns (right, down, forward): the GS
    # convention is +z forward, +y down in camera space.
    R = np.stack([right, down, fwd], axis=1)
    # T is the world-to-camera translation: t = -R^T @ eye.
    T = -R.T @ eye
    return make_camera_jax(R, T, fovx, fovy, width, height)
