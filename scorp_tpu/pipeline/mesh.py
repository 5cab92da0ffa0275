"""Mesh extraction from a trained 2DGS model (optional tooling).

Equivalent of the reference's `GaussianExtractor`
(/root/reference/gs2dgs/utils/mesh_utils.py — vendored 2DGS upstream with no
in-tree caller, per SURVEY.md §2.1): render all training views, TSDF-fuse
the depth maps into a voxel grid, extract a triangle mesh.

TPU-native redesign: the TSDF update is one jitted pass per view — the full
voxel grid projects into the depth/color images as a batched matmul +
bilinear gather, with the usual truncated-SDF weighted running average
(open3d ScalableTSDFVolume semantics, voxel 0.004 / sdf_trunc 0.02 /
depth_trunc 3 defaults). Triangulation defaults to marching cubes
(`pipeline/marching_cubes.py`, tables derived at import — open3d/skimage/
mcubes are absent here) matching the reference's MC topology
(/root/reference/gs2dgs/utils/mcube_utils.py), with naive surface nets
(one vertex per sign-change cell) kept as an alternative.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("width", "height"))
def _tsdf_update(
    tsdf, weight, color_acc,
    voxels,          # [M, 3] world coords (flattened grid chunk)
    depth_img,       # [H, W]
    color_img,       # [3, H, W]
    view_t,          # [4,4] W2C^T (row-vector convention)
    fx, fy, cx, cy,
    sdf_trunc, depth_trunc,
    width: int, height: int,
):
    ones = jnp.ones((voxels.shape[0], 1), voxels.dtype)
    view = jnp.concatenate([voxels, ones], axis=1) @ view_t  # [M,4]
    z = view[:, 2]
    in_front = z > 1e-4
    zs = jnp.where(in_front, z, 1.0)
    u = view[:, 0] / zs * fx + cx
    v = view[:, 1] / zs * fy + cy
    inside = in_front & (u >= 0) & (u <= width - 1) & (v >= 0) & (v <= height - 1)

    ui = jnp.clip(u, 0, width - 1)
    vi = jnp.clip(v, 0, height - 1)
    u0 = jnp.floor(ui).astype(jnp.int32)
    v0 = jnp.floor(vi).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, width - 1)
    v1 = jnp.minimum(v0 + 1, height - 1)
    au = ui - u0
    av = vi - v0

    def sample(img):
        return (
            img[v0, u0] * (1 - au) * (1 - av) + img[v0, u1] * au * (1 - av)
            + img[v1, u0] * (1 - au) * av + img[v1, u1] * au * av
        )

    d = sample(depth_img)
    valid = inside & (d > 1e-4) & (d < depth_trunc)
    sdf = (d - z) / sdf_trunc
    valid = valid & (sdf > -1.0)
    sdf = jnp.clip(sdf, -1.0, 1.0)

    w_new = valid.astype(jnp.float32)
    w_tot = weight + w_new
    w_safe = jnp.maximum(w_tot, 1e-8)
    tsdf = jnp.where(valid, (tsdf * weight + sdf) / w_safe, tsdf)
    c = jnp.stack([sample(color_img[i]) for i in range(3)], axis=-1)
    color_acc = jnp.where(valid[:, None], (color_acc * weight[:, None] + c) / w_safe[:, None],
                          color_acc)
    return tsdf, w_tot, color_acc


def tsdf_fuse(
    render_fn,
    cameras,
    center: np.ndarray,
    extent: float,
    voxel_size: float = 0.004,
    sdf_trunc: float = 0.02,
    depth_trunc: float = 3.0,
    max_resolution: int = 256,
):
    """Fuse rendered depth maps into a TSDF grid.

    render_fn(camera) -> dict with 'render' [3,H,W] and 'render_depth'
    [1,H,W]. Returns (tsdf [R,R,R], weights, colors [R,R,R,3], origin,
    voxel_size)."""
    res = min(max_resolution, int(np.ceil(2 * extent / voxel_size)))
    voxel_size = 2 * extent / res
    origin = np.asarray(center) - extent
    idx = np.arange(res)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    voxels = (np.stack([gx, gy, gz], axis=-1).reshape(-1, 3) + 0.5) * voxel_size + origin
    voxels = jnp.asarray(voxels, jnp.float32)

    m = voxels.shape[0]
    tsdf = jnp.ones(m, jnp.float32)
    weight = jnp.zeros(m, jnp.float32)
    colors = jnp.zeros((m, 3), jnp.float32)

    for cam in cameras:
        pkg = render_fn(cam)
        cj = cam.to_jax()
        w, h = cj.width, cj.height
        fx = w / (2.0 * float(cj.tanfovx))
        fy = h / (2.0 * float(cj.tanfovy))
        tsdf, weight, colors = _tsdf_update(
            tsdf, weight, colors, voxels,
            jnp.asarray(pkg["render_depth"])[0], jnp.asarray(pkg["render"]),
            cj.viewmatrix, fx, fy, w * 0.5 - 0.5, h * 0.5 - 0.5,
            jnp.float32(sdf_trunc / voxel_size * voxel_size),  # in world units
            jnp.float32(depth_trunc), width=w, height=h,
        )

    shape = (res, res, res)
    return (
        np.asarray(tsdf).reshape(shape),
        np.asarray(weight).reshape(shape),
        np.asarray(colors).reshape(shape + (3,)),
        origin, voxel_size,
    )


def surface_nets(tsdf: np.ndarray, weight: np.ndarray, origin, voxel_size,
                 colors: np.ndarray | None = None):
    """Naive surface nets over a TSDF grid -> (vertices, faces, vert_colors)."""
    observed = weight > 0
    sdf = np.where(observed, tsdf, np.nan)

    # cells with a sign change across any of their 8 corners
    def corners(a):
        return np.stack([
            a[:-1, :-1, :-1], a[1:, :-1, :-1], a[:-1, 1:, :-1], a[1:, 1:, :-1],
            a[:-1, :-1, 1:], a[1:, :-1, 1:], a[:-1, 1:, 1:], a[1:, 1:, 1:],
        ], axis=-1)

    c = corners(sdf)
    all_obs = ~np.isnan(c).any(axis=-1)
    has_pos = (c > 0).any(axis=-1)
    has_neg = (c < 0).any(axis=-1)
    active = all_obs & has_pos & has_neg
    if not active.any():
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64), np.zeros((0, 3))

    cell_index = -np.ones(active.shape, np.int64)
    ci, cj, ck = np.nonzero(active)
    cell_index[ci, cj, ck] = np.arange(len(ci))

    # vertex per active cell: centroid of zero crossings on its edges
    corner_offsets = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
        [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1],
    ], float)
    edges = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    vals = c[ci, cj, ck]                       # [A, 8]
    base = np.stack([ci, cj, ck], axis=-1).astype(float)
    verts = np.zeros((len(ci), 3))
    counts = np.zeros(len(ci))
    for a, b in edges:
        va, vb = vals[:, a], vals[:, b]
        crossing = (va > 0) != (vb > 0)
        t = np.where(crossing, va / np.where(va - vb == 0, 1.0, va - vb), 0.0)
        point = corner_offsets[a] + t[:, None] * (corner_offsets[b] - corner_offsets[a])
        verts += np.where(crossing[:, None], point, 0.0)
        counts += crossing
    verts = base + verts / np.maximum(counts, 1)[:, None]
    vertices = (verts + 0.5) * voxel_size + origin

    # faces: for each grid edge crossing the surface, connect the 4 cells
    # sharing it (two triangles), oriented by the sign of the first corner
    faces = []
    for axis in range(3):
        shift = [0, 0, 0]
        shift[axis] = 1
        a = sdf[1:-1, 1:-1, 1:-1]
        b = sdf[1 + shift[0]:sdf.shape[0] - 1 + shift[0],
                1 + shift[1]:sdf.shape[1] - 1 + shift[1],
                1 + shift[2]:sdf.shape[2] - 1 + shift[2]]
        cross = (~np.isnan(a)) & (~np.isnan(b)) & ((a > 0) != (b > 0))
        xi, yi, zi = np.nonzero(cross)
        xi, yi, zi = xi + 1, yi + 1, zi + 1
        # the 4 cells around this edge (perpendicular axes)
        ax1, ax2 = [(1, 2), (0, 2), (0, 1)][axis]
        quads = []
        for d1 in (0, 1):
            for d2 in (0, 1):
                off = [0, 0, 0]
                off[ax1] = -d1
                off[ax2] = -d2
                quads.append(cell_index[xi + off[0], yi + off[1], zi + off[2]])
        q00, q01, q10, q11 = quads
        ok = (q00 >= 0) & (q01 >= 0) & (q10 >= 0) & (q11 >= 0)
        flip = a[xi - 1, yi - 1, zi - 1] > 0
        for sel in np.nonzero(ok)[0]:
            v = (q00[sel], q01[sel], q11[sel], q10[sel])
            if flip[sel]:
                faces.append((v[0], v[1], v[2]))
                faces.append((v[0], v[2], v[3]))
            else:
                faces.append((v[0], v[2], v[1]))
                faces.append((v[0], v[3], v[2]))
    faces = np.asarray(faces, np.int64) if faces else np.zeros((0, 3), np.int64)

    if colors is not None:
        vert_colors = colors[ci, cj, ck]
    else:
        vert_colors = np.zeros((len(ci), 3))
    return vertices, faces, vert_colors


def post_process_mesh(vertices: np.ndarray, faces: np.ndarray,
                      colors: np.ndarray | None = None,
                      cluster_to_keep: int = 1000):
    """Filter out floaters / disconnected parts, keeping the largest
    connected triangle clusters (reference `post_process_mesh`,
    /root/reference/gs2dgs/utils/mesh_utils.py:22-42): cluster triangles
    connected via shared edges, keep clusters with at least
    max(size of the `cluster_to_keep`-th largest cluster, 50) triangles,
    then drop degenerate triangles and unreferenced vertices.

    Operates on the own-format (vertices, faces, colors) numpy mesh and
    returns the filtered triple.
    """
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    n_raw = len(vertices)
    if len(faces) == 0:
        return vertices[:0], faces, (None if colors is None else
                                     np.asarray(colors)[:0])

    # --- connected triangle clusters (edge adjacency, union-find) ---
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], 0)
    e = np.sort(e, axis=1)
    tri = np.tile(np.arange(len(faces)), 3)
    order = np.lexsort((e[:, 1], e[:, 0]))
    e, tri = e[order], tri[order]
    shared = (e[1:] == e[:-1]).all(axis=1)  # consecutive rows = same edge

    parent = np.arange(len(faces))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]  # path halving
            i = parent[i]
        return i

    for k in np.nonzero(shared)[0]:
        a, b = find(tri[k]), find(tri[k + 1])
        if a != b:
            parent[b] = a

    root = np.fromiter((find(i) for i in range(len(faces))), np.int64,
                       len(faces))
    _, labels, counts = np.unique(root, return_inverse=True, return_counts=True)

    # threshold: size of the cluster_to_keep-th largest cluster, floored at 50
    kth = np.sort(counts)[-min(int(cluster_to_keep), len(counts))]
    thresh = max(int(kth), 50)
    faces = faces[counts[labels] >= thresh]

    # remove degenerate triangles (repeated vertex indices)
    nondegen = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                & (faces[:, 0] != faces[:, 2]))
    faces = faces[nondegen]

    # remove unreferenced vertices
    used = np.unique(faces)
    remap = np.full(n_raw, -1, np.int64)
    remap[used] = np.arange(len(used))
    faces = remap[faces]
    vertices = vertices[used]
    if colors is not None:
        colors = np.asarray(colors)[used]
    return vertices, faces, colors


def save_mesh_ply(path: str, vertices: np.ndarray, faces: np.ndarray,
                  colors: np.ndarray | None = None):
    """Binary-LE PLY with vertex + face elements."""
    import os
    import struct

    n, f = len(vertices), len(faces)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += [f"element face {f}", "property list uchar int vertex_indices", "end_header"]
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(("\n".join(header) + "\n").encode("ascii"))
        for i in range(n):
            fh.write(struct.pack("<fff", *vertices[i]))
            if colors is not None:
                cc = np.clip(colors[i] * 255, 0, 255).astype(np.uint8)
                fh.write(struct.pack("<BBB", *cc))
        for i in range(f):
            fh.write(struct.pack("<Biii", 3, *faces[i]))


class GaussianExtractor:
    """Mesh extraction driver (reference GaussianExtractor surface)."""

    def __init__(self, render_fn, cameras):
        self.render_fn = render_fn
        self.cameras = cameras

    def extract_mesh_bounded(self, center, extent, voxel_size=0.004,
                             sdf_trunc=0.02, depth_trunc=3.0, max_resolution=256,
                             method="marching_cubes"):
        tsdf, weight, colors, origin, vs = tsdf_fuse(
            self.render_fn, self.cameras, center, extent,
            voxel_size, sdf_trunc, depth_trunc, max_resolution,
        )
        return _triangulate(method)(tsdf, weight, origin, vs, colors)

    def extract_mesh_unbounded(self, center, scale_radius, resolution=256,
                               depth_trunc=1e9, method="marching_cubes"):
        return tsdf_fuse_unbounded(
            self.render_fn, self.cameras, center, scale_radius,
            resolution=resolution, depth_trunc=depth_trunc, method=method,
        )


def contract(x: np.ndarray) -> np.ndarray:
    """mip-NeRF-360 space contraction: identity inside the unit ball,
    (2 - 1/|x|)·x/|x| outside (the reference's unbounded TSDF variant,
    gs2dgs/utils/mesh_utils.py extract_mesh_unbounded)."""
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    safe = np.maximum(norm, 1e-9)
    return np.where(norm <= 1.0, x, (2.0 - 1.0 / safe) * x / safe)


def uncontract(y: np.ndarray) -> np.ndarray:
    """Inverse contraction (valid for |y| < 2)."""
    norm = np.linalg.norm(y, axis=-1, keepdims=True)
    safe = np.clip(norm, 1e-9, 2.0 - 1e-6)
    return np.where(norm <= 1.0, y, y / (safe * (2.0 - safe)))


def _triangulate(method: str):
    if method == "marching_cubes":
        from .marching_cubes import marching_cubes
        return marching_cubes
    assert method == "surface_nets", method
    return surface_nets


def tsdf_fuse_unbounded(render_fn, cameras, center, scale_radius: float,
                        resolution: int = 256, sdf_trunc_vox: float = 4.0,
                        depth_trunc: float = 1e9, method: str = "marching_cubes"):
    """TSDF fusion on a grid defined in CONTRACTED coordinates (covers the
    whole unbounded scene in a [-2, 2]^3 cube): voxel centers uncontract to
    world space before projecting into the depth maps."""
    import jax.numpy as jnp

    idx = np.arange(resolution)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    step = 4.0 / resolution
    contracted = (np.stack([gx, gy, gz], -1).reshape(-1, 3) + 0.5) * step - 2.0
    # clamp the outer shell inside the invertible region
    cnorm = np.linalg.norm(contracted, axis=-1, keepdims=True)
    contracted = np.where(cnorm >= 1.98, contracted * (1.98 / np.maximum(cnorm, 1e-9)),
                          contracted)
    world = uncontract(contracted) * scale_radius + np.asarray(center)
    voxels = jnp.asarray(world, jnp.float32)

    m = voxels.shape[0]
    tsdf = jnp.ones(m, jnp.float32)
    weight = jnp.zeros(m, jnp.float32)
    colors = jnp.zeros((m, 3), jnp.float32)
    sdf_trunc = sdf_trunc_vox * step * scale_radius

    for cam in cameras:
        pkg = render_fn(cam)
        cj = cam.to_jax()
        w, h = cj.width, cj.height
        fx = w / (2.0 * float(cj.tanfovx))
        fy = h / (2.0 * float(cj.tanfovy))
        tsdf, weight, colors = _tsdf_update(
            tsdf, weight, colors, voxels,
            jnp.asarray(pkg["render_depth"])[0], jnp.asarray(pkg["render"]),
            cj.viewmatrix, fx, fy, w * 0.5 - 0.5, h * 0.5 - 0.5,
            jnp.float32(sdf_trunc), jnp.float32(depth_trunc), width=w, height=h,
        )
    shape = (resolution, resolution, resolution)
    # mesh vertices come out in contracted coords; uncontract after
    verts, faces, vcols = _triangulate(method)(
        np.asarray(tsdf).reshape(shape), np.asarray(weight).reshape(shape),
        np.full(3, -2.0), step, np.asarray(colors).reshape(shape + (3,)),
    )
    verts = uncontract(verts) * scale_radius + np.asarray(center)
    return verts, faces, vcols
