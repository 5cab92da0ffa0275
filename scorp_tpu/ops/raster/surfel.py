"""Differentiable 2DGS surfel rasterizer (XLA path).

Re-implements the semantic contract of the reference's
`diff_surfel_rasterization` CUDA extension (reconstructed from its call
sites, /root/reference/gs2dgs/gaussian_renderer/__init__.py:24-170 and
SURVEY.md §2.3b), as a pure-JAX tile pipeline sharing the 3DGS binning
machinery:

  * each surfel is a 2D Gaussian disc: world point X(u,v) = p + s_u·t_u·u
    + s_v·t_v·v with (t_u, t_v, t_n) the quaternion frame; the pixel-to-UV
    map is the exact ray-splat homography — per pixel, (u,v) comes from the
    cross product of the two plane constraints h_u = m1 - x·m3,
    h_v = m2 - y·m3 of the 3x3 splat->pixel matrix M (2DGS paper eq. 7-9);
  * per-pixel falloff is min(ρ_3d, ρ_2d) where ρ_2d is the 0.707px screen
    low-pass (FilterInvSquare = 2), matching the CUDA kernel;
  * the 7-channel allmap contract: [0] alpha-weighted expected view depth,
    [1] alpha, [2:5] alpha-weighted view-space normal (sign-flipped toward
    the camera), [5] median depth (depth of the last contributor whose
    entry transmittance exceeds 0.5), [6] depth distortion
    Σ_i w_i (m_i²·A + D2 - 2·m_i·D) with m the (0.2, 100) NDC-mapped depth;
  * front-to-back compositing, 1/255 alpha cutoff, 0.99 clamp, T<1e-4
    termination, near-plane (0.2) skip — identical to the 3DGS path.

Differentiation is by autodiff (the whole forward is jnp; backward flows
through color, alpha, normal, depth and distortion channels as
train_2dgs.py:141-150 requires). A Pallas surfel kernel mirroring
pallas_fwd/pallas_bwd is planned; the XLA path is the correctness anchor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import sh as sh_lib
from ...core.camera import CameraJax
from ...core.quat import quat_to_rotmat
from .common import (
    TILE,
    Preprocessed,
    RasterConfig,
    bin_gaussians,
    grid_dims,
    tile_pixel_coords,
    tiles_to_image,
)

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
NEAR_PLANE = 0.2
FAR_PLANE = 100.0
FILTER_INV_SQUARE = 2.0


class SurfelPrep(NamedTuple):
    M: jnp.ndarray          # [N,3,3] splat-UV -> pixel homogeneous
    zrow: jnp.ndarray       # [N,3] view-depth as linear fn of (u,v,1)
    xy: jnp.ndarray         # [N,2] projected centers (pixels)
    depth: jnp.ndarray      # [N] center view z
    normal: jnp.ndarray     # [N,3] view-space normal (camera-facing)
    color: jnp.ndarray      # [N,3]
    opacity: jnp.ndarray    # [N]
    radii: jnp.ndarray      # [N] i32
    rect: jnp.ndarray       # [N,4] i32 binning tile rect
    valid: jnp.ndarray      # [N] bool


class SurfelOutput(NamedTuple):
    color: jnp.ndarray         # [3, H, W]
    alpha: jnp.ndarray         # [1, H, W]
    depth_accum: jnp.ndarray   # [1, H, W] alpha-weighted expected view depth
    normal: jnp.ndarray        # [3, H, W] view-space, alpha-weighted
    depth_median: jnp.ndarray  # [1, H, W]
    distortion: jnp.ndarray    # [1, H, W]
    radii: jnp.ndarray
    num_dropped_keys: jnp.ndarray
    num_dropped_tail: jnp.ndarray


def preprocess_surfel(
    means3d, opacities, cam: CameraJax, *,
    shs=None, sh_degree: int = 0, colors_precomp=None,
    scales=None, quats=None, scale_modifier: float = 1.0,
    screen_deltas=None, alive=None,
) -> SurfelPrep:
    n = means3d.shape[0]
    w, h = cam.width, cam.height
    tiles_x, tiles_y = grid_dims(w, h)

    V = cam.viewmatrix
    r_w2c = V[:3, :3].T            # world -> view rotation
    t_w2c = V[3, :3]
    fx = w / (2.0 * cam.tanfovx)
    fy = h / (2.0 * cam.tanfovy)
    cx = w * 0.5 - 0.5
    cy = h * 0.5 - 0.5
    K = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    K = K.at[0, 0].set(fx).at[0, 2].set(cx).at[1, 1].set(fy).at[1, 2].set(cy)
    A = K @ r_w2c                  # world dir -> (xw, yw, w)
    b = K @ t_w2c

    R = quat_to_rotmat(quats)      # [N,3,3] columns t_u, t_v, t_n
    su = scales[:, 0] * scale_modifier
    sv = scales[:, 1] * scale_modifier
    axis_u = R[:, :, 0] * su[:, None]   # [N,3] world
    axis_v = R[:, :, 1] * sv[:, None]
    t_n = R[:, :, 2]

    M0 = axis_u @ A.T              # [N,3] column 0 of M
    M1 = axis_v @ A.T
    M2 = means3d @ A.T + b
    M = jnp.stack([M0, M1, M2], axis=-1)  # [N,3,3] columns

    zu = axis_u @ r_w2c.T[:, 2]
    zv = axis_v @ r_w2c.T[:, 2]
    zc = means3d @ r_w2c.T[:, 2] + t_w2c[2]
    zrow = jnp.stack([zu, zv, zc], axis=-1)

    in_front = zc > NEAR_PLANE
    w_center = jnp.where(jnp.abs(M2[:, 2]) > 1e-8, M2[:, 2], 1e-8)
    pix_x = M2[:, 0] / w_center
    pix_y = M2[:, 1] / w_center
    if screen_deltas is not None:
        pix_x = pix_x + screen_deltas[:, 0] * (w * 0.5)
        pix_y = pix_y + screen_deltas[:, 1] * (h * 0.5)
    xy = jnp.stack([pix_x, pix_y], axis=-1)

    # conservative screen bbox: corners of the ±c(u,v) splat rect projected,
    # unioned with the low-pass disc around the center
    opacity = opacities.reshape(n)
    t2 = jnp.maximum(2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * 255.0), 0.0)
    c_uv = jnp.minimum(3.0, jnp.sqrt(t2))
    corners = []
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            hom = M2 + c_uv[:, None] * (sx * M0 + sy * M1)
            wc = jnp.maximum(hom[:, 2], 1e-2)   # clamp behind-camera corners
            corners.append(jnp.stack([hom[:, 0] / wc, hom[:, 1] / wc], axis=-1))
    corners = jnp.stack(corners, axis=1)        # [N,4,2]
    r_lp = jnp.sqrt(t2 / FILTER_INV_SQUARE)
    lo = jnp.minimum(corners.min(axis=1), xy - r_lp[:, None])
    hi = jnp.maximum(corners.max(axis=1), xy + r_lp[:, None])

    x0 = jnp.clip((lo[:, 0] / TILE).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip((lo[:, 1] / TILE).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(((hi[:, 0] + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_x)
    y1 = jnp.clip(((hi[:, 1] + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_y)
    valid = in_front & (t2 > 0.0) & (x1 > x0) & (y1 > y0)
    if alive is not None:
        valid = valid & alive
    x0 = jnp.where(valid, x0, 0)
    y0 = jnp.where(valid, y0, 0)
    x1 = jnp.where(valid, x1, 0)
    y1 = jnp.where(valid, y1, 0)
    rect = jnp.stack([x0, y0, x1, y1], axis=-1)

    half_extent = jnp.maximum(hi - xy, xy - lo).max(axis=1)
    radii = jnp.where(valid, jnp.ceil(half_extent).astype(jnp.int32), 0)

    # view-space normal, sign-flipped toward the camera
    n_view = t_n @ r_w2c.T
    p_view_z = zc
    p_view = means3d @ r_w2c.T + t_w2c
    cos = -jnp.sum(p_view * n_view, axis=-1)
    n_view = n_view * jnp.where(cos > 0, 1.0, -1.0)[:, None]

    if colors_precomp is not None:
        color = colors_precomp
    else:
        dirs = means3d - cam.campos[None, :]
        dirs = dirs * jax.lax.rsqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20)
        color = jnp.maximum(sh_lib.eval_sh(sh_degree, shs, dirs) + 0.5, 0.0)

    return SurfelPrep(M, zrow, xy, p_view_z, n_view, color, opacity, radii, rect, valid)


def surfel_adj(M: jnp.ndarray) -> jnp.ndarray:
    """Normalized adjugate rows [N, 9] (a1 a2 a3, row-major).

    The ray-splat solve s = (r1 - px r3) x (r2 - py r3) expands to the
    LINEAR form s = adj(M) @ (px, py, 1) (the pxpy cross terms cancel), so
    precomputing adj(M) per splat turns the compositor's per-(pixel,key)
    homogeneous-cross chain (~21 VPU ops) into three 2-FMA rows (~9 ops).
    u = sx/sz and v = sy/sz are invariant to per-splat scaling, so
    normalizing by the max |entry| (a stop_gradient constant) keeps every
    downstream value and gradient exact while keeping f32 healthy.
    """
    c0, c1, c2 = M[:, :, 0], M[:, :, 1], M[:, :, 2]
    a = jnp.concatenate(
        [jnp.cross(c1, c2), jnp.cross(c2, c0), jnp.cross(c0, c1)], axis=1
    )
    nrm = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(a), axis=1, keepdims=True), 1e-30)
    )
    return a / nrm


def surfel_cull_ellipses(prep: SurfelPrep) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-surfel screen ellipses for the exact alpha>=1/255 tile cull.

    alpha = opa * exp(-min(rho3d, rho2d)/2) reaches 1/255 somewhere in a
    tile iff (min over the tile of rho3d <= t2) OR (min rho2d <= t2), with
    t2 = 2 log(255 opa):

      * {rho3d <= t2} is the image of the UV-disk u^2+v^2 <= t2 under the
        splat->screen homography H = M (columns M0 M1 M2; the compositor's
        hu x hv construction evaluates s = adj(H) @ (px, py, 1), and
        rho3d = (sx^2 + sy^2)/sz^2) — i.e. the conic
        p^T [adj(H)^T diag(1,1,-t2) adj(H)] p <= 0. Completing the square
        yields the centered form (p-x0)^T A' (p-x0) <= rho that
        common/pallas_expand's ellipse-tile test consumes directly.
      * {rho2d <= t2} is the low-pass circle A=C=FILTER_INV_SQUARE around
        the projected center.

    Degenerate conics (splat plane nearly containing the eye ray: A' not
    positive definite) are force-kept via an infinite threshold; an empty
    ellipse (rho < 0: the 3D test passes nowhere) keeps only via the
    circle. Returns two [N, 6] arrays (cx, cy, A, B, C, t2).
    """
    n = prep.xy.shape[0]
    t2 = jnp.maximum(
        2.0 * jnp.log(jnp.maximum(prep.opacity, 1e-12) * 255.0), 0.0
    )
    c0 = prep.M[:, :, 0]
    c1 = prep.M[:, :, 1]
    c2 = prep.M[:, :, 2]
    a1 = jnp.cross(c1, c2)      # rows of adj(H)
    a2 = jnp.cross(c2, c0)
    a3 = jnp.cross(c0, c1)
    # scale-invariant test: normalize adj to keep Q (quartic in M) in f32
    nrm = jnp.maximum(
        jnp.max(
            jnp.maximum(jnp.abs(a1), jnp.maximum(jnp.abs(a2), jnp.abs(a3))),
            axis=1,
        ),
        1e-30,
    )[:, None]
    a1 = a1 / nrm
    a2 = a2 / nrm
    a3 = a3 / nrm

    def q(i, j):
        return (
            a1[:, i] * a1[:, j] + a2[:, i] * a2[:, j]
            - t2 * a3[:, i] * a3[:, j]
        )

    A, B, C = q(0, 0), q(0, 1), q(1, 1)
    q0, q1, cq = q(0, 2), q(1, 2), q(2, 2)
    det2 = A * C - B * B
    pd = (A > 0.0) & (C > 0.0) & (det2 > 0.0)
    inv_det = 1.0 / jnp.where(pd, det2, 1.0)
    x0 = (B * q1 - C * q0) * inv_det
    y0 = (B * q0 - A * q1) * inv_det
    # near-degenerate conics put the completed-square center astronomically
    # far off-screen (tiny det2): the test is numerically meaningless there
    # — treat like ~pd (force-keep)
    ok = pd & (jnp.abs(x0) < 1e6) & (jnp.abs(y0) < 1e6)
    rho = -(cq + q0 * x0 + q1 * y0)
    # ~ok -> force-keep via a huge FINITE threshold (inf would turn into
    # NaN inside the expansion kernel's bf16x3 table split); ok & rho<0 ->
    # ellipse empty (negative threshold: the q >= 0 test can never pass)
    thr = jnp.where(ok, rho, 1e30)
    x0 = jnp.where(ok, x0, 0.0)
    y0 = jnp.where(ok, y0, 0.0)
    A = jnp.where(ok, A, 1.0)
    B = jnp.where(ok, B, 0.0)
    C = jnp.where(ok, C, 1.0)
    ell = jnp.stack([x0, y0, A, B, C, thr], axis=1)

    f = jnp.full((n,), FILTER_INV_SQUARE, jnp.float32)
    circ = jnp.stack(
        [prep.xy[:, 0], prep.xy[:, 1], f, jnp.zeros_like(f), f, t2], axis=1
    )
    return ell.astype(jnp.float32), circ.astype(jnp.float32)


def _surfel_prep_to_common(prep: SurfelPrep) -> Preprocessed:
    """Adapter so the shared binning consumes surfel prep (conic unused)."""
    return Preprocessed(
        xy=prep.xy, depth=prep.depth, conic=jnp.zeros_like(prep.normal),
        color=prep.color, opacity=prep.opacity, radii=prep.radii,
        rect=prep.rect, valid=prep.valid,
    )


def _chunk_contrib(prep: SurfelPrep, ids, pix_x, pix_y):
    """ids [T,C] -> (alpha, z, m, color [T,C,3], normal [T,C,3]) blocks."""
    mask = ids >= 0
    safe = jnp.maximum(ids, 0)
    M = prep.M[safe]              # [T,C,3,3]
    zrow = prep.zrow[safe]        # [T,C,3]
    xy = prep.xy[safe]
    opa = prep.opacity[safe]
    color = prep.color[safe]
    normal = prep.normal[safe]

    x = pix_x[:, None, :]         # [T,1,P]
    y = pix_y[:, None, :]
    # plane constraints per pixel: hu = m1 - x*m3, hv = m2 - y*m3 with
    # s = hu x hv, scalarized per component (a trailing length-3 axis would
    # pad the vector units 40x)
    m1x, m1y, m1z = (M[..., 0, i][..., None] for i in range(3))  # [T,C,1]
    m2x, m2y, m2z = (M[..., 1, i][..., None] for i in range(3))
    m3x, m3y, m3z = (M[..., 2, i][..., None] for i in range(3))
    hux = m1x - x * m3x
    huy = m1y - x * m3y
    huz = m1z - x * m3z
    hvx = m2x - y * m3x
    hvy = m2y - y * m3y
    hvz = m2z - y * m3z
    sx = huy * hvz - huz * hvy    # [T,C,P]
    sy = huz * hvx - hux * hvz
    s_z = hux * hvy - huy * hvx
    sz = jnp.where(jnp.abs(s_z) > 1e-9, s_z, 1e-9)
    # clip the UV solution: near-degenerate (edge-on) splats produce huge
    # u,v whose exp(-rho/2) underflows to 0 but whose VJP is inf*0 = NaN;
    # the clip's zero boundary gradient kills that path exactly where the
    # contribution is already zero
    u = jnp.clip(sx / sz, -1e3, 1e3)   # [T,C,P]
    v = jnp.clip(sy / sz, -1e3, 1e3)

    rho3d = u * u + v * v
    dx = xy[..., 0:1] - pix_x[:, None, :]
    dy = xy[..., 1:2] - pix_y[:, None, :]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    alpha = jnp.minimum(ALPHA_MAX, opa[..., None] * jnp.exp(-0.5 * rho))

    z = jnp.where(
        use3d,
        u * zrow[..., 0:1] + v * zrow[..., 1:2] + zrow[..., 2:3],
        zrow[..., 2:3],
    )
    alpha = jnp.where(
        (alpha >= ALPHA_MIN) & (z >= NEAR_PLANE) & mask[..., None], alpha, 0.0
    )
    m_ndc = (FAR_PLANE / (FAR_PLANE - NEAR_PLANE)) * (1.0 - NEAR_PLANE / jnp.maximum(z, 1e-6))
    return alpha, z, m_ndc, color, normal


def composite_surfel_tiles(prep: SurfelPrep, bins, pix_x, pix_y, cfg: RasterConfig,
                           remat: bool = True):
    num_tiles, L = bins.tile_lists.shape
    C = min(cfg.chunk, L)
    assert L % C == 0
    p = pix_x.shape[1]
    xs = bins.tile_lists.reshape(num_tiles, L // C, C).transpose(1, 0, 2)
    arange_c = jnp.arange(C, dtype=jnp.float32)

    def body(carry, ids):
        (t_carry, stopped, acc_c, acc_d, acc_n, acc_med, acc_dist,
         acc_A, acc_D, acc_D2) = carry
        alpha, z, m, color, normal = _chunk_contrib(prep, ids, pix_x, pix_y)
        # [T,C,P] blocks; cumprod along C
        cum_incl = jnp.cumprod(1.0 - alpha, axis=1)
        t_after = t_carry[:, None, :] * cum_incl
        # reference sticky-done rule: the key that would drop T below 1e-4 is
        # excluded and the pixel stops for good (across chunks)
        include = (t_after >= T_EPS) & ~stopped[:, None, :]
        cum_before = jnp.concatenate(
            [jnp.ones_like(cum_incl[:, :1, :]), cum_incl[:, :-1, :]], axis=1
        )
        t_before = t_carry[:, None, :] * cum_before
        w = jnp.where(include, alpha * t_before, 0.0)   # [T,C,P]

        acc_c = acc_c + jnp.einsum("tcp,tcd->tpd", w, color,
                                   preferred_element_type=jnp.float32)
        acc_n = acc_n + jnp.einsum("tcp,tcd->tpd", w, normal,
                                   preferred_element_type=jnp.float32)
        acc_d = acc_d + jnp.sum(w * z, axis=1)

        # median depth: last contributor with entry transmittance > 0.5
        cond = include & (t_before > 0.5) & (alpha > 0.0)
        idx_score = jnp.where(cond, arange_c[None, :, None] + 1.0, 0.0)
        best = jnp.argmax(idx_score, axis=1)            # [T,P]
        has = jnp.max(idx_score, axis=1) > 0.0
        z_best = jnp.take_along_axis(z, best[:, None, :], axis=1)[:, 0, :]
        acc_med = jnp.where(has, z_best, acc_med)

        # distortion: L_i = w_i (m² A + D2 - 2 m D) with prefix accumulators
        wm = w * m
        wm2 = w * m * m
        A_pre = acc_A[:, None, :] + jnp.cumsum(w, axis=1) - w
        D_pre = acc_D[:, None, :] + jnp.cumsum(wm, axis=1) - wm
        D2_pre = acc_D2[:, None, :] + jnp.cumsum(wm2, axis=1) - wm2
        acc_dist = acc_dist + jnp.sum(
            w * (m * m * A_pre + D2_pre - 2.0 * m * D_pre), axis=1
        )
        acc_A = acc_A + jnp.sum(w, axis=1)
        acc_D = acc_D + jnp.sum(wm, axis=1)
        acc_D2 = acc_D2 + jnp.sum(wm2, axis=1)

        t_carry = jnp.min(jnp.where(include, t_after, t_carry[:, None, :]), axis=1)
        stopped = stopped | jnp.any(t_after < T_EPS, axis=1)
        return (t_carry, stopped, acc_c, acc_d, acc_n, acc_med, acc_dist,
                acc_A, acc_D, acc_D2), None

    if remat:
        body = jax.checkpoint(body)

    z0 = jnp.zeros((num_tiles, p), jnp.float32)
    init = (
        jnp.ones((num_tiles, p), jnp.float32),
        jnp.zeros((num_tiles, p), bool),
        jnp.zeros((num_tiles, p, 3), jnp.float32),
        z0, jnp.zeros((num_tiles, p, 3), jnp.float32),
        jnp.zeros((num_tiles, p), jnp.float32),
        jnp.zeros((num_tiles, p), jnp.float32),
        jnp.zeros((num_tiles, p), jnp.float32),
        jnp.zeros((num_tiles, p), jnp.float32),
        jnp.zeros((num_tiles, p), jnp.float32),
    )
    (t_final, _, acc_c, acc_d, acc_n, acc_med, acc_dist, *_), _ = jax.lax.scan(body, init, xs)
    return t_final, acc_c, acc_d, acc_n, acc_med, acc_dist


def rasterize_surfel_xla(
    means3d, opacities, cam: CameraJax, bg, *,
    shs=None, sh_degree: int = 0, colors_precomp=None,
    scales=None, quats=None, scale_modifier: float = 1.0,
    screen_deltas=None, alive=None, cfg: RasterConfig = RasterConfig(),
    remat: bool = True,
) -> SurfelOutput:
    w, h = cam.width, cam.height
    prep = preprocess_surfel(
        means3d, opacities, cam, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scales=scales, quats=quats,
        scale_modifier=scale_modifier, screen_deltas=screen_deltas, alive=alive,
    )
    bins = jax.lax.stop_gradient(
        bin_gaussians(jax.lax.stop_gradient(_surfel_prep_to_common(prep)), w, h, cfg)
    )
    pix_x, pix_y = tile_pixel_coords(w, h)
    t_final, acc_c, acc_d, acc_n, acc_med, acc_dist = composite_surfel_tiles(
        prep, bins, pix_x, pix_y, cfg, remat=remat
    )
    color_tiles = acc_c + t_final[..., None] * bg[None, None, :]
    color = tiles_to_image(color_tiles, w, h)
    alpha = tiles_to_image((1.0 - t_final)[..., None], w, h)
    depth = tiles_to_image(acc_d[..., None], w, h)
    normal = tiles_to_image(acc_n, w, h)
    med = tiles_to_image(acc_med[..., None], w, h)
    dist = tiles_to_image(acc_dist[..., None], w, h)
    return SurfelOutput(color, alpha, depth, normal, med, dist, prep.radii,
                        bins.num_dropped_keys, bins.num_dropped_tail)


def depth_to_normal_jax(cam: CameraJax, depth: jnp.ndarray) -> jnp.ndarray:
    """Pseudo surface normal from a depth map ([1,H,W] -> [3,H,W], world
    space), equivalent of /root/reference/gs3dgs/utils/point_utils.py:9-37:
    unproject to world points, cross the finite differences."""
    w, h = cam.width, cam.height
    fx = w / (2.0 * cam.tanfovx)
    fy = h / (2.0 * cam.tanfovy)
    c2w = jnp.linalg.inv(cam.viewmatrix.T)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    rays = jnp.stack([(xs - w / 2.0) / fx, (ys - h / 2.0) / fy, jnp.ones((h, w))], -1)
    rays_w = rays @ c2w[:3, :3].T
    points = depth[0][..., None] * rays_w + c2w[:3, 3]
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    nrm = jnp.cross(dx, dy)
    # eps inside the sqrt: x/||x|| has a NaN VJP at x=0 even under a zero
    # cotangent (0 * nan), which poisons zero-weighted loss terms
    nrm = nrm * jax.lax.rsqrt(jnp.sum(nrm * nrm, axis=-1, keepdims=True) + 1e-20)
    out = jnp.zeros((h, w, 3))
    out = out.at[1:-1, 1:-1].set(nrm)
    return out.transpose(2, 0, 1)
