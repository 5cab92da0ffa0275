"""2DGS surfel rasterizer + trainer tests: analytic flat-plane checks,
channel contract, gradients, and a short surfel training run."""

import numpy as np
import jax
import jax.numpy as jnp

from scorp_tpu.core.camera import look_at_camera
from scorp_tpu.core.plyio import GaussianData
from scorp_tpu.core.sh import rgb_to_sh
from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.surfel import depth_to_normal_jax, rasterize_surfel_xla

CFG = RasterConfig(max_keys=1 << 13, tile_list_len=128, chunk=16)
CAM = look_at_camera(eye=[0, 0, -2], target=[0, 0, 0], up=[0, 1, 0],
                     fovx=0.9, fovy=0.9, width=64, height=64)


def flat_surfel(z=0.0, s=0.5, opa=0.95):
    return dict(
        means3d=jnp.array([[0.0, 0.0, z]]),
        opacities=jnp.array([opa]),
        scales=jnp.array([[s, s]]),
        quats=jnp.array([[1.0, 0, 0, 0]]),
        colors_precomp=jnp.array([[0.8, 0.2, 0.1]]),
    )


class TestSurfelForward:
    def test_flat_plane_depth_exact(self):
        g = flat_surfel()
        out = rasterize_surfel_xla(
            g["means3d"], g["opacities"], CAM, jnp.zeros(3),
            colors_precomp=g["colors_precomp"], scales=g["scales"], quats=g["quats"],
            cfg=CFG,
        )
        alpha_c = float(out.alpha[0, 32, 32])
        assert abs(alpha_c - 0.95) < 0.01  # ray hits splat center: G=1
        exp = float(out.depth_accum[0, 32, 32]) / alpha_c
        assert abs(exp - 2.0) < 1e-4
        assert abs(float(out.depth_median[0, 32, 32]) - 2.0) < 1e-4
        n = np.asarray(out.normal[:, 32, 32]) / alpha_c
        np.testing.assert_allclose(n, [0, 0, -1], atol=1e-4)  # faces camera

    def test_tilted_plane_depth_analytic(self):
        ang = np.pi / 6
        q = jnp.array([[np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0]])  # about y
        out = rasterize_surfel_xla(
            jnp.array([[0.0, 0.0, 0.0]]), jnp.array([0.99]), CAM, jnp.zeros(3),
            colors_precomp=jnp.array([[1.0, 1.0, 1.0]]),
            scales=jnp.array([[2.0, 2.0]]), quats=q, cfg=CFG,
        )
        # plane through origin with normal n (rotated z-axis); ray through
        # pixel (x,32): depth where ray meets plane
        fx = 64 / (2 * float(CAM.tanfovx))
        n_world = np.array([np.sin(ang), 0.0, np.cos(ang)])
        for px in (20, 32, 44):
            a = float(out.alpha[0, 32, px])
            if a < 1e-3:
                continue
            d_meas = float(out.depth_accum[0, 32, px]) / a
            # camera at (0,0,-2) looking +z; its right axis is -x world
            # (cross(fwd, up)), so pixel x maps to world -x
            dirv = np.array([-(px - 31.5) / fx, 0.0, 1.0])
            t = np.dot(n_world, np.array([0, 0, 2.0])) / np.dot(n_world, dirv)
            d_true = t  # view z = t * dir_z = t
            assert abs(d_meas - d_true) < 2e-3, (px, d_meas, d_true)

    def test_distortion_zero_single_surfel(self):
        g = flat_surfel()
        out = rasterize_surfel_xla(
            g["means3d"], g["opacities"], CAM, jnp.zeros(3),
            colors_precomp=g["colors_precomp"], scales=g["scales"], quats=g["quats"],
            cfg=CFG,
        )
        # one contributor -> no pairwise depth spread
        assert float(jnp.abs(out.distortion).max()) < 1e-6

    def test_distortion_positive_two_layers(self):
        xyz = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        out = rasterize_surfel_xla(
            xyz, jnp.array([0.5, 0.9]), CAM, jnp.zeros(3),
            colors_precomp=jnp.ones((2, 3)),
            scales=jnp.full((2, 2), 0.5), quats=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
            cfg=CFG,
        )
        assert float(out.distortion[0, 32, 32]) > 1e-5

    def test_gradients_flow_all_channels(self):
        rng = np.random.default_rng(0)
        n = 16
        xyz = jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32))
        scales = jnp.asarray(np.exp(rng.normal(np.log(0.3), 0.2, (n, 2))).astype(np.float32))
        quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        opa = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

        def loss(xyz, scales, quats, opa, colors):
            out = rasterize_surfel_xla(
                xyz, opa, CAM, jnp.zeros(3), colors_precomp=colors,
                scales=scales, quats=quats, cfg=CFG,
            )
            return (
                (out.color**2).mean() + (out.normal**2).mean()
                + (out.depth_accum**2).mean() * 0.01 + out.distortion.mean()
                + (out.alpha**2).mean()
            )

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xyz, scales, quats, opa, colors)
        for g, name in zip(grads, ["xyz", "scales", "quats", "opa", "colors"]):
            arr = np.asarray(g)
            assert np.all(np.isfinite(arr)), name
            assert np.abs(arr).max() > 0, name

        # finite-difference check on opacity
        eps = 1e-3
        g_opa = grads[3]
        for i in [0, 5]:
            fd = (loss(xyz, scales, quats, opa.at[i].add(eps), colors)
                  - loss(xyz, scales, quats, opa.at[i].add(-eps), colors)) / (2 * eps)
            if abs(float(fd)) > 1e-6:
                assert abs(float(g_opa[i]) - float(fd)) < 0.05 * abs(float(fd)) + 1e-5

    def test_depth_to_normal_flat_plane(self):
        depth = jnp.full((1, 64, 64), 2.0)
        # constant view-z plane facing the camera
        n = depth_to_normal_jax(CAM, depth)
        inner = np.asarray(n[:, 20:44, 20:44])
        norms = np.linalg.norm(inner, axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # normal should be ±z in world (camera looks along +z)
        assert np.all(np.abs(inner[2]) > 0.99)


class TestSurfelTraining:
    def test_short_training_converges(self, tmp_path):
        from scorp_tpu.train import from_gaussian_data, init_adam
        from scorp_tpu.train.step2d import Opt2DParams, train_step_2d

        rng = np.random.default_rng(1)
        n = 32
        g_true = GaussianData(
            xyz=rng.uniform(-1, 1, (n, 3)).astype(np.float32),
            f_dc=rgb_to_sh(rng.uniform(0.2, 0.8, (n, 3))).reshape(n, 1, 3).astype(np.float32),
            f_rest=np.zeros((n, 15, 3), np.float32),
            opacity=np.full((n, 1), 2.0, np.float32),
            scaling=np.full((n, 2), np.log(0.25), np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
        )
        cams = [
            look_at_camera(eye=e, target=[0, 0, 0], up=[0, 1, 0],
                           fovx=0.9, fovy=0.9, width=64, height=64)
            for e in ([0, 0, -3.5], [1.5, 0.4, -3.2], [-1.5, -0.4, -3.2])
        ]
        st_true = from_gaussian_data(g_true, capacity=64)
        bg = jnp.zeros(3)
        targets = []
        for cam in cams:
            out = rasterize_surfel_xla(
                st_true.params["xyz"], jax.nn.sigmoid(st_true.params["opacity"][:, 0]),
                cam, bg,
                shs=jnp.concatenate([st_true.params["f_dc"], st_true.params["f_rest"]], 1),
                sh_degree=0, scales=jnp.exp(st_true.params["scaling"]),
                quats=st_true.params["rotation"], alive=st_true.alive, cfg=CFG,
            )
            targets.append(out.color)

        g0 = g_true.copy()
        g0.f_dc = g0.f_dc + rng.normal(0, 0.4, g0.f_dc.shape).astype(np.float32)
        g0.xyz = g0.xyz + rng.normal(0, 0.05, g0.xyz.shape).astype(np.float32)
        st = from_gaussian_data(g0, capacity=64)
        adam = init_adam(st)
        opt = Opt2DParams(iterations=400, depth_from_iter=10**9,
                          lambda_isotropic=0.0, lambda_dist=0.0, lambda_normal=0.0)
        zero_d = jnp.zeros((1, 64, 64))
        psnrs = []
        for it in range(1, 151):
            ci = (it - 1) % 3
            st, adam, m = train_step_2d(
                st, adam, cams[ci], targets[ci], zero_d, zero_d,
                jnp.int32(it), bg, opt=opt, sh_degree=0, cfg=CFG,
            )
            if ci == 0:
                psnrs.append(float(m.psnr))
        assert psnrs[-1] > psnrs[0] + 2.0, (psnrs[0], psnrs[-1])


class TestSurfelCull:
    """The surfel expansion cull (homography-projected UV-disk conic OR
    low-pass circle, surfel.surfel_cull_ellipses) must never drop a key
    whose surfel reaches alpha >= 1/255 anywhere on its tile — verified
    brute-force against the compositor's own alpha formula, on a scene
    with large rotated anisotropic surfels (where the conic completion is
    least trivial)."""

    def test_cull_is_output_invariant(self):
        from scorp_tpu.ops.raster.common import _expand_keys_core
        from scorp_tpu.ops.raster.surfel import (
            ALPHA_MIN,
            FILTER_INV_SQUARE,
            _surfel_prep_to_common,
            preprocess_surfel,
            surfel_cull_ellipses,
        )

        rng = np.random.default_rng(7)
        n = 160
        cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, 1, 0],
                             fovx=0.9, fovy=0.8, width=320, height=240)
        xyz = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
        # anisotropic: long thin rotated surfels exercise the conic math
        scales = jnp.asarray(
            np.stack([rng.uniform(0.02, 0.8, n), rng.uniform(0.005, 0.1, n)],
                     axis=1).astype(np.float32))
        q = rng.standard_normal((n, 4)).astype(np.float32)
        quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
        opa = jnp.asarray(rng.uniform(0.05, 0.99, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

        prep = preprocess_surfel(xyz, opa, cam, colors_precomp=colors,
                                 scales=scales, quats=quats)
        common = _surfel_prep_to_common(prep)
        ell, circ = surfel_cull_ellipses(prep)
        k_cap = 1 << 15
        out0 = jax.jit(lambda p: _expand_keys_core(p, 320, 240, k_cap,
                                                   cull=False))(common)
        out1 = jax.jit(
            lambda p, g1, g2: _expand_keys_core(p, 320, 240, k_cap,
                                                cull=True, geo1=g1, geo2=g2)
        )(common, ell, circ)
        t0, g0, order, total, x0, y0, r0, kept0 = out0
        _, _, _, _, _, _, r1, kept1 = out1
        assert int(total) <= k_cap
        r0 = np.asarray(r0)
        culled = r0 & ~np.asarray(r1)
        idx = np.nonzero(culled)[0]
        assert int(kept1) <= int(kept0)

        # brute-force: max alpha of each culled key over its 16x16 tile
        order_np = np.asarray(order)
        g_np = np.asarray(g0)
        ktx = np.asarray(x0)
        kty = np.asarray(y0)
        M = np.asarray(prep.M).astype(np.float64)
        xy = np.asarray(prep.xy)
        opa_np = np.asarray(prep.opacity)
        bad = 0
        worst = 0.0
        for k in idx:
            gi = order_np[g_np[k]]
            px = np.arange(ktx[k] * 16, ktx[k] * 16 + 16, dtype=np.float64)
            py = np.arange(kty[k] * 16, kty[k] * 16 + 16, dtype=np.float64)
            PX, PY = np.meshgrid(px, py)
            r1_, r2_, r3_ = M[gi]
            hu = r1_[None, None] - PX[..., None] * r3_[None, None]
            hv = r2_[None, None] - PY[..., None] * r3_[None, None]
            s = np.cross(hu, hv)
            sz = np.where(np.abs(s[..., 2]) > 1e-9, s[..., 2], 1e-9)
            u = np.clip(s[..., 0] / sz, -1e3, 1e3)
            v = np.clip(s[..., 1] / sz, -1e3, 1e3)
            rho3d = u * u + v * v
            d_x = xy[gi, 0] - PX
            d_y = xy[gi, 1] - PY
            rho2d = FILTER_INV_SQUARE * (d_x * d_x + d_y * d_y)
            a = float(np.max(opa_np[gi] * np.exp(
                -0.5 * np.minimum(rho3d, rho2d))))
            worst = max(worst, a)
            bad += a >= ALPHA_MIN
        assert bad == 0, (bad, worst)
