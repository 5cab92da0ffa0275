"""SCORP pipeline-utility tests: pose solvers (synthetic recovery, the
reference's own sanity-check pattern from solution.py:560-578), SH rotation,
Gaussian rigid transforms, view scoring, crop/restore round-trips."""

import numpy as np
import jax.numpy as jnp
import pytest

from scorp_tpu.core.quat import quat_to_rotmat
from scorp_tpu.core.sh import eval_sh


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(quat_to_rotmat(jnp.asarray(q[None], jnp.float32)))[0].astype(np.float64)


class TestSolvers:
    def test_kabsch_recovery(self):
        from scorp_tpu.pipeline.solvers import kabsch_np
        rng = np.random.default_rng(0)
        P = rng.normal(size=(50, 3))
        R = random_rotation(rng)
        t = rng.normal(size=3)
        Q = P @ R.T + t
        R_est, t_est, s = kabsch_np(P, Q)
        np.testing.assert_allclose(R_est, R, atol=1e-5)
        np.testing.assert_allclose(t_est, t, atol=1e-5)
        assert s == 1.0

    def test_umeyama_recovery(self):
        from scorp_tpu.pipeline.solvers import umeyama_np
        rng = np.random.default_rng(1)
        P = rng.normal(size=(60, 3))
        R = random_rotation(rng)
        s, t = 1.7, rng.normal(size=3)
        Q = s * (P @ R.T) + t
        R_est, t_est, s_est = umeyama_np(P, Q)
        np.testing.assert_allclose(R_est, R, atol=1e-5)
        np.testing.assert_allclose(s_est, s, atol=1e-5)
        np.testing.assert_allclose(t_est, t, atol=1e-5)

    def test_umeyama_generalized_recovery(self):
        from scorp_tpu.pipeline.solvers import umeyama_generalized_np
        rng = np.random.default_rng(2)
        P = rng.normal(size=(80, 3))
        R = random_rotation(rng)
        S = np.array([1.2, 0.8, 1.5])
        t = rng.normal(size=3)
        Q = (R @ (S * P).T).T + t
        R_est, t_est, S_est = umeyama_generalized_np(P, Q)
        np.testing.assert_allclose(R_est, R, atol=1e-4)
        np.testing.assert_allclose(S_est, S, atol=1e-4)
        np.testing.assert_allclose(t_est, t, atol=1e-4)

    def test_polar_12dof_recovery(self):
        # the reference's own __main__ check (solution.py:560-578)
        from scorp_tpu.pipeline.solvers import polar_12dof_np
        rng = np.random.default_rng(3)
        P = rng.normal(size=(1000, 3))
        R = random_rotation(rng)
        R2 = random_rotation(rng)
        S = np.diag([1.2, 0.8, 1.5])
        t = np.array([0.3, -1.1, 2.0])
        Q = (R @ R2.T @ S @ R2 @ P.T).T + t + rng.normal(size=(1000, 3)) * 0.05
        R_est, t_est, S_est, R2_est = polar_12dof_np(P, Q)
        # composite map must match even if the factorization is ambiguous
        M_true = R @ R2.T @ S @ R2
        M_est = R_est @ R2_est.T @ S_est @ R2_est
        np.testing.assert_allclose(M_est, M_true, atol=0.05)
        np.testing.assert_allclose(t_est, t, atol=0.05)

    def test_ransac_with_outliers(self):
        from scorp_tpu.pipeline.solvers import pc_align_ransac
        rng = np.random.default_rng(4)
        P = rng.normal(size=(200, 3))
        R = random_rotation(rng)
        s, t = 1.3, np.array([0.5, -0.2, 0.9])
        Q = s * (P @ R.T) + t
        # corrupt 30% of the targets
        bad = rng.choice(200, 60, replace=False)
        Q[bad] += rng.normal(size=(60, 3)) * 5.0
        R_est, t_est, s_est = pc_align_ransac(P, Q, threshold=0.05, max_iterations=512)
        np.testing.assert_allclose(R_est, R, atol=1e-3)
        np.testing.assert_allclose(s_est, s, atol=1e-3)
        np.testing.assert_allclose(t_est, t, atol=1e-3)

    def test_adam_9dof_recovery(self):
        from scorp_tpu.pipeline.solvers import adam_algorithm_3d3d_9dof
        rng = np.random.default_rng(5)
        P = rng.normal(size=(300, 3)).astype(np.float32)
        # modest transform within the sigmoid scale bounds
        angle = 0.2
        R = np.array([
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1.0],
        ])
        S = np.array([1.1, 0.9, 1.2])
        t = np.array([0.1, -0.2, 0.15])
        Q = (R @ (S * P).T).T + t
        R_est, t_est, s_est, R2_est = adam_algorithm_3d3d_9dof(
            P, Q, iterations=3000, verbose_interval=0, lr=5e-3
        )
        M_true = R @ np.diag(S)
        M_est = R_est @ R2_est.T @ np.diag(s_est) @ R2_est
        err = np.abs(
            (M_est @ P.T).T + t_est - Q
        ).mean()
        assert err < 0.03, err


class TestSHRotation:
    @pytest.mark.parametrize("deg", [1, 2, 3])
    def test_functional_consistency(self, deg):
        from scorp_tpu.pipeline.sh_rotation import rotate_sh
        rng = np.random.default_rng(6 + deg)
        R = random_rotation(rng)
        k = (deg + 1) ** 2
        sh = rng.normal(size=(4, k, 3)).astype(np.float32)
        dirs = rng.normal(size=(4, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        sh_rot = np.concatenate([sh[:, :1], rotate_sh(sh[:, 1:], R)], axis=1)
        e_rot = np.asarray(eval_sh(deg, jnp.asarray(sh_rot), jnp.asarray(dirs.astype(np.float32))))
        e_ref = np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray((dirs @ R).astype(np.float32))))
        np.testing.assert_allclose(e_rot, e_ref, atol=1e-5)

    def test_orthogonality(self):
        from scorp_tpu.pipeline.sh_rotation import real_sh_rotation_matrices
        rng = np.random.default_rng(9)
        R = random_rotation(rng)
        for D in real_sh_rotation_matrices(R, 3):
            np.testing.assert_allclose(D @ D.T, np.eye(D.shape[0]), atol=1e-5)


class TestGSTransform:
    def test_rotate_consistency_with_render(self):
        # rotating the cloud and the camera together must reproduce the image
        from scorp_tpu.pipeline.gs_transform import gaussians_rotate, gaussians_translate
        from scorp_tpu.core.plyio import GaussianData
        from scorp_tpu.ops.raster.xla import rasterize_naive
        from scorp_tpu.core.camera import make_camera_jax, look_at_camera
        from tests.synth import make_gt_gaussians, orbit_pose

        rng = np.random.default_rng(10)
        g = make_gt_gaussians(n=24, seed=11)
        g.f_rest = rng.normal(0, 0.05, size=g.f_rest.shape).astype(np.float32)
        g.rotation = rng.normal(size=g.rotation.shape).astype(np.float32)
        g.scaling = rng.normal(np.log(0.15), 0.2, size=g.scaling.shape).astype(np.float32)
        R_c2w, T_w2c = orbit_pose(0.7)
        cam = make_camera_jax(R_c2w, T_w2c, 0.9, 0.9, 64, 64)

        def render(gd, camera):
            return np.asarray(rasterize_naive(
                jnp.asarray(gd.xyz), jnp.asarray(1 / (1 + np.exp(-gd.opacity[:, 0]))),
                camera, jnp.zeros(3),
                shs=jnp.asarray(np.concatenate([gd.f_dc, gd.f_rest], 1)), sh_degree=3,
                scales=jnp.asarray(np.exp(gd.scaling)), quats=jnp.asarray(gd.rotation),
            ).color)

        base = render(g, cam)

        Rw = random_rotation(rng)
        g2 = g.copy()
        gaussians_rotate(g2, Rw)
        # rotate the camera pose by the same world rotation:
        # new C2W rotation = Rw @ R_c2w, new center = Rw @ center
        center = -R_c2w @ T_w2c
        R2 = Rw @ R_c2w
        T2 = -(R2.T @ (Rw @ center))
        cam2 = make_camera_jax(R2, T2, 0.9, 0.9, 64, 64)
        rotated = render(g2, cam2)
        assert np.abs(rotated - base).max() < 5e-3

    def test_translate_scale(self):
        from scorp_tpu.pipeline.gs_transform import gaussians_scale, gaussians_translate
        from tests.synth import make_gt_gaussians
        g = make_gt_gaussians(n=8, seed=12)
        orig = g.xyz.copy()
        gaussians_translate(g, np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(g.xyz, orig + np.array([1, 2, 3]), atol=1e-6)
        s0 = np.exp(g.scaling.copy())
        gaussians_scale(g, 2.0)
        np.testing.assert_allclose(np.exp(g.scaling), s0 * 2.0, rtol=1e-5)


class TestImageUtils:
    def test_crop_restore_roundtrip(self):
        from scorp_tpu.pipeline.image_utils import crop_with_alpha, restore_coords
        rng = np.random.default_rng(13)
        rgb = rng.uniform(size=(3, 100, 120)).astype(np.float32)
        alpha = np.zeros((1, 100, 120), np.float32)
        alpha[0, 40:60, 50:80] = 1.0
        crgb, _, xxyy = crop_with_alpha(rgb, alpha, border=16, dfactor=8)
        assert crgb.shape[1] % 8 == 0 and crgb.shape[2] % 8 == 0
        # a coordinate in cropped space maps back into the original bbox
        pt = np.array([[16, 8]])  # the crop's top-left content corner
        restored = restore_coords(pt, xxyy)
        np.testing.assert_array_equal(restored, [[50, 40]])

    def test_mask_bbox(self):
        from scorp_tpu.pipeline.views import get_xyxy_from_mask
        m = np.zeros((10, 12))
        m[2:5, 3:7] = 1
        assert get_xyxy_from_mask(m) == (3, 2, 6, 4)


class TestRotationBank:
    def test_bank_spread(self):
        from scorp_tpu.pipeline.graphic import get_incremental_rotation_matrices
        rots = get_incremental_rotation_matrices(8, np.pi / 3, np.pi / 3)
        assert rots.shape == (8, 3, 3)
        np.testing.assert_allclose(
            np.einsum("nij,nkj->nik", rots, rots),
            np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5,
        )
        # pairwise geodesic angles reasonably large
        traces = np.einsum("kab,mab->km", rots, rots)
        angles = np.arccos(np.clip((traces - 1) / 2, -1, 1))
        np.fill_diagonal(angles, np.pi)
        assert angles.min() > 0.5
