"""Unit tests for core math + I/O: SH, quaternions, camera, PLY, COLMAP."""

import numpy as np
import jax.numpy as jnp
import pytest

from scorp_tpu.core import sh, quat, camera, plyio, colmap


class TestSH:
    def test_degree0_constant(self):
        coeffs = np.zeros((5, 1, 3), np.float32)
        coeffs[:, 0, :] = 2.0
        dirs = np.random.default_rng(0).normal(size=(5, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, jnp.asarray(coeffs), jnp.asarray(dirs))
        np.testing.assert_allclose(out, 2.0 * sh.C0, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = np.random.default_rng(1).uniform(size=(10, 3))
        back = sh.sh_to_rgb(sh.rgb_to_sh(rgb))
        np.testing.assert_allclose(back, rgb, rtol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3])
    def test_rotation_invariance_of_dc(self, deg):
        # DC band must be direction-independent regardless of degree
        rng = np.random.default_rng(2)
        k = sh.num_sh_bands(deg)
        coeffs = np.zeros((1, k, 3), np.float32)
        coeffs[0, 0] = [1.0, -0.5, 0.25]
        d1 = rng.normal(size=(1, 3)); d1 /= np.linalg.norm(d1)
        d2 = rng.normal(size=(1, 3)); d2 /= np.linalg.norm(d2)
        o1 = sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(d1))
        o2 = sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(d2))
        np.testing.assert_allclose(o1, o2, rtol=1e-6)

    def test_sh_integral_orthonormality(self):
        # Monte-Carlo check: mean over uniform sphere of (basis_i)^2 = 1/(4π)
        rng = np.random.default_rng(3)
        dirs = rng.normal(size=(60_000, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        for band in range(16):
            coeffs = np.zeros((1, 16, 1), np.float32)
            coeffs[0, band, 0] = 1.0
            vals = np.asarray(
                sh.eval_sh(3, jnp.asarray(np.repeat(coeffs, len(dirs), 0)), jnp.asarray(dirs))
            )[:, 0]
            integral = (vals**2).mean() * 4 * np.pi
            assert abs(integral - 1.0) < 0.12, f"band {band}: {integral}"


class TestQuat:
    def test_identity(self):
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        np.testing.assert_allclose(quat.quat_to_rotmat(q)[0], np.eye(3), atol=1e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=(64, 4)).astype(np.float32)
        R = quat.quat_to_rotmat(jnp.asarray(q))
        q2 = quat.rotmat_to_quat(R)
        R2 = quat.quat_to_rotmat(q2)
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_rotation_properties(self):
        rng = np.random.default_rng(5)
        q = rng.normal(size=(32, 4)).astype(np.float32)
        R = np.asarray(quat.quat_to_rotmat(jnp.asarray(q)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_multiply_matches_matmul(self):
        rng = np.random.default_rng(6)
        a = rng.normal(size=(8, 4)).astype(np.float32)
        b = rng.normal(size=(8, 4)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        Rab = np.asarray(quat.quat_to_rotmat(quat.quat_multiply(jnp.asarray(a), jnp.asarray(b))))
        RaRb = np.einsum(
            "nij,njk->nik",
            np.asarray(quat.quat_to_rotmat(jnp.asarray(a))),
            np.asarray(quat.quat_to_rotmat(jnp.asarray(b))),
        )
        np.testing.assert_allclose(Rab, RaRb, atol=1e-5)

    def test_covariance_psd(self):
        rng = np.random.default_rng(7)
        s = np.abs(rng.normal(size=(16, 3))).astype(np.float32) + 0.1
        q = rng.normal(size=(16, 4)).astype(np.float32)
        cov6 = np.asarray(quat.covariance_from_scaling_rotation(jnp.asarray(s), 1.0, jnp.asarray(q)))
        for i in range(16):
            c = cov6[i]
            full = np.array([[c[0], c[1], c[2]], [c[1], c[3], c[4]], [c[2], c[4], c[5]]])
            assert np.all(np.linalg.eigvalsh(full) > 0)


class TestCamera:
    def test_world_view_roundtrip(self):
        rng = np.random.default_rng(8)
        qv = rng.normal(size=4); qv /= np.linalg.norm(qv)
        R_w2c = colmap.qvec2rotmat(qv)
        R = R_w2c.T  # reference convention: R is C2W
        T = rng.normal(size=3)
        w2c = camera.world_to_view(R, T)
        pt = rng.normal(size=3)
        expected = R_w2c @ pt + T
        got = (w2c @ np.append(pt, 1.0))[:3]
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_projection_center(self):
        cam = camera.look_at_camera(
            eye=[0, 0, -5], target=[0, 0, 0], up=[0, 1, 0],
            fovx=1.0, fovy=1.0, width=64, height=64,
        )
        p = jnp.array([[0.0, 0.0, 0.0, 1.0]])
        clip = p @ cam.projmatrix
        ndc = np.asarray(clip[0, :3] / clip[0, 3])
        assert abs(ndc[0]) < 1e-5 and abs(ndc[1]) < 1e-5
        view = np.asarray(p @ cam.viewmatrix)[0]
        assert abs(view[2] - 5.0) < 1e-5  # +z forward, 5 units away

    def test_camera_center(self):
        cam = camera.look_at_camera(
            eye=[1.0, 2.0, -5.0], target=[0, 0, 0], up=[0, 1, 0],
            fovx=1.0, fovy=1.0, width=32, height=32,
        )
        np.testing.assert_allclose(np.asarray(cam.campos), [1.0, 2.0, -5.0], atol=1e-5)

    def test_offcenter_projection_sign(self):
        cam = camera.look_at_camera(
            eye=[0, 0, -5], target=[0, 0, 0], up=[0, -1, 0],
            fovx=1.2, fovy=1.2, width=64, height=64,
        )
        # a point to the camera's right should land at ndc x > 0
        p = jnp.array([[1.0, 0.0, 0.0, 1.0]])
        clip = p @ cam.projmatrix
        ndc = np.asarray(clip[0, :3] / clip[0, 3])
        assert ndc[0] > 0


class TestPly:
    def test_gaussian_roundtrip(self, tmp_path):
        rng = np.random.default_rng(9)
        n = 37
        g = plyio.GaussianData(
            xyz=rng.normal(size=(n, 3)).astype(np.float32),
            f_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
            f_rest=rng.normal(size=(n, 15, 3)).astype(np.float32),
            opacity=rng.normal(size=(n, 1)).astype(np.float32),
            scaling=rng.normal(size=(n, 3)).astype(np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
        )
        path = str(tmp_path / "g.ply")
        plyio.save_gaussian_ply(path, g)
        g2 = plyio.load_gaussian_ply(path, max_sh_degree=3)
        np.testing.assert_array_equal(g.xyz, g2.xyz)
        np.testing.assert_array_equal(g.f_dc, g2.f_dc)
        np.testing.assert_array_equal(g.f_rest, g2.f_rest)
        np.testing.assert_array_equal(g.opacity, g2.opacity)
        np.testing.assert_array_equal(g.scaling, g2.scaling)
        np.testing.assert_array_equal(g.rotation, g2.rotation)

    def test_header_schema_matches_reference(self, tmp_path):
        n = 3
        g = plyio.GaussianData(
            xyz=np.zeros((n, 3), np.float32),
            f_dc=np.zeros((n, 1, 3), np.float32),
            f_rest=np.zeros((n, 15, 3), np.float32),
            opacity=np.zeros((n, 1), np.float32),
            scaling=np.zeros((n, 3), np.float32),
            rotation=np.zeros((n, 4), np.float32),
        )
        path = str(tmp_path / "g.ply")
        plyio.save_gaussian_ply(path, g)
        header = open(path, "rb").read().split(b"end_header")[0].decode()
        names = [ln.split()[-1] for ln in header.splitlines() if ln.startswith("property")]
        expected = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(45)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert names == expected
        assert "format binary_little_endian 1.0" in header
        assert all("property float " in ln for ln in header.splitlines() if ln.startswith("property"))

    def test_frest_channel_major_layout(self, tmp_path):
        # f_rest_j on disk must be channel-major: j = c*(K-1) + k
        n = 1
        g = plyio.GaussianData(
            xyz=np.zeros((n, 3), np.float32),
            f_dc=np.zeros((n, 1, 3), np.float32),
            f_rest=np.arange(45, dtype=np.float32).reshape(1, 15, 3),
            opacity=np.zeros((n, 1), np.float32),
            scaling=np.zeros((n, 3), np.float32),
            rotation=np.zeros((n, 4), np.float32),
        )
        path = str(tmp_path / "g.ply")
        plyio.save_gaussian_ply(path, g)
        props = plyio.read_ply(path)
        # coefficient k of channel c lives at f_rest_{c*15+k}; memory value = 3k+c
        for c in range(3):
            for k in range(15):
                assert props[f"f_rest_{c * 15 + k}"][0] == 3 * k + c

    def test_point_cloud_roundtrip(self, tmp_path):
        rng = np.random.default_rng(10)
        pts = rng.normal(size=(20, 3))
        colors = rng.uniform(size=(20, 3))
        path = str(tmp_path / "pc.ply")
        plyio.save_point_cloud_ply(path, pts, colors)
        p2, c2, n2 = plyio.load_point_cloud_ply(path)
        np.testing.assert_allclose(p2, pts, atol=1e-5)
        np.testing.assert_allclose(c2, colors, atol=1 / 255.0)


class TestColmap:
    def test_binary_roundtrip(self, tmp_path):
        rng = np.random.default_rng(11)
        cams = {
            1: colmap.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0])),
        }
        qv = rng.normal(size=4); qv /= np.linalg.norm(qv)
        imgs = {
            5: colmap.ColmapImage(
                5, qv, rng.normal(size=3), 1, "img_001.png",
                rng.uniform(size=(7, 2)) * 100, rng.integers(0, 10, size=7).astype(np.int64),
            )
        }
        xyz = rng.normal(size=(13, 3))
        rgb = rng.integers(0, 255, size=(13, 3)).astype(np.uint8)
        err = rng.uniform(size=(13, 1))

        colmap.write_intrinsics_binary(cams, str(tmp_path / "cameras.bin"))
        colmap.write_extrinsics_binary(imgs, str(tmp_path / "images.bin"))
        colmap.write_points3D_binary(xyz, rgb, err, str(tmp_path / "points3D.bin"))

        cams2 = colmap.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
        imgs2 = colmap.read_extrinsics_binary(str(tmp_path / "images.bin"))
        xyz2, rgb2, err2 = colmap.read_points3D_binary(str(tmp_path / "points3D.bin"))

        assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        np.testing.assert_allclose(imgs2[5].qvec, qv)
        assert imgs2[5].name == "img_001.png"
        np.testing.assert_allclose(imgs2[5].xys, imgs[5].xys)
        np.testing.assert_allclose(xyz2, xyz)
        np.testing.assert_array_equal(rgb2, rgb)

    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.default_rng(12)
        for _ in range(10):
            qv = rng.normal(size=4); qv /= np.linalg.norm(qv)
            if qv[0] < 0:
                qv = -qv
            R = colmap.qvec2rotmat(qv)
            np.testing.assert_allclose(colmap.rotmat2qvec(R), qv, atol=1e-6)


class TestKNN:
    def test_small_exact(self):
        from scorp_tpu.ops.knn import knn_mean_dist2
        rng = np.random.default_rng(13)
        pts = rng.normal(size=(257, 3)).astype(np.float32)
        got = np.asarray(knn_mean_dist2(pts))
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_multi_block(self):
        from scorp_tpu.ops.knn import knn_mean_dist2
        rng = np.random.default_rng(14)
        pts = rng.normal(size=(3000, 3)).astype(np.float32)
        got = np.asarray(knn_mean_dist2(pts))
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestLosses:
    def test_ssim_identical_images(self):
        from scorp_tpu.ops.losses import ssim
        rng = np.random.default_rng(15)
        img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
        assert float(ssim(img, img)) > 0.9999

    def test_ssim_matches_torch_reference(self):
        # cross-check against torch's conv2d-based implementation
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from math import exp as mexp
        from scorp_tpu.ops.losses import ssim

        rng = np.random.default_rng(16)
        a = rng.uniform(size=(3, 24, 24)).astype(np.float32)
        b = rng.uniform(size=(3, 24, 24)).astype(np.float32)

        def torch_ssim(img1, img2, window_size=11):
            sigma = 1.5
            g = torch.tensor([
                mexp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)
            ])
            g = (g / g.sum()).unsqueeze(1)
            win = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0).expand(3, 1, window_size, window_size)
            i1, i2 = img1.unsqueeze(0), img2.unsqueeze(0)
            mu1 = F.conv2d(i1, win, padding=window_size // 2, groups=3)
            mu2 = F.conv2d(i2, win, padding=window_size // 2, groups=3)
            mu1s, mu2s, mu12 = mu1**2, mu2**2, mu1 * mu2
            s1 = F.conv2d(i1 * i1, win, padding=5, groups=3) - mu1s
            s2 = F.conv2d(i2 * i2, win, padding=5, groups=3) - mu2s
            s12 = F.conv2d(i1 * i2, win, padding=5, groups=3) - mu12
            c1, c2 = 0.01**2, 0.03**2
            m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
            return m.mean().item()

        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
        assert abs(ours - theirs) < 1e-5

    def test_psnr(self):
        from scorp_tpu.ops.losses import psnr
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        np.testing.assert_allclose(float(psnr(a, b).mean()), 20.0, atol=1e-4)

    def test_isotropic(self):
        from scorp_tpu.ops.losses import isotropic_loss
        s = jnp.asarray([[1.0, 1.0, 1.0], [0.0, 1.0, 2.0]])
        np.testing.assert_allclose(float(isotropic_loss(s)), (0 + (1 + 0 + 1) / 3) / 2, atol=1e-6)
