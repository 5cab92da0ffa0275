"""Auxiliary subsystem tests: mesh extraction (TSDF + surface nets), camera
paths, network-GUI protocol framing, offline segmentation backend."""

import json
import os
import socket
import threading

import numpy as np
import pytest

from scorp_tpu.core.camera import fov2focal
from scorp_tpu.scene.cameras import Camera
from tests.synth import orbit_pose


def make_cam(angle, radius=3.0, size=64, fov=0.9, tmp_img=None):
    R, T = orbit_pose(angle, radius=radius, height=0.0)
    return Camera(0, R, T, fov, fov, (size, size), tmp_img or "/dev/null",
                  image_name=f"c{angle:.2f}")


class TestMesh:
    def test_sphere_extraction(self):
        """Analytic sphere depth maps -> mesh vertices near the radius."""
        from scorp_tpu.pipeline.mesh import GaussianExtractor

        r_sphere = 0.8
        size = 64

        def render_fn(cam):
            cj = cam.to_jax()
            w = h = size
            fx = w / (2 * float(cj.tanfovx))
            fy = h / (2 * float(cj.tanfovy))
            c2w = np.linalg.inv(np.asarray(cj.viewmatrix).T)
            ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
            dirs = np.stack([(xs - w / 2 + 0.5) / fx, (ys - h / 2 + 0.5) / fy,
                             np.ones((h, w))], -1)
            dirs_w = dirs @ c2w[:3, :3].T
            o = c2w[:3, 3]
            # ray-sphere intersection |o + t d| = r
            b = 2 * (dirs_w @ o)
            a = (dirs_w**2).sum(-1)
            c = (o @ o) - r_sphere**2
            disc = b**2 - 4 * a * c
            t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
            depth = np.where(t > 0, t * dirs[..., 2] * np.linalg.norm(dirs_w, axis=-1)
                             / np.linalg.norm(dirs, axis=-1), 0.0)
            # view z = t * (unit view dir z) -- dirs has z=1 per unit of t in
            # view space when dirs_w is the same length; simpler: view z of hit
            hit = o + t[..., None] * dirs_w
            view = np.concatenate([hit, np.ones((h, w, 1))], -1) @ np.asarray(cj.viewmatrix)
            depth = np.where(t > 0, view[..., 2], 0.0)
            return {
                "render": np.full((3, h, w), 0.5, np.float32),
                "render_depth": depth[None].astype(np.float32),
            }

        cams = [make_cam(a, radius=3.0, size=size) for a in np.linspace(0, 2 * np.pi, 12,
                                                                        endpoint=False)]
        ex = GaussianExtractor(render_fn, cams)
        verts, faces, colors = ex.extract_mesh_bounded(
            np.zeros(3), 1.2, voxel_size=0.05, sdf_trunc=0.15, depth_trunc=5.0,
            max_resolution=64,
        )
        assert len(verts) > 100
        assert len(faces) > 100
        radii = np.linalg.norm(verts, axis=1)
        # most vertices near the sphere surface
        assert np.median(np.abs(radii - 0.8)) < 0.06, np.median(radii)

    def test_marching_cubes_topology(self):
        """Generated MC tables: watertight, correct Euler characteristic,
        outward normals, exact edge-crossing vertices — including the
        adversarial all-ambiguous binary field."""
        from scorp_tpu.pipeline.marching_cubes import marching_cubes

        def watertight(f):
            de = {}
            for tri in f:
                for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
                    de[(a, b)] = de.get((a, b), 0) + 1
            ok = all(n == 1 for n in de.values()) and all(
                (b, a) in de for (a, b) in de
            )
            return ok, len(de) // 2

        n = 32
        g = (np.arange(n) + 0.5) / n * 3.2 - 1.6
        x, y, z = np.meshgrid(g, g, g, indexing="ij")
        w = np.ones((n, n, n))

        sph = np.sqrt(x**2 + y**2 + z**2) - 1.0
        v, f, _ = marching_cubes(sph, w, np.full(3, -1.6), 3.2 / n)
        ok, e = watertight(f)
        assert ok and len(v) - e + len(f) == 2  # sphere: Euler 2
        r = np.linalg.norm(v, axis=1)
        assert r.min() > 0.98 and r.max() < 1.02
        nrm = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        cen = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3
        assert ((nrm * cen).sum(1) > 0).all()  # normals outward

        tor = np.sqrt((np.sqrt(x**2 + y**2) - 1.0) ** 2 + z**2) - 0.4
        v, f, _ = marching_cubes(tor, w, np.full(3, -1.6), 3.2 / n)
        ok, e = watertight(f)
        assert ok and len(v) - e + len(f) == 0  # torus: Euler 0

        # worst case: random binary field exercises every ambiguous config
        rng = np.random.default_rng(3)
        b = np.where(rng.normal(size=(n, n, n)) > 0, 1.0, -1.0)
        b[[0, -1], :, :] = 1.0
        b[:, [0, -1], :] = 1.0
        b[:, :, [0, -1]] = 1.0
        v, f, _ = marching_cubes(b, w, np.zeros(3), 1.0)
        ok, _ = watertight(f)
        assert ok

        # unobserved voxels masked like surface nets
        w2 = w.copy()
        w2[:5] = 0.0
        v, f, _ = marching_cubes(sph, w2, np.full(3, -1.6), 3.2 / n)
        assert len(f) > 0 and (v[:, 0] > -1.6 + 4 * 3.2 / n).all()

    def test_post_process_mesh_removes_floaters(self):
        """Reference post_process_mesh (gs2dgs/utils/mesh_utils.py:22-42):
        small disconnected triangle clusters (< the 50-triangle floor) are
        removed, unreferenced vertices dropped, faces remapped."""
        from scorp_tpu.pipeline.mesh import post_process_mesh

        # main component: a (G+1)x(G+1) grid sheet -> 2*G*G triangles
        G = 8
        xs, ys = np.meshgrid(np.arange(G + 1), np.arange(G + 1), indexing="ij")
        grid_verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)

        def vid(i, j):
            return i * (G + 1) + j

        main_faces = []
        for i in range(G):
            for j in range(G):
                main_faces.append([vid(i, j), vid(i + 1, j), vid(i, j + 1)])
                main_faces.append([vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)])
        main_faces = np.asarray(main_faces)
        assert len(main_faces) == 2 * G * G  # 128 >= 50-triangle floor

        # floaters: 3 disconnected tetrahedra (4 triangles each, far away)
        verts = [grid_verts.astype(float)]
        faces = [main_faces]
        base = len(grid_verts)
        for k in range(3):
            off = np.array([100.0 + 10 * k, 0, 0])
            tet = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]) + off
            verts.append(tet)
            faces.append(base + np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3],
                                          [1, 2, 3]]))
            base += 4
        # plus one degenerate triangle inside the main sheet
        faces.append(np.array([[vid(0, 0), vid(0, 0), vid(0, 1)]]))
        verts = np.concatenate(verts)
        faces = np.concatenate(faces)
        colors = np.linspace(0, 1, len(verts))[:, None].repeat(3, 1)

        pv, pf, pc = post_process_mesh(verts, faces, colors, cluster_to_keep=1000)
        assert len(pf) == len(main_faces)           # floaters + degenerate gone
        assert len(pv) == len(grid_verts)           # tet vertices unreferenced
        assert pf.min() >= 0 and pf.max() < len(pv)  # faces remapped in range
        # surviving geometry is exactly the sheet (z == 0, x within grid)
        assert np.abs(pv[:, 2]).max() == 0.0 and pv[:, 0].max() <= G
        # colors follow the kept vertices
        np.testing.assert_allclose(pc, colors[: len(grid_verts)])

        # keeping only the largest cluster is the explicit-knob path
        pv1, pf1, _ = post_process_mesh(verts, faces, colors, cluster_to_keep=1)
        assert len(pf1) == len(main_faces)

    def test_mesh_ply_roundtrip(self, tmp_path):
        from scorp_tpu.pipeline.mesh import save_mesh_ply

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
        faces = np.array([[0, 1, 2]])
        path = str(tmp_path / "m.ply")
        save_mesh_ply(path, verts, faces, np.ones((3, 3)) * 0.5)
        data = open(path, "rb").read()
        assert b"element vertex 3" in data
        assert b"element face 1" in data


class TestRenderPaths:
    def test_ellipse_path(self):
        from scorp_tpu.pipeline.render_paths import generate_ellipse_path

        cams = [make_cam(a) for a in np.linspace(0, 2 * np.pi, 10, endpoint=False)]
        path = generate_ellipse_path(cams, n_frames=24)
        assert len(path) == 24
        centers = np.stack([c.camera_center for c in path])
        # path stays near the training orbit radius
        assert 1.5 < np.linalg.norm(centers, axis=1).mean() < 4.5
        # every camera is a valid MiniCam convertible to a device camera
        cj = path[0].to_jax()
        assert cj.width == 64

    def test_video_export(self, tmp_path):
        import cv2
        from scorp_tpu.pipeline.render_paths import create_videos, save_img_u8

        frame_dir = tmp_path / "frames"
        frame_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(5):
            save_img_u8(rng.uniform(size=(3, 32, 32)), str(frame_dir / f"f_{i:03d}.png"))
        out = create_videos(str(frame_dir), str(tmp_path / "out.mp4"), fps=5)
        assert os.path.getsize(out) > 0


class TestNetworkGUI:
    def test_protocol_roundtrip(self):
        from scorp_tpu.viewer import NetworkGUI

        gui = NetworkGUI()
        gui.init("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]

        payload = {
            "resolution_x": 32, "resolution_y": 24, "train": 1,
            "fov_y": 0.8, "fov_x": 0.9, "z_near": 0.01, "z_far": 100.0,
            "shs_python": 0, "rot_scale_python": 0, "keep_alive": 1,
            "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        received = {}

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            msg = json.dumps(payload).encode()
            s.sendall(len(msg).to_bytes(4, "little") + msg)
            img = b""
            # read image + 4-byte verify length + "ok" so the server's send
            # completes before we close (avoids a flaky BrokenPipe)
            expected = 32 * 24 * 3 + 4 + 2
            try:
                while len(img) < expected:
                    chunk = s.recv(65536)
                    if not chunk:
                        break
                    img += chunk
                received["image_len"] = len(img)
            finally:
                s.close()

        t = threading.Thread(target=client, daemon=True)
        t.start()
        import time
        for _ in range(200):
            gui.try_connect()
            if gui.conn is not None:
                break
            time.sleep(0.02)
        assert gui.conn is not None, "viewer client never connected"
        cam, do_training, *_ = gui.receive()
        assert cam is not None and cam.image_width == 32
        assert do_training
        img = NetworkGUI.encode_image(np.zeros((3, 24, 32), np.float32))
        gui.send(img, "ok")
        t.join(timeout=10)
        # client may also slurp the trailing 4-byte length + verify string
        assert received.get("image_len", 0) >= 32 * 24 * 3
        gui.conn.close()
        gui.listener.close()

    def test_gui_tick_serves_render_and_releases(self):
        """Drive one full trainer-side service round through gui_tick: the
        client requests a frame (train=1, keep_alive=1), gets the rendered
        bytes + verify string, and the loop releases back to training."""
        from scorp_tpu.viewer import NetworkGUI
        from scorp_tpu.viewer.network_gui import gui_tick

        gui = NetworkGUI()
        gui.init("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]
        w, h = 16, 8
        payload = {
            "resolution_x": w, "resolution_y": h, "train": 1,
            "fov_y": 0.8, "fov_x": 0.9, "z_near": 0.01, "z_far": 100.0,
            "shs_python": 0, "rot_scale_python": 0, "keep_alive": 1,
            "scaling_modifier": 1.5,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        received = {}

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            msg = json.dumps(payload).encode()
            s.sendall(len(msg).to_bytes(4, "little") + msg)
            buf = b""
            expected = w * h * 3 + 4 + 3
            while len(buf) < expected:
                chunk = s.recv(65536)
                if not chunk:
                    break
                buf += chunk
            received["buf"] = buf
            s.close()

        t = threading.Thread(target=client, daemon=True)
        t.start()

        calls = {}

        def render_fn(minicam, smod):
            calls["res"] = (minicam.image_width, minicam.image_height)
            calls["smod"] = smod
            img = np.zeros((3, h, w), np.float32)
            img[0] = 1.0  # red frame
            return img

        import time
        deadline = time.time() + 10
        # iteration < max_iterations and train=1 -> tick must return
        while time.time() < deadline:
            gui_tick(gui, render_fn, "src", iteration=5, max_iterations=100)
            if calls:
                break
            time.sleep(0.02)
        t.join(timeout=10)
        assert calls.get("res") == (w, h)
        assert calls.get("smod") == 1.5
        buf = received["buf"]
        assert len(buf) == w * h * 3 + 4 + 3
        img = np.frombuffer(buf[: w * h * 3], np.uint8).reshape(h, w, 3)
        assert img[..., 0].min() == 255 and img[..., 1].max() == 0
        assert buf[w * h * 3:] == (3).to_bytes(4, "little") + b"src"
        gui.conn.close()
        gui.listener.close()


class TestOfflineSegmentation:
    def test_maskdir_backend(self, tmp_path):
        import cv2
        from scorp_tpu.apps.segmentation_2d import get_mask2d
        from scorp_tpu.pipeline.perception import BoxfileDetector, MaskdirSegmenter

        # synthetic frames + offline masks
        img_dir = tmp_path / "images"
        mask_dir = tmp_path / "premasks" / "cup"
        img_dir.mkdir()
        mask_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        paths = []
        for i in range(4):
            name = f"img_{i:03d}"
            frame = rng.integers(0, 255, (32, 48, 3), np.uint8)
            cv2.imwrite(str(img_dir / f"{name}.png"), frame)
            mask = np.zeros((32, 48), np.uint8)
            mask[8:24, 12 + i:30 + i] = 255
            cv2.imwrite(str(mask_dir / f"{name}.png"), mask)
            paths.append(str(img_dir / f"{name}.png"))

        get_mask2d(
            prompt_list=["cup"], data_dir=str(tmp_path),
            image_path_list=paths, first_image_name="img_001",
            detector=BoxfileDetector({"cup": [0.5, 0.5, 0.6, 0.6]}),
            segmenter=MaskdirSegmenter(str(tmp_path / "premasks"), ["cup"]),
        )
        out_dir = tmp_path / "masked_image_rgba" / "cup"
        files = sorted(os.listdir(out_dir))
        assert len(files) == 4
        rgba = cv2.imread(str(out_dir / files[0]), cv2.IMREAD_UNCHANGED)
        assert rgba.shape[2] == 4
        assert (rgba[:, :, 3] > 0).sum() > 50
        assert os.path.exists(tmp_path / "masked_image_rgba" / "masked" / files[0])


class TestPerceptualProxy:
    def test_lpips_proxy_orders_degradations(self):
        import jax.numpy as jnp
        from scorp_tpu.ops.perceptual import lpips_proxy

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)).astype(np.float32))
        d0 = float(lpips_proxy(img, img))
        small = img + 0.02 * jnp.asarray(rng.normal(size=(3, 64, 64)), jnp.float32)
        big = img + 0.3 * jnp.asarray(rng.normal(size=(3, 64, 64)), jnp.float32)
        blur = jnp.asarray(
            np.stack([np.roll(np.asarray(img[c]), 3, axis=1) for c in range(3)])
        )
        d_small = float(lpips_proxy(img, jnp.clip(small, 0, 1)))
        d_big = float(lpips_proxy(img, jnp.clip(big, 0, 1)))
        d_shift = float(lpips_proxy(img, blur))
        assert d0 < 1e-6
        assert d0 < d_small < d_big
        assert d_shift > d_small  # structural misalignment > small noise
        # determinism across calls (fixed seeded filters)
        assert d_big == float(lpips_proxy(img, jnp.clip(big, 0, 1)))

    def _random_lpips_weights(self, seed=7, scale=0.2):
        """Fixture LPIPS-VGG weights: true architecture shapes, random values
        (no pretrained weights ship in this container)."""
        from scorp_tpu.ops.perceptual import _LPIPS_TAP_CHANNELS, _VGG_CHANNELS

        rng = np.random.default_rng(seed)
        w = {}
        for i, (cout, cin) in enumerate(_VGG_CHANNELS):
            w[f"conv{i}_w"] = (rng.normal(0, scale / np.sqrt(cin * 9),
                                          (cout, cin, 3, 3))).astype(np.float32)
            w[f"conv{i}_b"] = rng.uniform(0, 0.1, cout).astype(np.float32)
        for j, c in enumerate(_LPIPS_TAP_CHANNELS):
            w[f"lin{j}"] = rng.uniform(0, 1, c).astype(np.float32)
        return w

    def _torch_lpips_reference(self, w, a, b):
        """Independent torch implementation of the LPIPS-VGG graph (the
        `lpips` package's computation: ScalingLayer, VGG-16 config-D taps at
        relu{1_2,2_2,3_3,4_3,5_3}, unit normalization, linear heads)."""
        import torch
        import torch.nn.functional as F
        from scorp_tpu.ops.perceptual import (_LPIPS_SCALE, _LPIPS_SHIFT,
                                              _VGG_POOL_BEFORE, _VGG_TAPS)

        def feats(img):
            x = torch.from_numpy(img[None] * 2 - 1)
            x = (x - torch.from_numpy(_LPIPS_SHIFT)[None, :, None, None]) / \
                torch.from_numpy(_LPIPS_SCALE)[None, :, None, None]
            taps = []
            for i in range(13):
                if i in _VGG_POOL_BEFORE:
                    x = F.max_pool2d(x, 2)
                x = F.relu(F.conv2d(x, torch.from_numpy(w[f"conv{i}_w"]),
                                    torch.from_numpy(w[f"conv{i}_b"]),
                                    padding=1))
                if i in _VGG_TAPS:
                    taps.append(x)
            return taps

        total = 0.0
        with torch.no_grad():
            for j, (fx, fy) in enumerate(zip(feats(a), feats(b))):
                nx = fx / (fx.square().sum(1, keepdim=True) + 1e-10).sqrt()
                ny = fy / (fy.square().sum(1, keepdim=True) + 1e-10).sqrt()
                lin = torch.from_numpy(w[f"lin{j}"])[None, :, None, None]
                total += float((lin * (nx - ny) ** 2).sum(1).mean())
        return total

    def test_lpips_vgg_matches_torch_reference(self):
        """JAX LPIPS == an independent torch implementation of the same graph
        on fixture weights (weights themselves are environment-blocked)."""
        from scorp_tpu.ops.perceptual import lpips

        w = self._random_lpips_weights()
        rng = np.random.default_rng(3)
        a = rng.uniform(0, 1, (3, 48, 64)).astype(np.float32)
        b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
        ours = float(lpips(a, b, w))
        ref = self._torch_lpips_reference(w, a, b)
        assert abs(ours - ref) < 1e-4 * max(1.0, abs(ref))
        assert float(lpips(a, a, w)) < 1e-6

    def test_lpips_weight_loading_paths(self, tmp_path):
        """npz round-trip + torch state_dict (torchvision features.* naming
        merged with lpips lin heads) both load; metrics harness reports
        `lpips` (not `lpips_proxy`) when a weight file is supplied."""
        import torch
        from PIL import Image as PILImage
        from scorp_tpu.apps.metrics import evaluate_dirs
        from scorp_tpu.ops.perceptual import (_TORCHVISION_CONV_IDX, lpips,
                                              load_lpips_weights)

        w = self._random_lpips_weights()
        npz_path = str(tmp_path / "lpips_vgg.npz")
        np.savez(npz_path, **w)
        w_npz = load_lpips_weights(npz_path)

        state = {}
        for i, tv in enumerate(_TORCHVISION_CONV_IDX):
            state[f"features.{tv}.weight"] = torch.from_numpy(w[f"conv{i}_w"])
            state[f"features.{tv}.bias"] = torch.from_numpy(w[f"conv{i}_b"])
        for j in range(5):
            state[f"lin{j}.model.1.weight"] = torch.from_numpy(
                w[f"lin{j}"].reshape(1, -1, 1, 1))
        pt_path = str(tmp_path / "lpips_vgg.pth")
        torch.save(state, pt_path)
        w_pt = load_lpips_weights(pt_path)

        rng = np.random.default_rng(5)
        a = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        b = np.clip(a + 0.2 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
        v_npz = float(lpips(a, b, w_npz))
        v_pt = float(lpips(a, b, w_pt))
        assert abs(v_npz - v_pt) < 1e-6 and v_npz > 0

        for d in ("pred", "gt"):
            (tmp_path / d).mkdir()
        img = rng.integers(0, 255, (24, 32, 3), np.uint8)
        PILImage.fromarray(img).save(tmp_path / "gt" / "im0.png")
        noisy = np.clip(img + rng.integers(-30, 30, img.shape), 0, 255)
        PILImage.fromarray(noisy.astype(np.uint8)).save(tmp_path / "pred" / "im0.png")
        res = evaluate_dirs(str(tmp_path / "pred"), str(tmp_path / "gt"),
                            lpips_weights=npz_path)
        assert res["lpips_backend"] == "lpips"
        assert res["lpips"] is not None and res["lpips"] > 0

    def test_metrics_harness_uses_proxy(self, tmp_path):
        from PIL import Image as PILImage
        from scorp_tpu.apps.metrics import evaluate_dirs

        rng = np.random.default_rng(1)
        for d in ("pred", "gt"):
            (tmp_path / d).mkdir()
        for i in range(2):
            a = rng.integers(0, 255, (24, 32, 3), np.uint8)
            PILImage.fromarray(a).save(tmp_path / "gt" / f"im{i}.png")
            noisy = np.clip(a + rng.integers(-20, 20, a.shape), 0, 255).astype(np.uint8)
            PILImage.fromarray(noisy).save(tmp_path / "pred" / f"im{i}.png")
        res = evaluate_dirs(str(tmp_path / "pred"), str(tmp_path / "gt"))
        assert res["lpips_backend"] == "lpips_proxy"
        assert res["lpips_proxy"] is not None and res["lpips_proxy"] > 0


class TestGtDeviceCache:
    def test_caches_by_camera_and_budget(self):
        import numpy as np
        import jax.numpy as jnp

        from scorp_tpu.apps.train_3dgs import GtDeviceCache
        from scorp_tpu.scene.cameras import GroundTruth

        class FakeCam:
            def __init__(self, w, h):
                self.image_width = w
                self.image_height = h
                self.depth_cam_path = None

        cams = [FakeCam(8, 6), FakeCam(8, 6)]
        cache = GtDeviceCache(cams)
        assert cache.enabled
        img = np.random.default_rng(0).uniform(size=(3, 6, 8)).astype(np.float32)
        gt = GroundTruth(image=img, alpha=None, depth_cam=None, depth_est=None)
        a1 = cache.get(cams[0], gt)
        a2 = cache.get(cams[0], gt)
        assert a1[0] is a2[0]  # device array reused, no re-upload
        assert float(jnp.abs(a1[1]).max()) == 0.0  # shared zero depth map
        # distinct camera -> distinct entry
        b1 = cache.get(cams[1], gt)
        assert b1[0] is not a1[0]
        # over-budget -> caching disabled but still functional
        small = GtDeviceCache(cams, budget_bytes=10)
        assert not small.enabled
        c1 = small.get(cams[0], gt)
        c2 = small.get(cams[0], gt)
        assert c1[0] is not c2[0]
        np.testing.assert_allclose(np.asarray(c1[0]), img)
