"""End-to-end pipeline tests over a synthetic COLMAP dataset: Scene loading,
the full trainer app (with densification), checkpoint/PLY round-trips, and
truncate_opacity."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from tests.synth import build_dataset, make_gt_gaussians


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    g, poses = build_dataset(root, n_views=8, width=64, height=64, n_gauss=48)
    return root, g, poses


def model_args(root, model_path, eval_mode=True):
    return SimpleNamespace(
        sh_degree=3, source_path=root, model_path=model_path, images="images",
        resolution=-1, white_background=False, data_device="cpu", eval=eval_mode,
        preload=False, split_yml_name="split.yml",
    )


class TestScene:
    def test_colmap_scene_loads(self, dataset, tmp_path):
        from scorp_tpu.scene import Scene

        root, g, poses = dataset
        scene = Scene(model_args(root, str(tmp_path / "model")), load_gaussians=False)
        assert len(scene.get_train_cameras()) == 6
        assert len(scene.get_test_cameras()) == 2
        assert scene.cameras_extent > 0
        assert os.path.exists(str(tmp_path / "model" / "input.ply"))
        assert os.path.exists(str(tmp_path / "model" / "cameras.json"))
        cam = scene.get_train_cameras()[0]
        gt = cam.gt()
        assert gt.image.shape == (3, 64, 64)
        assert gt.image.max() <= 1.0

    def test_camera_matrices_match_render(self, dataset, tmp_path):
        # scene-loaded camera must reproduce the synthetic render exactly
        import jax.numpy as jnp
        from scorp_tpu.scene import Scene
        from scorp_tpu.render import render
        from scorp_tpu.train import from_gaussian_data

        root, g, poses = dataset
        scene = Scene(model_args(root, str(tmp_path / "m2")), load_gaussians=False)
        state = from_gaussian_data(g)
        for cam in scene.get_train_cameras()[:2]:
            out = render(cam.to_jax(), state, np.zeros(3, np.float32))
            img = np.clip(np.asarray(out["render"]), 0, 1)
            gt = cam.gt().image
            # images were saved as u8, so tolerance is quantization-limited
            assert np.abs(img - gt).max() < 2.5 / 255.0, cam.image_name


class TestTrainerApp:
    def test_short_training_run(self, dataset, tmp_path):
        from scorp_tpu.apps.train_3dgs import training
        from scorp_tpu.config import OptimizationParams, PipelineParams
        from scorp_tpu.train import to_gaussian_data
        from scorp_tpu.core.plyio import load_gaussian_ply

        root, g, poses = dataset
        mp = str(tmp_path / "model")
        opt = OptimizationParams(
            iterations=220, densify_from_iter=40, densification_interval=60,
            densify_until_iter=200, opacity_reset_interval=10_000,
            depth_from_iter=10**9, opacity_cull=0.005,
        )
        scene, state, adam = training(
            model_args(root, mp), opt, PipelineParams(),
            testing_iterations=[210], saving_iterations=[220],
            checkpoint_iterations=[220], checkpoint=None, debug_from=-1, quiet=True,
        )
        # eval PSNR on test cams must beat a trivial baseline
        from scorp_tpu.apps.train_3dgs import evaluate
        from scorp_tpu.render import default_raster_config

        res = evaluate(scene, state, 0, np.zeros(3, np.float32),
                       default_raster_config(state.capacity), 220, quiet=True)
        assert res["test"][1] > 12.0, res  # 220 iters from a noisy cloud

        ply = os.path.join(mp, "point_cloud", "iteration_220", "point_cloud.ply")
        assert os.path.exists(ply)
        saved = load_gaussian_ply(ply, max_sh_degree=3)
        assert saved.n == int(state.num_alive())

        # checkpoint round-trip
        from scorp_tpu.apps.train_3dgs import load_checkpoint
        st2, adam2, it = load_checkpoint(os.path.join(mp, "chkpnt220.pth"))
        assert it == 220
        np.testing.assert_array_equal(np.asarray(st2.alive), np.asarray(state.alive))


class TestTruncate:
    def test_truncate_opacity(self, tmp_path):
        from scorp_tpu.apps.truncate_opacity import main as truncate_main
        from scorp_tpu.core.plyio import load_gaussian_ply, save_gaussian_ply

        g = make_gt_gaussians(n=32, seed=3)
        g.opacity[:16] = -5.0  # sigmoid ~ 0.0067 < 0.1 -> dropped
        gen = tmp_path / "generated"
        gen.mkdir()
        save_gaussian_ply(str(gen / "obj.ply"), g)
        truncate_main(["-m", str(tmp_path), "--threshold", "0.1"])
        out = load_gaussian_ply(str(gen / "obj.ply"))
        assert out.n == 16
        assert os.path.exists(str(gen / "obj.ply.bak"))
        bak = load_gaussian_ply(str(gen / "obj.ply.bak"))
        assert bak.n == 32
