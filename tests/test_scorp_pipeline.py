"""End-to-end SCORP stage tests on a synthetic scene: segmentation (gradient
voting), view selection, ICP + 9-DoF alignment, post-refinement and eval
rendering — the full stage-output directory contract of SURVEY.md §1."""

import os
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest
import yaml
from PIL import Image

from scorp_tpu.core.plyio import GaussianData, load_gaussian_ply, save_gaussian_ply
from scorp_tpu.core.quat import quat_to_rotmat
from scorp_tpu.ops.raster.xla import rasterize_naive
from scorp_tpu.core.camera import make_camera_jax
from tests.synth import build_dataset, make_gt_gaussians, orbit_pose


def model_args(root, model_path):
    return SimpleNamespace(
        sh_degree=3, source_path=root, model_path=model_path, images="images",
        resolution=-1, white_background=False, data_device="cpu", eval=True,
        preload=False, split_yml_name="split.yml",
    )


@pytest.fixture(scope="module")
def scorp_scene(tmp_path_factory):
    """Synthetic scene + a known 'object' (cluster of gaussians) + RGBA masks."""
    root = str(tmp_path_factory.mktemp("scorp"))
    model_path = os.path.join(root, "model")
    n_views, size = 8, 64
    g, poses = build_dataset(root, n_views=n_views, width=size, height=size, n_gauss=48)

    # designate an 'object': gaussians in a box around a chosen center
    center = g.xyz.mean(axis=0)
    d = np.linalg.norm(g.xyz - center, axis=1)
    obj_mask = d < np.quantile(d, 0.3)
    assert obj_mask.sum() >= 6

    # per-view RGBA object masks from the object-only render
    rgba_dir = os.path.join(root, "masked_image_rgba", "cup")
    os.makedirs(rgba_dir, exist_ok=True)
    g_obj = g.select(obj_mask)
    for i, (R_c2w, T_w2c) in enumerate(poses):
        cam = make_camera_jax(R_c2w, T_w2c, 0.9, 0.9, size, size)
        out = rasterize_naive(
            jnp.asarray(g_obj.xyz),
            jnp.asarray(1 / (1 + np.exp(-g_obj.opacity[:, 0]))),
            cam, jnp.zeros(3),
            shs=jnp.asarray(np.concatenate([g_obj.f_dc, g_obj.f_rest], 1)), sh_degree=3,
            scales=jnp.asarray(np.exp(g_obj.scaling)), quats=jnp.asarray(g_obj.rotation),
        )
        alpha = (np.asarray(out.alpha[0]) > 0.5).astype(np.uint8) * 255
        rgb = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
        rgba = np.dstack([rgb.transpose(1, 2, 0), alpha])
        Image.fromarray(rgba).save(os.path.join(rgba_dir, f"img_{i:03d}.png"))

    # the 'trained' reconstruction at iteration 7000 = the GT gaussians
    os.makedirs(model_path, exist_ok=True)
    save_gaussian_ply(
        os.path.join(model_path, "point_cloud", "iteration_7000", "point_cloud.ply"), g
    )
    with open(os.path.join(root, "description.yml"), "w") as f:
        yaml.safe_dump({
            "prompts": "cup", "ext": "png", "img_num": 3,
            "num_iterations": 2, "opt_shape_iterations": [1], "cam_list_interval": 2,
        }, f)
    return root, model_path, g, obj_mask, poses


class TestSegmentation3D:
    def test_gradient_voting_recovers_object(self, scorp_scene):
        from scorp_tpu.apps.segmentation_3dgs import mask3d

        root, model_path, g, obj_mask, poses = scorp_scene
        masks = mask3d(model_args(root, model_path), None, iteration=7000)
        got = masks[0]
        inter = (got & obj_mask).sum()
        union = (got | obj_mask).sum()
        iou = inter / union
        assert iou > 0.6, f"IoU {iou}"
        seg_dir = os.path.join(model_path, "gs_seg")
        assert os.path.exists(os.path.join(seg_dir, "cup.ply"))
        assert os.path.exists(os.path.join(seg_dir, "remained.ply"))
        seg = load_gaussian_ply(os.path.join(seg_dir, "cup.ply"), max_sh_degree=3)
        assert seg.n == got.sum()


class TestViewSelection:
    def test_selects_views(self, scorp_scene):
        from scorp_tpu.apps.view_selection import view_select

        root, model_path, g, obj_mask, poses = scorp_scene
        view_select(model_args(root, model_path))
        out_dir = os.path.join(model_path, "masked_image_rgba_selected", "cup")
        files = sorted(os.listdir(out_dir))
        assert 1 <= len(files) <= 3
        img = Image.open(os.path.join(out_dir, files[0]))
        assert img.size[0] * img.size[1] >= 10000  # upscaled crops


class TestICP:
    def test_recovers_rigid_transform(self):
        from scorp_tpu.pipeline.icp import best_icp_transform, registration_icp

        rng = np.random.default_rng(0)
        # an asymmetric rigid shape: three orthogonal rods of distinct lengths
        rods = [
            np.stack([np.linspace(0, 2.0, 200), np.zeros(200), np.zeros(200)], 1),
            np.stack([np.zeros(150), np.linspace(0, 1.2, 150), np.zeros(150)], 1),
            np.stack([np.zeros(100), np.zeros(100), np.linspace(0, 0.6, 100)], 1),
        ]
        target = (np.concatenate(rods) + rng.normal(0, 0.005, (450, 3))).astype(np.float32)
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q[None], jnp.float32)))[0]
        t = np.array([0.4, -0.3, 0.6])
        source = ((target - t) @ R).astype(np.float32)  # R @ source + t = target

        from scorp_tpu.assets import load_rotation_bank
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            bank = load_rotation_bank(d, 16)
        T = best_icp_transform(target, source, bank, threshold=0.2, max_iteration=200)
        aligned = source @ T[:3, :3].T + T[:3, 3]
        err = np.abs(aligned - target).mean()
        assert err < 0.02, err


class TestAlignment:
    def test_align_recovers_pose(self, scorp_scene):
        from scorp_tpu.apps.align_3dgs_clpe_9dof import align
        from scorp_tpu.pipeline.gs_transform import (
            gaussians_rotate, gaussians_scale, gaussians_translate,
        )

        root, model_path, g, obj_mask, poses = scorp_scene
        seg_path = os.path.join(model_path, "gs_seg", "cup.ply")
        assert os.path.exists(seg_path), "run segmentation test first"
        obj = load_gaussian_ply(seg_path, max_sh_degree=3)

        # build the 'generated proxy': SH0 copy, rigidly displaced + scaled
        proxy = GaussianData(
            xyz=obj.xyz.copy(), f_dc=obj.f_dc.copy(),
            f_rest=np.zeros((obj.n, 0, 3), np.float32),
            opacity=obj.opacity.copy(), scaling=obj.scaling.copy(),
            rotation=obj.rotation.copy(),
        )
        rng = np.random.default_rng(3)
        angle = 0.5
        Rz = np.array([
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1.0],
        ])
        gaussians_scale(proxy, 0.6)
        gaussians_rotate(proxy, Rz)
        gaussians_translate(proxy, np.array([0.8, -0.5, 0.4]))
        gen_dir = os.path.join(model_path, "generated")
        os.makedirs(gen_dir, exist_ok=True)
        save_gaussian_ply(os.path.join(gen_dir, "cup.ply"), proxy)

        rot_dir = os.path.join(root, "rotation_matrices")
        args = model_args(root, model_path)
        aligned = align(
            args, None, "cup", num_iterations=2, opt_12dof_iterations=[1],
            rotations_path=rot_dir, visual_match=False, matcher_backend="sift",
        )
        # centroid and spread must match the scene object after alignment
        c_err = np.linalg.norm(aligned.xyz.mean(0) - obj.xyz.mean(0))
        extent_obj = obj.xyz.std()
        assert c_err < 0.35 * extent_obj, (c_err, extent_obj)
        assert os.path.exists(os.path.join(model_path, "generated_aligned", "cup.ply"))


class TestPostRefine:
    def test_refine_and_render(self, scorp_scene, tmp_path):
        from scorp_tpu.apps.post_refine_gs import training as refine_training
        from scorp_tpu.apps.render_3dgs import render_images
        from scorp_tpu.config import OptimizationParams, PipelineParams
        from scorp_tpu.pipeline.views import merge_to_rgba

        root, model_path, g, obj_mask, poses = scorp_scene
        assert os.path.exists(os.path.join(model_path, "generated_aligned", "cup.ply"))

        # union-mask RGBA ground truth (masked_image_rgba/masked)
        masked_dir = os.path.join(root, "masked_image_rgba", "masked")
        os.makedirs(masked_dir, exist_ok=True)
        src_dir = os.path.join(root, "images")
        obj_dir = os.path.join(root, "masked_image_rgba", "cup")
        for name in os.listdir(src_dir):
            rgb = np.array(Image.open(os.path.join(src_dir, name)))
            alpha = np.array(Image.open(os.path.join(obj_dir, name)))[:, :, 3]
            Image.fromarray(merge_to_rgba(rgb, alpha)).save(os.path.join(masked_dir, name))

        args = model_args(root, model_path)
        args.sh_degree = 0
        args.images = os.path.join("masked_image_rgba", "masked")
        opt = OptimizationParams(iterations=40)
        refine_training(args, opt, PipelineParams(), quiet=True)
        refined = os.path.join(model_path, "refined_aligned")
        assert os.path.exists(os.path.join(refined, "cup.ply"))
        assert os.path.exists(os.path.join(refined, "refined_40.ply"))

        render_images(args, iteration=40)
        out_dir = os.path.join(model_path, "rendered_refined")
        files = os.listdir(out_dir)
        assert len(files) == 2  # two test cameras
        img = np.array(Image.open(os.path.join(out_dir, files[0])))
        assert img.shape[2] == 4  # RGBA
