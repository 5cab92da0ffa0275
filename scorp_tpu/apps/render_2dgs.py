"""Eval rendering of refined / baseline 2DGS object models as RGBA (CLI
parity with /root/reference/render_2dgs.py — the 2DGS twin of render_3dgs)."""

from __future__ import annotations

import os
import shutil
import sys
from argparse import ArgumentParser

import numpy as np

from ..config import ModelParams, PipelineParams, get_combined_args
from ..render2d import render2d
from ..scene import Scene
from ..train import from_gaussian_data
from .render_3dgs import save_rgba


def _render_images(dataset, pretrained_ply_list, render_save_dir, depth_ratio=1.0):
    shutil.rmtree(render_save_dir, ignore_errors=True)
    os.makedirs(render_save_dir)
    scene = Scene(dataset, shuffle=False, pretrained_ply_path_list=pretrained_ply_list,
                  max_sh_degree=dataset.sh_degree)
    state = from_gaussian_data(scene.gaussians)
    print(f"{scene.gaussians.n} Gaussians loaded")
    bg = np.array([1.0, 1.0, 1.0], np.float32)
    for cam in scene.get_test_cameras():
        out = render2d(cam.to_jax(), state, bg, depth_ratio=depth_ratio)
        rgb = np.asarray(out["render"])
        alpha = (np.asarray(out["render_alpha"]) > 0).astype(np.float32)
        save_rgba(os.path.join(render_save_dir, f"{cam.image_name}.png"), rgb, alpha)


def render_images(dataset, iteration=1000, render_proposed=True, render_baseline=True,
                  render_refined_dir_name="rendered_refined", depth_ratio=1.0):
    if render_proposed:
        _render_images(
            dataset,
            [os.path.join(dataset.model_path, "refined_aligned", f"refined_{iteration}.ply")],
            os.path.join(dataset.model_path, render_refined_dir_name),
            depth_ratio,
        )
    if render_baseline:
        seg_dir = os.path.join(dataset.model_path, "gs_seg")
        plys = [os.path.join(seg_dir, n) for n in os.listdir(seg_dir)
                if n.endswith(".ply") and n != "remained.ply"]
        _render_images(dataset, plys,
                       os.path.join(dataset.model_path, "rendered_baseline"), depth_ratio)


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    parser.add_argument("--iter", type=int, default=1000)
    parser.add_argument("--not_render_proposed", action="store_true", default=False)
    parser.add_argument("--not_render_baseline", action="store_true", default=False)
    parser.add_argument("--render_refined_dir_name", type=str, default="rendered_refined")
    parser.add_argument("--depth_ratio", type=float, default=1.0)
    ModelParams.add_to_parser(parser, "Loading Parameters")
    PipelineParams.add_to_parser(parser, "Pipeline Parameters")
    args = get_combined_args(parser, argv)
    render_images(
        ModelParams.extract(args).finalize(),
        iteration=args.iter,
        render_proposed=not args.not_render_proposed,
        render_baseline=not args.not_render_baseline,
        render_refined_dir_name=args.render_refined_dir_name,
        depth_ratio=args.depth_ratio,
    )


if __name__ == "__main__":
    main()
