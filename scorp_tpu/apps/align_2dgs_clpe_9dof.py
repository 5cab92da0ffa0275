"""9-DoF proxy alignment for 2DGS reconstructions (CLI parity with
/root/reference/align_2dgs_clpe_9dof.py): identical to the 3DGS alignment
except the segmented SCENE object's depth renders use the surfel renderer
(:355); the generated proxy keeps the 3DGS render path (:428)."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np
import yaml

from ..config import ModelParams, PipelineParams
from ..render2d import render2d
from ..train import from_gaussian_data
from .align_3dgs_clpe_9dof import align as align_base


def _scene_render_2d(cam, gaussians, bg):
    out = render2d(cam.to_jax(), from_gaussian_data(gaussians), bg)
    return {
        "render": np.asarray(out["render"]),
        "render_depth": np.asarray(out["render_depth"]),
        "render_alpha": np.asarray(out["render_alpha"]),
    }


def align(dataset, pipeline, object_name, num_iterations=6, opt_12dof_iterations=(3,),
          cam_list_interval=10, rotations_path="rotation_matrices",
          visual_match=False, matcher_backend="auto"):
    return align_base(
        dataset, pipeline, object_name, num_iterations, opt_12dof_iterations,
        cam_list_interval, rotations_path, visual_match, matcher_backend,
        scene_render=_scene_render_2d,
    )


def align_objects(dataset, pipeline, num_iterations=6, opt_12dof_iterations=(3,),
                  cam_list_interval=10, rotations_path="rotation_matrices",
                  visual_match=False, matcher_backend="auto"):
    selected = os.path.join(dataset.model_path, "masked_image_rgba_selected")
    if not os.path.exists(selected):
        raise FileNotFoundError(f"RGBA path not found at {selected}")
    for object_name in os.listdir(selected):
        align(dataset, pipeline, object_name, num_iterations, opt_12dof_iterations,
              cam_list_interval, rotations_path, visual_match, matcher_backend)


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    ModelParams.add_to_parser(parser, "Loading Parameters")
    PipelineParams.add_to_parser(parser, "Pipeline Parameters")
    parser.add_argument("--name", type=str, default="None")
    parser.add_argument("--rotations_dir", default="rotation_matrices", type=str)
    parser.add_argument("--matcher", default="auto", type=str)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    dataset = ModelParams.extract(args).finalize()

    description_path = os.path.join(dataset.source_path, "description.yml")
    with open(description_path) as f:
        description = yaml.safe_load(f)
    num_iterations = description.get("num_iterations", 6)
    opt_12dof = description.get("opt_shape_iterations", [3, 4])
    cam_interval = description.get("cam_list_interval", 10)

    pipeline = PipelineParams.extract(args)
    if args.name != "None":
        align(dataset, pipeline, args.name, num_iterations, opt_12dof, cam_interval,
              args.rotations_dir, visual_match=True, matcher_backend=args.matcher)
    else:
        align_objects(dataset, pipeline, num_iterations, opt_12dof, cam_interval,
                      args.rotations_dir, visual_match=True, matcher_backend=args.matcher)


if __name__ == "__main__":
    main()
