"""3D segmentation over a 2DGS (surfel) reconstruction (CLI parity with
/root/reference/segmentation_2dgs.py — the 2DGS twin of segmentation_3dgs,
loading iteration 25000 instead of 7000 and voting through the surfel
renderer)."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np
import yaml

from ..config import ModelParams, PipelineParams
from ..pipeline.mask3d import get_mask3d
from ..scene import Scene
from ..train import from_gaussian_data
from .segmentation_3dgs import apply_mask3d


def mask3d(dataset: ModelParams, pipeline, iteration: int = 25000):
    description_path = os.path.join(dataset.source_path, "description.yml")
    if not os.path.exists(description_path):
        raise FileNotFoundError(f"Config file not found at {description_path}")
    with open(description_path) as f:
        description = yaml.safe_load(f)
    prompts = [p.strip() for p in description["prompts"].split(",")]

    scene = Scene(dataset, load_iteration=iteration, shuffle=False,
                  max_sh_degree=dataset.sh_degree)
    g = scene.gaussians
    state = from_gaussian_data(g)
    bg = np.array([1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0],
                  np.float32)

    masks_3d = get_mask3d(
        state, scene.get_train_cameras(), prompts, dataset.source_path,
        bg=bg, surfel=True,
    )[:, : g.n]

    gs_seg_path = os.path.join(dataset.model_path, "gs_seg")
    os.makedirs(gs_seg_path, exist_ok=True)
    for mask, prompt in zip(masks_3d, prompts):
        apply_mask3d(g, mask, os.path.join(gs_seg_path, f"{prompt}.ply"))
    apply_mask3d(g, ~(masks_3d.sum(axis=0) > 0),
                 os.path.join(gs_seg_path, "remained.ply"))
    return masks_3d


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    ModelParams.add_to_parser(parser, "Loading Parameters")
    PipelineParams.add_to_parser(parser, "Pipeline Parameters")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    mask3d(ModelParams.extract(args).finalize(), PipelineParams.extract(args))


if __name__ == "__main__":
    main()
