"""3D segmentation: lift 2D object masks to per-Gaussian masks by gradient
voting, write per-object PLYs (CLI parity with
/root/reference/segmentation_3dgs.py:21-107: loads the iteration-7000
reconstruction, reads prompts from description.yml, writes
model_path/gs_seg/<prompt>.ply + remained.ply)."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np
import yaml

from ..config import ModelParams, PipelineParams
from ..core.plyio import GaussianData, save_gaussian_ply
from ..pipeline.mask3d import get_mask3d
from ..scene import Scene
from ..train import from_gaussian_data


def apply_mask3d(g: GaussianData, mask3d: np.ndarray, path: str) -> GaussianData:
    sel = g.select(mask3d)
    save_gaussian_ply(path, sel)
    return sel


def mask3d(dataset: ModelParams, pipeline: PipelineParams, iteration: int = 7000):
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
        state,
        scene.get_train_cameras(),
        prompts,
        dataset.source_path,
        bg=bg,
    )
    masks_3d = masks_3d[:, : g.n]  # drop capacity padding

    gs_seg_path = os.path.join(dataset.model_path, "gs_seg")
    os.makedirs(gs_seg_path, exist_ok=True)
    for mask, prompt in zip(masks_3d, prompts):
        apply_mask3d(g, mask, os.path.join(gs_seg_path, f"{prompt}.ply"))
    remained_mask = ~(masks_3d.sum(axis=0) > 0)
    apply_mask3d(g, remained_mask, os.path.join(gs_seg_path, "remained.ply"))
    return masks_3d


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    ModelParams.add_to_parser(parser, "Loading Parameters")
    PipelineParams.add_to_parser(parser, "Pipeline Parameters")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    mask3d(ModelParams.extract(args).finalize(), PipelineParams.extract(args))


if __name__ == "__main__":
    main()
