"""Opacity truncation of generated proxy Gaussians (CLI parity with
/root/reference/truncate_opacity.py:9-66): drop Gaussians whose activated
(sigmoid) opacity is below a threshold from every `generated/*.ply`,
rewriting in place with a `.ply.bak` backup."""

from __future__ import annotations

import os
import shutil
import sys
from argparse import ArgumentParser

import numpy as np

from ..core.plyio import GaussianData, load_gaussian_ply, save_gaussian_ply


def truncate_gs(g: GaussianData, threshold: float = 0.1) -> GaussianData:
    opacity = 1.0 / (1.0 + np.exp(-g.opacity[:, 0]))
    return g.select(~(opacity < threshold))


def truncate(gs_path: str, threshold: float = 0.1) -> None:
    assert os.path.exists(gs_path), f"Gaussian model file {gs_path} does not exist"
    shutil.copy(gs_path, gs_path + ".bak")
    g = load_gaussian_ply(gs_path)
    save_gaussian_ply(gs_path, truncate_gs(g, threshold))


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    parser.add_argument("--model_path", "-m", type=str, required=True,
                        help="path to the scene Gaussian model")
    parser.add_argument("--threshold", default=0.1, type=float,
                        help="opacity threshold for truncation")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    gs_generated_path = os.path.join(args.model_path, "generated")
    if not os.path.exists(gs_generated_path):
        raise FileNotFoundError(
            f"Generated Gaussian model path {gs_generated_path} does not exist"
        )
    for name in os.listdir(gs_generated_path):
        if name.endswith(".ply"):
            path = os.path.join(gs_generated_path, name)
            truncate(path, args.threshold)
            print(f"Truncated {path} with threshold {args.threshold}")


if __name__ == "__main__":
    main()
