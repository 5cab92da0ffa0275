"""Registration-constrained refinement of aligned proxies (CLI parity with
/root/reference/post_refine_gs.py): load every generated_aligned/*.ply named
after generated/*.ply, merge, freeze geometry (color-only), optimize 800
iterations of masked L1+SSIM against the union-mask RGBA ground truth
(--images should point at masked_image_rgba/masked), then split the merged
model back into refined_aligned/<obj>.ply + refined_{iter}.ply."""

from __future__ import annotations

import os
import random
import shutil
import sys
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelParams, OptimizationParams, PipelineParams
from ..core.plyio import save_gaussian_ply
from ..ops.raster import RasterConfig
from ..render import default_raster_config
from ..scene import Scene
from ..train import OptParams, from_gaussian_data, init_adam, to_gaussian_data
from ..train.refine import refine_step
from ..utils.progress import ProgressMeter
from .train_3dgs import opt_params_from_args


def training(dataset: ModelParams, opt: OptimizationParams, pipe: PipelineParams,
             quiet: bool = False):
    pretrained_dir = os.path.join(dataset.model_path, "generated_aligned")
    if not os.path.exists(pretrained_dir):
        raise FileNotFoundError(f"Pretrained PLY directory not found at {pretrained_dir}")
    names = [n for n in os.listdir(os.path.join(dataset.model_path, "generated"))
             if n.endswith(".ply")]
    paths = [os.path.join(pretrained_dir, n) for n in names]
    if not paths:
        raise FileNotFoundError(f"No PLY files found in the directory {pretrained_dir}")

    assert dataset.sh_degree == 0, "SH degree must be 0 for post-refine"
    scene = Scene(dataset, pretrained_ply_path_list=paths, max_sh_degree=dataset.sh_degree)
    sizes = scene.gaussian_sizes

    state = from_gaussian_data(scene.gaussians)
    adam = init_adam(state)
    op = opt_params_from_args(opt)
    cfg = default_raster_config(state.capacity)

    bg_fixed = np.array([1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0],
                        np.float32)
    rng = np.random.default_rng(0)
    cams = scene.get_train_cameras()
    stack = []
    meter = ProgressMeter(opt.iterations, disable=quiet)

    refined_dir = os.path.join(dataset.model_path, "refined_aligned")
    os.makedirs(refined_dir, exist_ok=True)

    for iteration in range(1, opt.iterations + 1):
        if not stack:
            stack = cams.copy()
        cam = stack.pop(random.randint(0, len(stack) - 1))
        gt = cam.gt(release=False)
        if gt.alpha is None:
            raise RuntimeError(
                f"{cam.image_name}: ground truth has no alpha — point --images at "
                "masked_image_rgba/masked"
            )
        bg = rng.uniform(size=3).astype(np.float32) if opt.random_background else bg_fixed
        state, adam, metrics = refine_step(
            state, adam, cam.to_jax(),
            jnp.asarray(gt.image), jnp.asarray(gt.alpha),
            jnp.int32(iteration), jnp.asarray(bg),
            opt=op, sh_degree=0, cfg=cfg,
        )
        if iteration % 10 == 0:
            meter.ema_loss = 0.4 * float(metrics["loss"]) + 0.6 * meter.ema_loss
            if meter.bar is not None:
                meter.bar.set_postfix({"Loss": f"{meter.ema_loss:.5f}"})
                meter.bar.update(10)

    # split merged model back per object by size bookkeeping
    shutil.rmtree(refined_dir, ignore_errors=True)
    os.makedirs(refined_dir)
    print(f"\n[ITER {opt.iterations}] Saving Gaussians")
    g = to_gaussian_data(state)
    offset = 0
    for size, name in zip(sizes, names):
        save_gaussian_ply(os.path.join(refined_dir, name),
                          g.select(np.arange(offset, offset + size)))
        offset += size
    save_gaussian_ply(os.path.join(refined_dir, f"refined_{opt.iterations}.ply"), g)
    return g


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    ModelParams.add_to_parser(parser, "Loading Parameters")
    OptimizationParams.add_to_parser(parser, "Optimization Parameters")
    PipelineParams.add_to_parser(parser, "Pipeline Parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    random.seed(0)
    np.random.seed(0)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    print("Optimizing " + args.model_path)
    training(
        ModelParams.extract(args).finalize(),
        OptimizationParams.extract(args),
        PipelineParams.extract(args),
        quiet=args.quiet,
    )
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
