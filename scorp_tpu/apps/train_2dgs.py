"""2DGS (surfel) scene reconstruction trainer (CLI parity with
/root/reference/train_2dgs.py). Shares the 3DGS trainer's orchestration
(camera sampling/prefetch, capacity growth, checkpointing) with the surfel
train step and 2DGS hyperparameter deltas (lambda_normal/lambda_dist/
depth_ratio, opacity_cull=0.5, max_screen_size=0.2)."""

from __future__ import annotations

import os
import random
import sys
import time
import uuid
from argparse import ArgumentParser, Namespace

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelParams, Optimization2DParams, PipelineParams, save_cfg_args
from ..render import regrow_config, tuned_raster_config
from ..render2d import render2d
from ..scene import Scene
from ..train import (
    count_densify_candidates,
    densify_and_prune,
    from_point_cloud,
    grow_capacity,
    init_adam,
    reset_opacity,
    round_capacity,
    to_gaussian_data,
)
from ..train.step2d import Opt2DParams, train_step_2d
from ..utils.progress import ProgressMeter
from ..viewer.network_gui import gui_tick, maybe_create_gui
from .train_3dgs import (
    CameraSampler,
    GtDeviceCache,
    load_checkpoint,
    save_checkpoint,
)


def opt2d_from_args(opt: Optimization2DParams) -> Opt2DParams:
    return Opt2DParams(
        iterations=opt.iterations,
        position_lr_init=opt.position_lr_init,
        position_lr_final=opt.position_lr_final,
        position_lr_delay_mult=opt.position_lr_delay_mult,
        position_lr_max_steps=opt.position_lr_max_steps,
        feature_lr=opt.feature_lr,
        opacity_lr=opt.opacity_lr,
        scaling_lr=opt.scaling_lr,
        rotation_lr=opt.rotation_lr,
        percent_dense=opt.percent_dense,
        lambda_dssim=opt.lambda_dssim,
        lambda_depth_sensor=opt.lambda_depth_sensor,
        lambda_isotropic=opt.lambda_isotropic,
        opacity_cull=opt.opacity_cull,
        max_screen_size=opt.max_screen_size,
        depth_from_iter=opt.depth_from_iter,
        dn_l1_weight_init=opt.dn_l1_weight_init,
        dn_l1_weight_final=opt.dn_l1_weight_final,
        densification_interval=opt.densification_interval,
        opacity_reset_interval=opt.opacity_reset_interval,
        densify_from_iter=opt.densify_from_iter,
        densify_until_iter=opt.densify_until_iter,
        densify_grad_threshold=opt.densify_grad_threshold,
        random_background=opt.random_background,
        lambda_normal=opt.lambda_normal,
        lambda_dist=opt.lambda_dist,
        depth_ratio=opt.depth_ratio,
    )


def evaluate2d(scene, state, sh_degree, bg, cfg, iteration, quiet=False):
    """Renders straight from the live padded state with the training
    RasterConfig (no host round-trip, no per-capacity recompile)."""
    results = {}
    train_cams = scene.get_train_cameras()
    configs = [
        ("test", scene.get_test_cameras()),
        ("train", [train_cams[i % len(train_cams)] for i in range(5, 30, 5)] if train_cams else []),
    ]
    for name, cams in configs:
        if not cams:
            continue
        l1s, psnrs = [], []
        for cam in cams:
            out = render2d(cam.to_jax(), state, bg, sh_degree=sh_degree, cfg=cfg)
            img = np.clip(np.asarray(out["render"]), 0.0, 1.0)
            gt = np.clip(cam.gt(release=True).image, 0.0, 1.0)
            l1s.append(float(np.abs(img - gt).mean()))
            mse = float(((img - gt) ** 2).mean())
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        results[name] = (float(np.mean(l1s)), float(np.mean(psnrs)))
        if not quiet:
            print(f"\n[ITER {iteration}] Evaluating {name}: "
                  f"L1 {results[name][0]} PSNR {results[name][1]}")
    return results


def training(dataset, opt: Optimization2DParams, pipe, testing_iterations,
             saving_iterations, checkpoint_iterations, checkpoint, debug_from,
             quiet: bool = False, ip: str | None = None, port: int = 6009):
    if not dataset.model_path:
        dataset.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    os.makedirs(dataset.model_path, exist_ok=True)
    print(f"Output folder: {dataset.model_path}")

    scene = Scene(dataset, load_gaussians=False, max_sh_degree=dataset.sh_degree)
    op = opt2d_from_args(opt)

    state = from_point_cloud(
        scene.init_points, scene.init_colors, max_sh_degree=dataset.sh_degree,
        surfel=True,
    )
    adam = init_adam(state)
    first_iter = 0
    if checkpoint:
        state, adam, first_iter = load_checkpoint(checkpoint)

    bg_fixed = np.array([1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0],
                        np.float32)
    # bwd_block_frac 0.85: surfel termination is weaker than 3DGS, measured
    # ~79% covered bwd blocks at bench scale (scripts/diag_ncontrib2d.py)
    cfg = tuned_raster_config(state.capacity, chunk=32, bwd_block_frac=0.85)

    # live SIBR viewer loop (the reference's only live call site,
    # /root/reference/train_2dgs.py:209-230)
    gui = maybe_create_gui(ip, port)

    sampler = CameraSampler(scene.get_train_cameras())
    gt_cache = GtDeviceCache(scene.get_train_cameras())
    rng = np.random.default_rng(0)
    rng_key = jax.random.PRNGKey(0)
    # resume at the SH degree the schedule had reached (see train_3dgs)
    active_sh = min(first_iter // 1000, dataset.sh_degree)
    meter = ProgressMeter(opt.iterations, disable=quiet)

    t_start = time.time()
    for iteration in range(first_iter + 1, opt.iterations + 1):
        if iteration % 1000 == 0 and active_sh < dataset.sh_degree:
            active_sh += 1

        if gui is not None:
            def _gui_render(minicam, smod):
                out = render2d(
                    minicam.to_jax(), state, bg_fixed,
                    scaling_modifier=float(smod), sh_degree=active_sh, cfg=cfg,
                )
                return np.asarray(out["render"])

            gui_tick(gui, _gui_render, dataset.source_path, iteration,
                     opt.iterations)

        cam, gt = sampler.next()
        bg = rng.uniform(size=3).astype(np.float32) if opt.random_background else bg_fixed
        gt_img, gt_dcam, gt_dest = gt_cache.get(cam, gt)
        state, adam, metrics = train_step_2d(
            state, adam, cam.to_jax(),
            gt_img, gt_dcam, gt_dest,
            jnp.int32(iteration), jnp.asarray(bg),
            opt=op, sh_degree=active_sh, cfg=cfg,
            has_depth_cam=gt.depth_cam is not None,
            has_depth_est=gt.depth_est is not None,
        )
        meter.update(iteration, metrics)

        if iteration in testing_iterations:
            evaluate2d(scene, state, active_sh, bg_fixed, cfg, iteration, quiet=quiet)
        if iteration in saving_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.save(iteration, to_gaussian_data(state))

        if iteration < opt.densify_until_iter:
            if iteration > opt.densify_from_iter and iteration % opt.densification_interval == 0:
                use_size = iteration > opt.opacity_reset_interval
                # pre-grow so the densify scatter never runs out of slots
                expected_new = int(count_densify_candidates(state, opt.densify_grad_threshold))
                if int(state.num_alive()) + expected_new > 0.95 * state.capacity:
                    new_cap = round_capacity(
                        max(int(state.capacity * 2.0),
                            int((int(state.num_alive()) + expected_new) * 1.2))
                    )
                    print(f"\n[ITER {iteration}] capacity {state.capacity} -> {new_cap}")
                    state, adam = grow_capacity(state, adam, new_cap)
                rng_key, sub = jax.random.split(rng_key)
                state, adam, dropped = densify_and_prune(
                    state, adam, sub,
                    opt.densify_grad_threshold, opt.opacity_cull,
                    scene.cameras_extent, opt.percent_dense,
                    max_screen_size=opt.max_screen_size,
                    use_size_threshold=use_size,
                )
                n_alive = int(state.num_alive())
                # grow BEFORE the buffer can saturate (a saturated densify
                # drops clone/split candidates the reference would keep)
                if int(dropped) > 0 or n_alive > 0.7 * state.capacity:
                    new_cap = round_capacity(int(state.capacity * 2.0))
                    state, adam = grow_capacity(state, adam, new_cap)
            if iteration % opt.opacity_reset_interval == 0 or (
                dataset.white_background and iteration == opt.densify_from_iter
            ):
                state, adam = reset_opacity(state, adam)

        if int(metrics.num_dropped_keys) > 0 or int(metrics.num_dropped_tail) > 0:
            cfg = regrow_config(cfg, int(metrics.num_dropped_keys),
                                int(metrics.num_dropped_tail))

        if iteration in checkpoint_iterations:
            save_checkpoint(
                os.path.join(scene.model_path, f"chkpnt{iteration}.pth"),
                state, adam, iteration,
            )

    sampler.close()
    wall = time.time() - t_start
    iters = opt.iterations - first_iter
    print(f"\nTraining done: {iters} iters in {wall:.1f}s "
          f"({iters / max(wall, 1e-9):.2f} it/s), {int(state.num_alive())} gaussians")
    return scene, state, adam


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    ModelParams.add_to_parser(parser, "Loading Parameters")
    Optimization2DParams.add_to_parser(parser, "Optimization Parameters")
    PipelineParams.add_to_parser(parser, "Pipeline Parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 10_000, 15_000, 20_000, 25_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[5_000, 7_000, 10_000, 15_000, 20_000, 25_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.save_iterations.append(args.iterations)

    random.seed(0)
    np.random.seed(0)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    dataset = ModelParams.extract(args).finalize()
    if not dataset.model_path:
        dataset.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    args.model_path = dataset.model_path
    save_cfg_args(dataset.model_path, Namespace(**vars(args)))
    print("Optimizing " + dataset.model_path)

    training(
        dataset,
        Optimization2DParams.extract(args),
        PipelineParams.extract(args),
        args.test_iterations, args.save_iterations,
        args.checkpoint_iterations, args.start_checkpoint, args.debug_from,
        quiet=args.quiet, ip=args.ip, port=args.port,
    )
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
