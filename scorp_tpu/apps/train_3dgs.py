"""3DGS scene reconstruction trainer (CLI parity with
/root/reference/train_3dgs.py).

The hot loop is one jitted TPU program per (resolution, sh_degree,
capacity): render + loss + backward + Adam + densification stats all fused.
The host thread only feeds ground-truth images (prefetched by a background
thread) and runs the every-100-iteration densification program. Capacity
(Gaussian slots, rasterizer key buffers) grows geometrically when the
device reports overflow — a handful of recompiles per run.
"""

from __future__ import annotations

import os
import pickle
import queue
import random
import sys
import threading
import time
import uuid
from argparse import ArgumentParser, Namespace

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    save_cfg_args,
)
from ..render import regrow_config, render, tuned_raster_config
from ..scene import Scene
from ..scene.cameras import Camera
from ..train import (
    OptParams,
    count_densify_candidates,
    densify_and_prune,
    from_point_cloud,
    grow_capacity,
    init_adam,
    reset_opacity,
    round_capacity,
    to_gaussian_data,
    train_step,
)
from ..utils.progress import ProgressMeter


def opt_params_from_args(opt: OptimizationParams) -> OptParams:
    return OptParams(
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
    )


class GtDeviceCache:
    """Per-camera device-resident GT tensors.

    Re-uploading the GT image (and zero depth maps) every step costs a
    host->device transfer per iteration — megabytes per step that dwarf the
    step itself on remote-attached TPUs. Cache the device arrays per camera
    when the total fits a budget (the reference keeps GT on-GPU per camera
    too); zero depth maps are shared per resolution either way.
    """

    def __init__(self, cameras, budget_bytes: int = 4 << 30):
        est = sum(
            c.image_width * c.image_height * 3 * 4
            * (2 if c.depth_cam_path is not None else 1)
            for c in cameras
        )
        self.enabled = est <= budget_bytes
        self.imgs: dict = {}
        self.zeros: dict = {}

    def _zero(self, h, w):
        z = self.zeros.get((h, w))
        if z is None:
            z = jnp.zeros((1, h, w), jnp.float32)
            self.zeros[(h, w)] = z
        return z

    def get(self, cam, gt):
        h, w = gt.image.shape[1], gt.image.shape[2]
        zero_d = self._zero(h, w)
        key = id(cam)
        hit = self.enabled and key in self.imgs
        if hit:
            return self.imgs[key]
        val = (
            jnp.asarray(gt.image),
            jnp.asarray(gt.depth_cam) if gt.depth_cam is not None else zero_d,
            jnp.asarray(gt.depth_est) if gt.depth_est is not None else zero_d,
        )
        if self.enabled:
            self.imgs[key] = val
        return val


class CameraSampler:
    """Random-camera-without-replacement stack + background GT prefetch."""

    def __init__(self, cameras: list[Camera], prefetch: int = 4):
        self.cameras = cameras
        self.stack: list[Camera] = []
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self.stop = False
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _next_cam(self) -> Camera:
        if not self.stack:
            self.stack = self.cameras.copy()
        return self.stack.pop(random.randint(0, len(self.stack) - 1))

    def _worker(self):
        while not self.stop:
            cam = self._next_cam()
            gt = cam.gt(release=True)
            try:
                self.q.put((cam, gt), timeout=1.0)
            except queue.Full:
                # retry with the same item until consumed or stopped
                while not self.stop:
                    try:
                        self.q.put((cam, gt), timeout=1.0)
                        break
                    except queue.Full:
                        pass

    def next(self):
        return self.q.get()

    def close(self):
        self.stop = True
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass


def save_checkpoint(path: str, state, adam, iteration: int):
    payload = {
        "params": {k: np.asarray(v) for k, v in state.params.items()},
        "alive": np.asarray(state.alive),
        "max_radii2d": np.asarray(state.max_radii2d),
        "xyz_grad_accum": np.asarray(state.xyz_grad_accum),
        "denom": np.asarray(state.denom),
        "adam_m": {k: np.asarray(v) for k, v in adam.m.items()},
        "adam_v": {k: np.asarray(v) for k, v in adam.v.items()},
        "adam_step": int(adam.step),
        "iteration": iteration,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str):
    from ..train.state import AdamState, GaussianState

    with open(path, "rb") as f:
        p = pickle.load(f)
    state = GaussianState(
        params={k: jnp.asarray(v) for k, v in p["params"].items()},
        alive=jnp.asarray(p["alive"]),
        max_radii2d=jnp.asarray(p["max_radii2d"]),
        xyz_grad_accum=jnp.asarray(p["xyz_grad_accum"]),
        denom=jnp.asarray(p["denom"]),
    )
    adam = AdamState(
        m={k: jnp.asarray(v) for k, v in p["adam_m"].items()},
        v={k: jnp.asarray(v) for k, v in p["adam_v"].items()},
        step=jnp.int32(p["adam_step"]),
    )
    return state, adam, p["iteration"]


def evaluate(scene: Scene, state, sh_degree: int, bg, cfg, iteration: int, quiet=False):
    """In-loop test/train eval (training_report, train_3dgs.py:221-256).

    Renders straight from the live padded state (alive-masked) with the
    training RasterConfig: no host round-trip of model-sized buffers and no
    new compile after the first eval at a given capacity.
    """
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
            out = render(cam.to_jax(), state, bg, sh_degree=sh_degree, cfg=cfg)
            if int(out["num_dropped_keys"]) > 0 and not quiet:
                print(f"\n[ITER {iteration}] eval view dropped "
                      f"{int(out['num_dropped_keys'])} keys")
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


def training(
    dataset: ModelParams,
    opt: OptimizationParams,
    pipe: PipelineParams,
    testing_iterations,
    saving_iterations,
    checkpoint_iterations,
    checkpoint,
    debug_from,
    quiet: bool = False,
    ip: str | None = None,
    port: int = 6009,
):
    if not dataset.model_path:
        dataset.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    os.makedirs(dataset.model_path, exist_ok=True)
    print(f"Output folder: {dataset.model_path}")

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(dataset.model_path)
    except ImportError:
        print("Tensorboard not available: not logging progress")

    scene = Scene(dataset, load_gaussians=False, max_sh_degree=dataset.sh_degree)
    op = opt_params_from_args(opt)

    state = from_point_cloud(
        scene.init_points, scene.init_colors, max_sh_degree=dataset.sh_degree
    )
    adam = init_adam(state)
    first_iter = 0
    if checkpoint:
        state, adam, first_iter = load_checkpoint(checkpoint)
        print(f"Restored checkpoint at iteration {first_iter}")

    bg_fixed = np.array([1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0],
                        np.float32)
    cfg = tuned_raster_config(state.capacity)

    # live SIBR viewer loop; the reference ships these call sites
    # commented out for 3DGS (train_3dgs.py:57-70) — opt-in via --gui
    from ..viewer.network_gui import gui_tick, maybe_create_gui

    gui = maybe_create_gui(ip, port)

    sampler = CameraSampler(scene.get_train_cameras())
    gt_cache = GtDeviceCache(scene.get_train_cameras())
    rng = np.random.default_rng(0)
    rng_key = jax.random.PRNGKey(0)
    # a restored run resumes at the SH degree the schedule had reached
    # (reference capture()/restore() round-trips active_sh_degree)
    active_sh = min(first_iter // 1000, dataset.sh_degree)
    meter = ProgressMeter(opt.iterations, disable=quiet)
    depth_seen = scene.get_train_cameras()[0].depth_cam_path is not None
    est_seen = scene.get_train_cameras()[0].depth_est_path is not None

    t_start = time.time()
    for iteration in range(first_iter + 1, opt.iterations + 1):
        if iteration % 1000 == 0 and active_sh < dataset.sh_degree:
            active_sh += 1

        if gui is not None:
            def _gui_render(minicam, smod):
                out = render(
                    minicam.to_jax(), state, bg_fixed,
                    scaling_modifier=float(smod), sh_degree=active_sh, cfg=cfg,
                )
                return np.asarray(out["render"])

            gui_tick(gui, _gui_render, dataset.source_path, iteration,
                     opt.iterations)

        cam, gt = sampler.next()
        bg = rng.uniform(size=3).astype(np.float32) if opt.random_background else bg_fixed
        gt_img, gt_dcam, gt_dest = gt_cache.get(cam, gt)
        state, adam, metrics = train_step(
            state, adam, cam.to_jax(),
            gt_img, gt_dcam, gt_dest,
            jnp.int32(iteration), jnp.asarray(bg),
            opt=op, sh_degree=active_sh, cfg=cfg,
            has_depth_cam=gt.depth_cam is not None,
            has_depth_est=gt.depth_est is not None,
        )

        # --- host-side housekeeping every iteration is just the meter ---
        meter.update(iteration, metrics)
        if tb_writer is not None and iteration % 10 == 0:
            tb_writer.add_scalar("train_loss_patches/l1_loss", float(metrics.l1), iteration)
            tb_writer.add_scalar("train_loss_patches/total_loss", float(metrics.loss), iteration)
            tb_writer.add_scalar("total_points", int(metrics.num_alive), iteration)

        if iteration in testing_iterations:
            results = evaluate(scene, state, active_sh, bg_fixed, cfg, iteration, quiet=quiet)
            if tb_writer is not None:
                for name, (l1v, psnrv) in results.items():
                    tb_writer.add_scalar(f"{name}/loss_viewpoint - l1_loss", l1v, iteration)
                    tb_writer.add_scalar(f"{name}/loss_viewpoint - psnr", psnrv, iteration)
        if iteration in saving_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.save(iteration, to_gaussian_data(state))

        # --- densification ---
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
                    print(f"\n[ITER {iteration}] capacity {state.capacity} -> {new_cap} "
                          f"(alive {n_alive}, dropped {int(dropped)})")
                    state, adam = grow_capacity(state, adam, new_cap)
            if iteration % opt.opacity_reset_interval == 0 or (
                dataset.white_background and iteration == opt.densify_from_iter
            ):
                state, adam = reset_opacity(state, adam)

        # rasterizer capacity growth on overflow (preserves tuned fields)
        if int(metrics.num_dropped_keys) > 0 or int(metrics.num_dropped_tail) > 0:
            cfg = regrow_config(cfg, int(metrics.num_dropped_keys),
                                int(metrics.num_dropped_tail))
            print(f"\n[ITER {iteration}] raster capacity -> keys={cfg.max_keys} "
                  f"stream={cfg.stream_keys} list={cfg.tile_list_len}")

        if iteration in checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
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
    OptimizationParams.add_to_parser(parser, "Optimization Parameters")
    PipelineParams.add_to_parser(parser, "Pipeline Parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    # the reference keeps the 3DGS viewer call sites commented out
    # (train_3dgs.py:57-70); --gui opts into the same live loop
    parser.add_argument("--gui", action="store_true", default=False)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 10_000, 15_000, 20_000, 25_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[5_000, 7_000, 10_000, 15_000, 20_000, 25_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--profile", type=str, default=None,
                        help="write a jax.profiler trace to this directory")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.save_iterations.append(args.iterations)

    random.seed(0)
    np.random.seed(0)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    print("Optimizing " + args.model_path)
    dataset = ModelParams.extract(args).finalize()
    if not dataset.model_path:
        dataset.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    args.model_path = dataset.model_path
    save_cfg_args(dataset.model_path, Namespace(**vars(args)))

    if args.profile:
        import contextlib

        ctx = jax.profiler.trace(args.profile)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        training(
            dataset,
            OptimizationParams.extract(args),
            PipelineParams.extract(args),
            args.test_iterations,
            args.save_iterations,
            args.checkpoint_iterations,
            args.start_checkpoint,
            args.debug_from,
            quiet=args.quiet,
            ip=args.ip if args.gui else None,
            port=args.port,
        )
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
