"""Densify-at-scale NaN hunt (BASELINE.md round-4 Finding 1).

The 12k-iter densify run goes NaN between iters 7,010-8,010. This script
re-runs the same scene with instrumentation that the production loop can't
afford: a per-iteration loss finiteness check, device-resident state
snapshots every SNAP iters (two-deep ring, zero host traffic), and a
per-iteration (camera, background) log. On the first non-finite loss or
param it rewinds to the older snapshot, replays step by step with full
host-side param/stat checks, and dumps the FAULTING step's exact inputs
(params + Adam moments + camera + bg + gt) to an .npz for offline replay
(scripts/nan_replay.py) on CPU (XLA autodiff path) or device (Pallas).

Usage: python scripts/nan_hunt.py [outdir] [--iters N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def copy_adam(adam):
    """Deep-copy the Adam pytree. train_step is jitted with
    donate_argnums=(1,) (scorp_tpu/train/step.py): the NEXT step donates the
    adam buffers we pass in, so any snapshot/prev ref holding the bare arrays
    would raise 'Array has been deleted' exactly when the replay needs it."""
    return jax.tree_util.tree_map(jnp.copy, adam)


def params_finite_report(state, adam=None):
    bad = {}
    for k, v in state.params.items():
        arr = np.asarray(v)
        nbad = int((~np.isfinite(arr)).any(axis=tuple(range(1, arr.ndim))).sum())
        if nbad:
            bad[k] = nbad
    for name, arr in (("max_radii2d", state.max_radii2d),
                      ("xyz_grad_accum", state.xyz_grad_accum),
                      ("denom", state.denom)):
        a = np.asarray(arr)
        nbad = int((~np.isfinite(a)).sum())
        if nbad:
            bad[name] = nbad
    if adam is not None:
        for k, v in adam.m.items():
            nbad = int((~np.isfinite(np.asarray(v))).sum())
            if nbad:
                bad[f"adam_m.{k}"] = nbad
        for k, v in adam.v.items():
            nbad = int((~np.isfinite(np.asarray(v))).sum())
            if nbad:
                bad[f"adam_v.{k}"] = nbad
    return bad


def dump_step_inputs(path, state, adam, cam, bg, iteration, active_sh, gt_img):
    cj = cam.to_jax()
    payload = {f"param.{k}": np.asarray(v) for k, v in state.params.items()}
    payload.update({f"adam_m.{k}": np.asarray(v) for k, v in adam.m.items()})
    payload.update({f"adam_v.{k}": np.asarray(v) for k, v in adam.v.items()})
    payload.update(
        alive=np.asarray(state.alive),
        max_radii2d=np.asarray(state.max_radii2d),
        xyz_grad_accum=np.asarray(state.xyz_grad_accum),
        denom=np.asarray(state.denom),
        adam_step=np.asarray(adam.step),
        viewmatrix=np.asarray(cj.viewmatrix),
        projmatrix=np.asarray(cj.projmatrix),
        campos=np.asarray(cj.campos),
        tanfovx=np.asarray(cj.tanfovx),
        tanfovy=np.asarray(cj.tanfovy),
        width=np.int32(cj.width),
        height=np.int32(cj.height),
        bg=np.asarray(bg),
        iteration=np.int32(iteration),
        active_sh=np.int32(active_sh),
        gt_img=np.asarray(gt_img),
    )
    np.savez_compressed(path, **payload)
    print(f"dumped faulting-step inputs to {path}")


def main():
    args = list(sys.argv[1:])
    iters = 9000
    if "--iters" in args:
        i = args.index("--iters")
        iters = int(args[i + 1])
        del args[i:i + 2]
    outdir = args[0] if args else "/tmp/nan_hunt"
    scene_dir = os.path.join(outdir, "scene")
    model_dir = os.path.join(outdir, "model")
    os.makedirs(model_dir, exist_ok=True)
    if not os.path.exists(os.path.join(scene_dir, "split.yml")):
        from scripts.densify_scale_run import build_dataset
        build_dataset(scene_dir)

    import random

    from scorp_tpu.apps.train_3dgs import (
        CameraSampler, GtDeviceCache, opt_params_from_args,
    )
    from scorp_tpu.config import ModelParams, OptimizationParams, PipelineParams
    from argparse import ArgumentParser

    from scorp_tpu.render import regrow_config, tuned_raster_config
    from scorp_tpu.scene import Scene
    from scorp_tpu.train import (
        count_densify_candidates, densify_and_prune, from_point_cloud,
        grow_capacity, init_adam, reset_opacity, round_capacity, train_step,
    )

    parser = ArgumentParser()
    ModelParams.add_to_parser(parser, "L")
    OptimizationParams.add_to_parser(parser, "O")
    PipelineParams.add_to_parser(parser, "P")
    a = parser.parse_args([
        "-s", scene_dir, "-m", model_dir, "--eval",
        "--split_yml_name", "split.yml", "--iterations", str(iters),
    ])
    dataset = ModelParams.extract(a).finalize()
    dataset.model_path = model_dir
    op = opt_params_from_args(OptimizationParams.extract(a))

    random.seed(0)
    np.random.seed(0)
    scene = Scene(dataset, load_gaussians=False, max_sh_degree=dataset.sh_degree)
    state = from_point_cloud(scene.init_points, scene.init_colors,
                             max_sh_degree=dataset.sh_degree)
    adam = init_adam(state)
    cfg = tuned_raster_config(state.capacity)
    bg_fixed = np.zeros(3, np.float32)

    sampler = CameraSampler(scene.get_train_cameras())
    gt_cache = GtDeviceCache(scene.get_train_cameras())
    rng = np.random.default_rng(0)
    rng_key = jax.random.PRNGKey(0)
    active_sh = 0

    SNAP = 20
    snaps = []           # ring of (iteration, state, adam, rng_key, cfg)
    step_log = {}        # iteration -> (cam, gt_img_dev, bg)

    def run_step(state, adam, cam, gt_img, bg, iteration, active_sh, cfg):
        return train_step(
            state, adam, cam.to_jax(), gt_img,
            jnp.zeros((1, gt_img.shape[1], gt_img.shape[2]), jnp.float32),
            jnp.zeros((1, gt_img.shape[1], gt_img.shape[2]), jnp.float32),
            jnp.int32(iteration), jnp.asarray(bg),
            opt=op, sh_degree=active_sh, cfg=cfg,
            has_depth_cam=False, has_depth_est=False,
        )

    def run_densify(state, adam, rng_key, iteration, cfg):
        """The post-step housekeeping of training() for this iteration."""
        grew = False
        if iteration < op.densify_until_iter:
            if iteration > op.densify_from_iter and iteration % op.densification_interval == 0:
                use_size = iteration > op.opacity_reset_interval
                expected_new = int(count_densify_candidates(state, op.densify_grad_threshold))
                if int(state.num_alive()) + expected_new > 0.95 * state.capacity:
                    new_cap = round_capacity(
                        max(int(state.capacity * 2.0),
                            int((int(state.num_alive()) + expected_new) * 1.2)))
                    state, adam = grow_capacity(state, adam, new_cap)
                    grew = True
                rng_key, sub = jax.random.split(rng_key)
                state, adam, dropped = densify_and_prune(
                    state, adam, sub, op.densify_grad_threshold, op.opacity_cull,
                    scene.cameras_extent, op.percent_dense,
                    max_screen_size=op.max_screen_size, use_size_threshold=use_size)
                n_alive = int(state.num_alive())
                if int(dropped) > 0 or n_alive > 0.7 * state.capacity:
                    state, adam = grow_capacity(
                        state, adam, round_capacity(int(state.capacity * 2.0)))
                    grew = True
            if iteration % op.opacity_reset_interval == 0 or (
                dataset.white_background and iteration == op.densify_from_iter
            ):
                state, adam = reset_opacity(state, adam)
        return state, adam, rng_key, grew

    def replay(snap, upto):
        """Step-by-step from the snapshot with full host checks."""
        it0, state, adam, rng_key, cfg = snap
        print(f"\n=== replaying from iter {it0} to {upto} with per-step checks ===")
        for it in range(it0 + 1, upto + 1):
            cam, gt_img, bg = step_log[it]
            sh = min(it // 1000, dataset.sh_degree)
            prev_state, prev_adam = state, copy_adam(adam)
            state, adam, metrics = run_step(state, adam, cam, gt_img, bg, it, sh, cfg)
            loss = float(metrics.loss)
            bad = params_finite_report(state, adam)
            if not np.isfinite(loss) or bad:
                print(f"[REPLAY iter {it}] loss={loss} bad={bad}")
                print("pre-step param state:", params_finite_report(prev_state, prev_adam))
                dump_step_inputs(os.path.join(outdir, f"fault_iter{it}.npz"),
                                 prev_state, prev_adam, cam, bg, it, sh, gt_img)
                return True
            state, adam, rng_key, _ = run_densify(state, adam, rng_key, it, cfg)
            bad = params_finite_report(state, adam)
            if bad:
                print(f"[REPLAY iter {it}] densify produced bad={bad}")
                dump_step_inputs(os.path.join(outdir, f"fault_densify_iter{it}.npz"),
                                 prev_state, prev_adam, cam, bg, it, sh, gt_img)
                return True
            if int(metrics.num_dropped_keys) > 0 or int(metrics.num_dropped_tail) > 0:
                cfg = regrow_config(cfg, int(metrics.num_dropped_keys),
                                    int(metrics.num_dropped_tail))
        print("replay clean?! (non-determinism or check cadence gap)")
        return False

    t0 = time.time()
    snaps.append((0, state, copy_adam(adam), rng_key, cfg))
    for iteration in range(1, iters + 1):
        if iteration % 1000 == 0 and active_sh < dataset.sh_degree:
            active_sh += 1
        cam, gt = sampler.next()
        bg = (rng.uniform(size=3).astype(np.float32)
              if op.random_background else bg_fixed)
        gt_img, _, _ = gt_cache.get(cam, gt)
        step_log[iteration] = (cam, gt_img, bg)
        if iteration - 2 * SNAP - 1 in step_log:
            del step_log[iteration - 2 * SNAP - 1]

        state, adam, metrics = run_step(state, adam, cam, gt_img, bg,
                                        iteration, active_sh, cfg)
        loss = float(metrics.loss)
        fault = not np.isfinite(loss)
        bad = {}
        if not fault and iteration % SNAP == 0:
            bad = params_finite_report(state, adam)
            fault = bool(bad)
        if fault:
            print(f"\n[iter {iteration}] NON-FINITE detected: loss={loss} bad={bad} "
                  f"alive={int(metrics.num_alive)}")
            snap = snaps[0] if len(snaps) > 1 else snaps[-1]
            replay(snap, iteration)
            sampler.close()
            return

        state, adam, rng_key, grew = run_densify(state, adam, rng_key, iteration, cfg)
        if grew:
            print(f"[iter {iteration}] capacity -> {state.capacity}")
        if int(metrics.num_dropped_keys) > 0 or int(metrics.num_dropped_tail) > 0:
            cfg = regrow_config(cfg, int(metrics.num_dropped_keys),
                                int(metrics.num_dropped_tail))
            print(f"[iter {iteration}] raster keys -> {cfg.max_keys}")

        if iteration % SNAP == 0:
            snaps.append((iteration, state, copy_adam(adam), rng_key, cfg))
            if len(snaps) > 2:
                snaps.pop(0)
        if iteration % 500 == 0:
            dt = time.time() - t0
            print(f"[iter {iteration}] loss={loss:.4f} "
                  f"alive={int(metrics.num_alive)} ({iteration / dt:.1f} it/s)")

    sampler.close()
    print(f"\nNO NaN in {iters} iters ({time.time() - t0:.0f}s) — "
          "not reproduced at this seed/scale")


if __name__ == "__main__":
    main()
