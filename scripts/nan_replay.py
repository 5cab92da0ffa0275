"""Replay a faulting train step dumped by scripts/nan_hunt.py.

Loads the fault .npz (exact params + Adam moments + camera + bg + gt of the
step that produced the first non-finite value), reconstructs the state, and
re-runs ONE train_step with jax_debug_nans enabled so XLA pinpoints the
primitive that emits the NaN. Also prints host-side diagnostics of the
pre-step parameters (conic determinant margins, scale/opacity extremes)
so near-degenerate inputs are visible even before the step runs.

Usage:
  python scripts/nan_replay.py /path/fault_iter7432.npz            # device
  JAX_PLATFORMS=cpu python scripts/nan_replay.py fault.npz --xla   # CPU/XLA
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def load(path):
    from scorp_tpu.core.camera import CameraJax
    from scorp_tpu.train.state import AdamState, GaussianState, PARAM_KEYS

    z = np.load(path)
    params = {k: jnp.asarray(z[f"param.{k}"]) for k in PARAM_KEYS}
    state = GaussianState(
        params=params,
        alive=jnp.asarray(z["alive"]),
        max_radii2d=jnp.asarray(z["max_radii2d"]),
        xyz_grad_accum=jnp.asarray(z["xyz_grad_accum"]),
        denom=jnp.asarray(z["denom"]),
    )
    adam = AdamState(
        m={k: jnp.asarray(z[f"adam_m.{k}"]) for k in PARAM_KEYS},
        v={k: jnp.asarray(z[f"adam_v.{k}"]) for k in PARAM_KEYS},
        step=jnp.asarray(z["adam_step"]),
    )
    cam = CameraJax(
        viewmatrix=jnp.asarray(z["viewmatrix"]),
        projmatrix=jnp.asarray(z["projmatrix"]),
        campos=jnp.asarray(z["campos"]),
        tanfovx=jnp.asarray(z["tanfovx"]),
        tanfovy=jnp.asarray(z["tanfovy"]),
        width=int(z["width"]),
        height=int(z["height"]),
    )
    return (state, adam, cam, jnp.asarray(z["bg"]), int(z["iteration"]),
            int(z["active_sh"]), jnp.asarray(z["gt_img"]))


def diagnose_inputs(state, cam):
    """Host-side near-degeneracy report on the pre-step parameters."""
    alive = np.asarray(state.alive)
    p = {k: np.asarray(v)[alive] for k, v in state.params.items()}
    scales = np.exp(p["scaling"])
    q = p["rotation"]
    qn = np.linalg.norm(q, axis=1)
    print(f"alive rows: {alive.sum()}")
    print(f"scale range: [{scales.min():.3e}, {scales.max():.3e}]  "
          f"aspect max: {(scales.max(1) / np.maximum(scales.min(1), 1e-30)).max():.3e}")
    print(f"quat norm range: [{qn.min():.3e}, {qn.max():.3e}]")
    print(f"opacity logit range: [{p['opacity'].min():.3f}, {p['opacity'].max():.3f}]")
    xyz_h = np.concatenate([p["xyz"], np.ones((len(p["xyz"]), 1), np.float32)], 1)
    depth = (xyz_h @ np.asarray(cam.viewmatrix))[:, 2]
    print(f"view-depth range: [{depth.min():.3f}, {depth.max():.3f}]  "
          f"(near-plane 0.2 crossers: {(np.abs(depth - 0.2) < 1e-3).sum()})")
    for k, v in p.items():
        nb = int((~np.isfinite(v)).sum())
        if nb:
            print(f"  !! pre-step {k} already has {nb} non-finite entries")


def main():
    argv = list(sys.argv[1:])
    use_xla = "--xla" in argv
    if use_xla:
        argv.remove("--xla")
    path = argv[0]

    from scorp_tpu.render import tuned_raster_config
    from scorp_tpu.train.step import OptParams, train_step

    state, adam, cam, bg, iteration, active_sh, gt_img = load(path)
    diagnose_inputs(state, cam)

    cfg = tuned_raster_config(state.capacity)
    if use_xla:
        cfg = cfg._replace(backend="xla") if hasattr(cfg, "backend") else cfg
    opt = OptParams()
    zeros1 = jnp.zeros((1, cam.height, cam.width), jnp.float32)

    jax.config.update("jax_debug_nans", True)
    print(f"re-running iter {iteration} (sh={active_sh}) with jax_debug_nans...")
    try:
        state2, adam2, metrics = train_step(
            state, adam, cam, gt_img, zeros1, zeros1,
            jnp.int32(iteration), bg,
            opt=opt, sh_degree=active_sh, cfg=cfg,
            has_depth_cam=False, has_depth_est=False,
        )
        jax.block_until_ready(metrics)
        print(f"step completed: loss={float(metrics.loss)}")
        for k, v in state2.params.items():
            nb = int((~np.isfinite(np.asarray(v))).sum())
            if nb:
                print(f"  post-step {k}: {nb} non-finite entries")
        for d, name in ((adam2.m, "adam_m"), (adam2.v, "adam_v")):
            for k, v in d.items():
                nb = int((~np.isfinite(np.asarray(v))).sum())
                if nb:
                    print(f"  post-step {name}.{k}: {nb} non-finite entries")
    except FloatingPointError as e:
        print(f"jax_debug_nans caught: {e}")


if __name__ == "__main__":
    main()
