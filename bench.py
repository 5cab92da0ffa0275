"""Headline benchmarks on a kitchen-scale scene (250k Gaussians, 1600x1066,
the reference's -r -1 auto-1600 policy on a mipnerf360-style capture).

Prints one JSON line per metric:
  render_fps_250k_1600x1066  — forward rasterization FPS (eval path)
  train_step_ms_250k_1600x1066 — full fwd+bwd+adam step latency
  tpu_kernel_parity — on-device Pallas-vs-XLA fwd parity (max |diff|); the
    per-round Mosaic regression smoke (compiled kernels, not interpreter)

The reference publishes no numbers (BASELINE.md); vs_baseline is reported
against the commonly-cited ~100 FPS / ~15 it/s of the CUDA stack at this
scale on a desktop GPU; driver-measured reference numbers supersede it.
"""

import json
import time

import numpy as np


def build_scene(n=250_000, seed=0, width=1600, height=1066):
    import jax.numpy as jnp

    from scorp_tpu.core.camera import look_at_camera
    from scorp_tpu.core.sh import rgb_to_sh

    rng = np.random.default_rng(seed)
    # cluster points like a room-scale capture: mixture of a box + clusters
    base = rng.uniform(-2, 2, size=(n, 3))
    cluster_idx = rng.integers(0, 32, size=n)
    centers = rng.uniform(-2, 2, size=(32, 3))
    xyz = (0.35 * base + centers[cluster_idx]).astype(np.float32)

    k = 16
    shs = np.zeros((n, k, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.05, 0.95, size=(n, 3))).astype(np.float32)
    shs[:, 1:] = rng.normal(0, 0.03, size=(n, k - 1, 3)).astype(np.float32)
    scales = np.exp(rng.normal(np.log(0.02), 0.5, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = (1.0 / (1.0 + np.exp(-rng.normal(0.0, 2.0, size=n)))).astype(np.float32)

    cam = look_at_camera(
        eye=[0, 0.5, -6.5], target=[0, 0, 0], up=[0, 1, 0],
        fovx=1.2, fovy=0.9, width=width, height=height,
    )
    return (
        jnp.asarray(xyz), jnp.asarray(shs), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(opacity), cam,
    )


def bench_roofline(scene, cfg, render_fps, train_ms):
    """Roofline occupancy: analytic work estimates over measured times vs
    v5e peaks, so 'fast' is judged against hardware, not folklore.

    Work model (documented upper bound — no early-termination credit, so
    true utilization is >= the VPU/MXU numbers when pixels saturate early):
      * chunk visits V = sum over non-empty tiles of
        ceil((start % C + count) / C) on the compact stream (C=pallas_chunk,
        P=256 pixels/tile);
      * composite fwd per visit: MXU = one triangular scan (bf16x2 -> 2
        single passes of 2*P*C*C) + one [4,C]x[C,P] accumulation (bf16x3);
        VPU = P*C*(~30 elementwise + 3 transcendentals @ ~8 ops) ops;
        HBM = 16*C*4 B stream read;
      * composite bwd per visit: 2 scans + 2 [4,*] accumulations, ~80
        VPU ops/(key*pixel), stream read + gradient block write;
      * K-proportional tails (expansion/sort/gather/scatter) enter the HBM
        byte count at ~measured per-row costs, not the compute counts.

    v5e peaks: MXU 197 TFLOP/s bf16; HBM ~819 GB/s; VPU f32 ~6.1 Tops
    (8x128 lanes x 4 ALUs at the ~1.5 GHz the MXU peak implies). The
    headline `value` is the utilization of the BINDING resource (max of
    the three) — 100 means speed-of-light on that resource.
    """
    import jax
    import jax.numpy as jnp

    from scorp_tpu.ops.raster.common import (
        _tile_bounds, grid_dims, preprocess, sorted_expansion,
    )

    xyz, shs, scales, quats, opacity, cam = scene
    w, h = cam.width, cam.height
    tiles_x, tiles_y = grid_dims(w, h)
    num_tiles = tiles_x * tiles_y
    chunk = cfg.pallas_chunk
    p = 256

    @jax.jit
    def stats(xyz, shs, scales, quats, opacity):
        prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                          scales=scales, quats=quats)
        sorted_tile, _, _, _, kept, _ = sorted_expansion(
            prep, w, h, cfg.max_keys, cull=True)
        ts, tc = _tile_bounds(sorted_tile[:cfg.stream_cap], num_tiles)
        return ts, tc, kept

    ts, tc, kept = map(np.asarray, stats(xyz, shs, scales, quats, opacity))
    k = float(min(int(kept), cfg.stream_cap))
    visits = float(np.sum(np.where(
        tc > 0, ((ts % chunk) + tc + chunk - 1) // chunk, 0)))
    n = xyz.shape[0]

    # per-visit work constants (see docstring). Round-4 telescoped-alpha +
    # base-2 kernels: the RENDER forward body dropped the cross-lane
    # min-reduce and three transcendental-lowering multiplies (~42 ops);
    # the TRAIN forward keeps the exact min-reduce for the backward's
    # T_term residual (~50); backward ~78.
    mxu_scan = 2 * 2.0 * p * chunk * chunk          # bf16x2 triangular scan
    mxu_acc = 3 * 2.0 * 4 * chunk * p               # bf16x3 [4,C] accumulation
    vpu_fwd = p * chunk * 42.0
    vpu_fwd_train = p * chunk * 50.0
    vpu_bwd = p * chunk * 78.0
    stream_rd = 16.0 * chunk * 4
    VPU_PEAK, MXU_PEAK, HBM_PEAK = 6.1e12, 1.97e14, 8.19e11

    def emit(name, t, mxu, vpu, hbm):
        util = {"vpu": vpu / t / VPU_PEAK, "mxu": mxu / t / MXU_PEAK,
                "hbm": hbm / t / HBM_PEAK}
        bind = max(util, key=util.get)
        print(json.dumps({
            "metric": name,
            "value": round(100 * util[bind], 1),
            "unit": f"% of v5e {bind} roofline (work upper bound / measured time)",
            "vs_baseline": round(util[bind], 3),
            "detail": {kk: round(100 * vv, 1) for kk, vv in util.items()},
        }))

    # render: composite fwd + K-row tails (expansion ~24 B/key gather+pack,
    # u16 stream gather ~40 B/key payload x r/w, sort keys) + N-row preprocess
    t_r = 1.0 / render_fps
    emit(
        "render_mfu_pct", t_r,
        mxu=visits * (mxu_scan + mxu_acc),
        vpu=visits * vpu_fwd + n * 300.0,
        hbm=visits * stream_rd + k * (40 * 2 + 24 + 8 * 2) + n * 300.0,
    )
    if train_ms is not None:
        # train: fwd + bwd kernels + gradient blocks (write + scatter r/w at
        # ~57% block coverage) + adam (11 param columns r/w x ~3 slots)
        t_t = train_ms / 1e3
        cov = 0.6 * visits * chunk
        emit(
            "train_mfu_pct", t_t,
            mxu=visits * (2 * mxu_scan + 3 * mxu_acc),
            vpu=visits * (vpu_fwd_train + vpu_bwd) + n * 600.0,
            hbm=(visits * stream_rd * 2 + visits * 16 * chunk * 4
                 + cov * 64 * 3 + k * (40 * 2 + 24 + 8 * 2) + n * 2000.0),
        )


def bench_render(xyz, shs, scales, quats, opacity, cam, cfg):
    import jax
    import jax.numpy as jnp

    from scorp_tpu.ops.raster.pallas_fwd import rasterize_pallas_fwd_only

    bg = jnp.zeros(3, jnp.float32)

    @jax.jit
    def render_frame(xyz, shs, scales, quats, opacity):
        out = rasterize_pallas_fwd_only(
            xyz, opacity, cam, bg, shs=shs, sh_degree=3,
            scales=scales, quats=quats, cfg=cfg,
        )
        return out.color, out.num_dropped_keys

    color, dk = render_frame(xyz, shs, scales, quats, opacity)
    color.block_until_ready()
    assert int(dk) == 0, int(dk)
    # content sanity at FULL scale: a zero-drop assert is trivially true if
    # the expansion silently culls everything (the round-3 denormal-flush
    # bug rendered black frames at full scale while small parity smokes
    # passed). Assert the frame is non-trivial and the Pallas expansion's
    # kept-key count brackets the XLA golden expansion's.
    mean = float(jnp.mean(color))
    assert mean > 0.01, f"full-scale render is ~black (mean {mean})"
    from scorp_tpu.ops.raster.common import _expand_keys_core, preprocess
    from scorp_tpu.ops.raster.pallas_expand import expand_sorted_keys

    prep = jax.jit(
        lambda *a: preprocess(a[0], a[4], cam, shs=a[1], sh_degree=3,
                              scales=a[2], quats=a[3])
    )(xyz, shs, scales, quats, opacity)
    _, _, _, kept_k, _bits, _ = jax.jit(
        expand_sorted_keys,
        static_argnames=("width", "height", "k_cap", "cull"),
    )(prep, cam.width, cam.height, cfg.max_keys, True)
    out = jax.jit(
        _expand_keys_core,
        static_argnames=("width", "height", "k_cap", "cull"),
    )(prep, cam.width, cam.height, cfg.max_keys, True)
    kept_k, kept_x = int(kept_k), int(out[7])
    # the kernel's exact f32 cull keeps <= the XLA bf16-tolerance cull
    assert 0.8 * kept_x <= kept_k <= kept_x + 1000, (kept_k, kept_x)

    n_frames = 30
    t0 = time.perf_counter()
    for _ in range(n_frames):
        color, _ = render_frame(xyz, shs, scales, quats, opacity)
    color.block_until_ready()
    fps = n_frames / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "render_fps_250k_1600x1066",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 3),
    }))
    return fps


def bench_train_step(xyz, shs, scales, quats, opacity, cam, cfg):
    import jax
    import jax.numpy as jnp

    from scorp_tpu.core.plyio import GaussianData
    from scorp_tpu.train import OptParams, from_gaussian_data, init_adam
    from scorp_tpu.train.step import train_step

    n = xyz.shape[0]
    g = GaussianData(
        xyz=np.asarray(xyz),
        f_dc=np.asarray(shs[:, :1]),
        f_rest=np.asarray(shs[:, 1:]),
        opacity=np.log(np.asarray(opacity) / (1 - np.asarray(opacity)))[:, None],
        scaling=np.log(np.asarray(scales)),
        rotation=np.asarray(quats),
    )
    state = from_gaussian_data(g, capacity=n)
    adam = init_adam(state)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, cam.height, cam.width)).astype(np.float32))
    zeros1 = jnp.zeros((1, cam.height, cam.width), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    opt = OptParams()

    def step(state, adam, it):
        return train_step(
            state, adam, cam, gt, zeros1, zeros1, it, bg,
            opt=opt, sh_degree=3, cfg=cfg,
        )

    it = jnp.int32(1000)
    state, adam, metrics = step(state, adam, it)
    jax.block_until_ready(metrics)
    assert int(metrics.num_dropped_keys) == 0, int(metrics.num_dropped_keys)
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, adam, metrics = step(state, adam, it)
    jax.block_until_ready(metrics)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    # the timed steps mutate state via Adam: re-assert the tightly trimmed
    # stream capacity still dropped nothing by the LAST step
    assert int(metrics.num_dropped_keys) == 0, int(metrics.num_dropped_keys)
    print(json.dumps({
        "metric": "train_step_ms_250k_1600x1066",
        "value": round(ms, 2),
        "unit": "ms/iter",
        "vs_baseline": round((1000.0 / ms) / 15.0, 3),  # ~15 it/s CUDA ballpark
    }))
    return ms


def bench_render2d(xyz, shs, scales, quats, opacity, cam, cfg):
    import jax
    import jax.numpy as jnp

    from scorp_tpu.ops.raster.pallas_surfel import rasterize_surfel_pallas_fwd_only

    bg = jnp.zeros(3, jnp.float32)
    s2 = scales[:, :2]

    @jax.jit
    def frame(xyz, shs, s2, quats, opacity):
        out = rasterize_surfel_pallas_fwd_only(
            xyz, opacity, cam, bg, shs=shs, sh_degree=3,
            scales=s2, quats=quats, cfg=cfg,
        )
        return out.color, out.num_dropped_keys

    color, dk = frame(xyz, shs, s2, quats, opacity)
    color.block_until_ready()
    assert int(dk) == 0, int(dk)
    mean = float(jnp.mean(color))
    assert mean > 0.005, f"full-scale 2DGS render is ~black (mean {mean})"
    n_frames = 20
    t0 = time.perf_counter()
    for _ in range(n_frames):
        color, _ = frame(xyz, shs, s2, quats, opacity)
    color.block_until_ready()
    fps = n_frames / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "render2d_fps_250k_1600x1066",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 3),
    }))
    return fps


def bench_train2d_step(xyz, shs, scales, quats, opacity, cam, cfg):
    import jax
    import jax.numpy as jnp

    from scorp_tpu.core.plyio import GaussianData
    from scorp_tpu.train import from_gaussian_data, init_adam
    from scorp_tpu.train.step2d import Opt2DParams, train_step_2d

    n = xyz.shape[0]
    g = GaussianData(
        xyz=np.asarray(xyz),
        f_dc=np.asarray(shs[:, :1]),
        f_rest=np.asarray(shs[:, 1:]),
        opacity=np.log(np.asarray(opacity) / (1 - np.asarray(opacity)))[:, None],
        scaling=np.log(np.asarray(scales[:, :2])),
        rotation=np.asarray(quats),
    )
    state = from_gaussian_data(g, capacity=n)
    adam = init_adam(state)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, cam.height, cam.width)).astype(np.float32))
    zeros1 = jnp.zeros((1, cam.height, cam.width), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    opt = Opt2DParams(lambda_dist=100.0)  # exercise the distortion VJP

    def step(state, adam, it):
        return train_step_2d(
            state, adam, cam, gt, zeros1, zeros1, it, bg,
            opt=opt, sh_degree=3, cfg=cfg,
        )

    it = jnp.int32(8000)  # normal+dist losses active
    state, adam, metrics = step(state, adam, it)
    jax.block_until_ready(metrics)
    assert int(metrics.num_dropped_keys) == 0, int(metrics.num_dropped_keys)
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, adam, metrics = step(state, adam, it)
    jax.block_until_ready(metrics)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    assert int(metrics.num_dropped_keys) == 0, int(metrics.num_dropped_keys)
    print(json.dumps({
        "metric": "train2d_step_ms_250k_1600x1066",
        "value": round(ms, 2),
        "unit": "ms/iter",
        "vs_baseline": round((1000.0 / ms) / 15.0, 3),
    }))
    return ms


def bench_kernel_parity_2d():
    """Compiled-on-device surfel Pallas vs XLA parity (fwd + one VJP)."""
    import jax
    import jax.numpy as jnp

    from scorp_tpu.core.camera import look_at_camera
    from scorp_tpu.core.sh import rgb_to_sh
    from scorp_tpu.ops.raster import RasterConfig
    from scorp_tpu.ops.raster.pallas_surfel_train import rasterize_surfel_pallas
    from scorp_tpu.ops.raster.surfel import rasterize_surfel_xla

    rng = np.random.default_rng(5)
    n = 384
    xyz = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.normal(np.log(0.09), 0.4, (n, 2))).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    shs = jnp.asarray(shs)
    cam = look_at_camera(eye=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0],
                         fovx=0.9, fovy=0.75, width=128, height=96)
    bg = jnp.zeros(3, jnp.float32)
    cfg = RasterConfig(max_keys=1 << 15, tile_list_len=512, chunk=32,
                       pallas_chunk=128)

    def loss(raster):
        def f(xyz, opa):
            out = raster(xyz, opa, cam, bg, shs=shs, sh_degree=3,
                         scales=scales, quats=quats, cfg=cfg)
            return (
                ((out.color - 0.3) ** 2).mean()
                + (out.alpha ** 2).mean()
                + (out.normal ** 2).mean()
                + 0.01 * jnp.abs(out.distortion).mean()
            )
        return f

    lx, gx = jax.jit(jax.value_and_grad(loss(rasterize_surfel_xla)))(xyz, opa)
    lp, gp = jax.jit(jax.value_and_grad(loss(rasterize_surfel_pallas)))(xyz, opa)
    diff = max(float(jnp.abs(lx - lp)), float(jnp.max(jnp.abs(gx - gp))))
    print(json.dumps({
        "metric": "tpu_kernel_parity_2d",
        "value": float(f"{diff:.3g}"),
        "unit": "max_abs_diff (pass < 5e-3)",
        "vs_baseline": 1.0 if diff < 5e-3 else 0.0,
    }))


def bench_kernel_parity():
    """Compiled-on-device Pallas vs XLA parity (fwd color/alpha + one VJP).

    Catches Mosaic lowering regressions that interpreter-mode CPU tests
    cannot see. Runs a tiny scene so it costs only compile time.
    """
    import jax
    import jax.numpy as jnp

    from scorp_tpu.core.camera import look_at_camera
    from scorp_tpu.core.sh import rgb_to_sh
    from scorp_tpu.ops.raster import RasterConfig, rasterize_xla
    from scorp_tpu.ops.raster.pallas import rasterize_pallas

    rng = np.random.default_rng(3)
    n = 512
    xyz = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.normal(np.log(0.08), 0.4, (n, 3))).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    shs = jnp.asarray(shs)
    cam = look_at_camera(eye=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0],
                         fovx=0.9, fovy=0.75, width=128, height=96)
    bg = jnp.zeros(3, jnp.float32)
    cfg = RasterConfig(max_keys=1 << 15, tile_list_len=512, chunk=32,
                       pallas_chunk=128)

    def loss(raster):
        def f(xyz, opa):
            out = raster(xyz, opa, cam, bg, shs=shs, sh_degree=3,
                         scales=scales, quats=quats, cfg=cfg)
            return ((out.color - 0.3) ** 2).mean() + (out.alpha ** 2).mean()
        return f

    lx, gx = jax.jit(jax.value_and_grad(loss(rasterize_xla)))(xyz, opa)
    lp, gp = jax.jit(jax.value_and_grad(loss(rasterize_pallas)))(xyz, opa)
    diff = max(float(jnp.abs(lx - lp)), float(jnp.max(jnp.abs(gx - gp))))

    # MID-SCALE forward parity (50k gaussians, 800x600): kernel bugs that
    # only bite past a size threshold (denormal flushing, DMA misalignment,
    # fixed-point overflow) are invisible to the tiny smoke above
    from scorp_tpu.ops.raster.pallas_fwd import rasterize_pallas_fwd_only

    sc = build_scene(n=50_000, width=800, height=600)
    xyz_m, shs_m, scales_m, quats_m, opa_m, cam_m = sc
    cfg_m = RasterConfig(max_keys=1 << 19, tile_list_len=2048, chunk=64,
                         pallas_chunk=128)

    def color_of(raster):
        return jax.jit(lambda *a: raster(
            a[0], a[4], cam_m, bg, shs=a[1], sh_degree=3,
            scales=a[2], quats=a[3], cfg=cfg_m,
        ).color)(xyz_m, shs_m, scales_m, quats_m, opa_m)

    cx = color_of(rasterize_xla)
    cp = color_of(rasterize_pallas_fwd_only)
    assert float(jnp.mean(cx)) > 0.01, "mid-scale XLA render ~black"
    diff_mid = float(jnp.max(jnp.abs(cx - cp)))
    diff = max(diff, diff_mid)
    print(json.dumps({
        "metric": "tpu_kernel_parity",
        "value": float(f"{diff:.3g}"),
        "unit": "max_abs_diff (pass < 5e-3)",
        "vs_baseline": 1.0 if diff < 5e-3 else 0.0,
    }))

    # SSIM-on-device sanity: near-flat image pairs have true local variance
    # ~1e-6; if the SSIM convolutions silently regress to TPU's default
    # bf16 precision, E[x^2]-mu^2 goes negative past the C2 stabilizer and
    # SSIM leaves [-1, 1] by orders of magnitude (the round-3 all-points-
    # die training bug). Must run COMPILED on the device.
    from scorp_tpu.ops.losses import ssim as _ssim

    rng2 = np.random.default_rng(11)
    flat_a = jnp.asarray(
        0.5 + 1e-3 * rng2.normal(size=(3, 256, 256)).astype(np.float32))
    flat_b = jnp.asarray(
        0.5 + 1e-3 * rng2.normal(size=(3, 256, 256)).astype(np.float32))
    s = float(jax.jit(_ssim)(flat_a, flat_b))
    assert -1.0001 <= s <= 1.0001, f"device SSIM insane on flat images: {s}"


def main():
    from scorp_tpu.render import tuned_raster_config

    # Parity gates FIRST: they are the pass/fail record and must land even
    # if the driver's wall-clock budget kills the throughput loops (round-4
    # BENCH_r04.json was rc=124 with tpu_kernel_parity_2d never printed).
    bench_kernel_parity()
    bench_kernel_parity_2d()

    scene = build_scene()
    # Same builder the trainer apps use (tuned_raster_config), with the
    # capacities trimmed to this scene's measured key counts: max_keys
    # covers the pre-cull expansion (1.72M keys, fixed camera =>
    # deterministic); stream_keys the post-ellipse-cull sorted stream
    # (~1.5M kept). bench_render/bench_train assert zero drops.
    cfg = tuned_raster_config(
        250_000,
        max_keys=(1 << 20) + (1 << 19) + (1 << 18),
        tile_list_len=4096, chunk=64,
        stream_keys=(1 << 20) + (1 << 19),
    )
    fps = bench_render(*scene, cfg)
    ms = bench_train_step(*scene, cfg)
    bench_roofline(scene, cfg, fps, ms)
    # surfel (2DGS) path: no exact-cull drop (the quadratic tile test is
    # not conservative for the homography alpha), so the trim is only
    # capacity slack: measured 1.537M expanded keys on this scene
    # bwd_block_frac 0.85: surfel termination is weaker than 3DGS (flat
    # disks seen near edge-on blend thinner alphas), measured 78.7% covered
    # blocks on this scene vs the 3DGS default's 57% (diag_ncontrib2d.py)
    cfg2d = tuned_raster_config(
        250_000,
        max_keys=(1 << 20) + (1 << 19) + (1 << 18),
        tile_list_len=4096, chunk=64,
        stream_keys=(1 << 20) + (1 << 19) + (1 << 17),
        bwd_block_frac=0.85,
    )
    fps2d = bench_render2d(*scene, cfg2d)
    ms2d = bench_train2d_step(*scene, cfg2d)
    # Final line = the headline (the driver's `parsed` field keeps the last
    # printed metric; round-4's rc=124 run recorded only whatever printed
    # last). All eight metrics above are individual lines in the tail.
    print(json.dumps({
        "metric": "render_fps_250k_1600x1066_headline",
        "value": round(fps, 2),
        "unit": "frames/s (all 8 bench metrics completed)",
        "vs_baseline": round(fps / 100.0, 3),
        "detail": {"train_ms": round(ms, 2), "render2d_fps": round(fps2d, 2),
                   "train2d_ms": round(ms2d, 2)},
    }))


if __name__ == "__main__":
    main()
