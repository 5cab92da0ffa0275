"""Per-fusion cost breakdown of render (and optionally train) via
jax.profiler trace events (per-fusion times are trustworthy through the
axon tunnel, unlike isolated micro-benchmarks)."""

import glob
import gzip
import json
import sys
import time

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.common import bin_stream, preprocess
import scorp_tpu.ops.raster.pallas_fwd as pf

MODE = sys.argv[1] if len(sys.argv) > 1 else "render"

xyz, shs, scales, quats, opacity, cam = build_scene()
# match bench.py's tuned config (incl. bwd_block_frac: without it the
# profile shows the full-scatter fallback bench never takes)
import os as _os
cfg = RasterConfig(max_keys=(1 << 20) + (1 << 19) + (1 << 18),
                   tile_list_len=4096, chunk=64,
                   pallas_chunk=int(_os.environ.get("PC", "128")),
                   stream_keys=(1 << 20) + (1 << 19),
                   bwd_block_frac=0.66)
w, h = cam.width, cam.height
bg = jnp.zeros(3, jnp.float32)

if MODE in ("render", "render_nc"):
    # render_nc: the SAME eval pipeline but with the train-mode forward
    # body (track_ncontrib=True) — isolates the train-vs-render fwd-kernel
    # gap (VERDICT round-4 weak #5) on identical streams
    track = MODE == "render_nc"

    @jax.jit
    def step(xyz, shs, scales, quats, opacity):
        prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                          scales=scales, quats=quats)
        bins = bin_stream(prep, w, h, cfg)
        return pf.composite_stream_pallas(bins, bg, w, h, cfg,
                                          track_ncontrib=track)[0]

    args = (xyz, shs, scales, quats, opacity)
elif MODE == "render2d":
    from scorp_tpu.ops.raster.pallas_surfel import rasterize_surfel_pallas_fwd_only

    s2 = jnp.concatenate([scales[:, :2], jnp.zeros_like(scales[:, :1])], axis=1)

    @jax.jit
    def step(xyz, shs, scales, quats, opacity):
        return rasterize_surfel_pallas_fwd_only(
            xyz, opacity, cam, bg, shs=shs, sh_degree=3,
            scales=scales, quats=quats, cfg=cfg,
        ).color

    args = (xyz, shs, s2, quats, opacity)
elif MODE == "train2d":
    import numpy as np

    from scorp_tpu.core.plyio import GaussianData
    from scorp_tpu.train import from_gaussian_data, init_adam
    from scorp_tpu.train.step2d import Opt2DParams, train_step_2d

    cfg = cfg._replace(stream_keys=(1 << 20) + (1 << 19) + (1 << 17),
                       bwd_block_frac=0.85)
    n = xyz.shape[0]
    g = GaussianData(
        xyz=np.asarray(xyz), f_dc=np.asarray(shs[:, :1]),
        f_rest=np.asarray(shs[:, 1:]),
        opacity=np.log(np.asarray(opacity) / (1 - np.asarray(opacity)))[:, None],
        scaling=np.log(np.asarray(scales[:, :2])), rotation=np.asarray(quats),
    )
    state = from_gaussian_data(g, capacity=n)
    adam = init_adam(state)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    zeros1 = jnp.zeros((1, h, w), jnp.float32)
    opt = Opt2DParams(lambda_dist=100.0)

    @jax.jit
    def _step2(state, adam, it):
        return train_step_2d(state, adam, cam, gt, zeros1, zeros1, it, bg,
                             opt=opt, sh_degree=3, cfg=cfg)

    it = jnp.int32(8000)

    def step(*a):
        return _step2(state, adam, it)[2].loss

    args = ()
else:
    import numpy as np

    from scorp_tpu.core.plyio import GaussianData
    from scorp_tpu.train import OptParams, from_gaussian_data, init_adam
    from scorp_tpu.train.step import train_step

    n = xyz.shape[0]
    g = GaussianData(
        xyz=np.asarray(xyz), f_dc=np.asarray(shs[:, :1]),
        f_rest=np.asarray(shs[:, 1:]),
        opacity=np.log(np.asarray(opacity) / (1 - np.asarray(opacity)))[:, None],
        scaling=np.log(np.asarray(scales)), rotation=np.asarray(quats),
    )
    state = from_gaussian_data(g, capacity=n)
    adam = init_adam(state)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    zeros1 = jnp.zeros((1, h, w), jnp.float32)
    opt = OptParams()

    @jax.jit
    def _step(state, adam, it):
        return train_step(state, adam, cam, gt, zeros1, zeros1, it, bg,
                          opt=opt, sh_degree=3, cfg=cfg)

    it = jnp.int32(1000)

    def step(*a):
        return _step(state, adam, it)[2].loss

    args = ()

out = step(*args)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5):
    out = step(*args)
jax.block_until_ready(out)
print(f"wall: {(time.perf_counter() - t0) / 5 * 1e3:.2f} ms")

with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        out = step(*args)
    jax.block_until_ready(out)

# parse the trace: aggregate TPU op durations by name
paths = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True))
trace = json.load(gzip.open(paths[-1]))
events = {}
for e in trace.get("traceEvents", []):
    if e.get("ph") != "X" or "dur" not in e:
        continue
    pid_name = e.get("pid")
    name = e.get("name", "")
    # keep XLA op events (device lanes)
    args_d = e.get("args") or {}
    if "long_name" in args_d or "tf_op" in args_d or name.startswith("%"):
        key = name
        events.setdefault(key, [0.0, ""])
        events[key][0] += e["dur"]
        if not events[key][1]:
            events[key][1] = str(args_d.get("long_name", ""))[:160]
# top 25 by time (dur in us, 3 steps)
ranked = sorted(events.items(), key=lambda kv: -kv[1][0])
for name, (us, long_name) in ranked[:25]:
    print(f"{us / 3 / 1e3:8.3f} ms  {name[:60]}  {long_name}")
tail = sum(us for _, (us, _) in ranked[25:])
total = sum(us for _, (us, _) in ranked)
print(f"   ---    {len(ranked) - 25} more ops: {tail / 3 / 1e3:.3f} ms; "
      f"device total {total / 3 / 1e3:.3f} ms")
