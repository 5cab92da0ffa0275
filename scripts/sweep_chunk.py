"""Quick on-device sweep of pallas_chunk for the render path."""

import sys
import time

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.common import bin_stream, preprocess
import scorp_tpu.ops.raster.pallas_fwd as pf

xyz, shs, scales, quats, opacity, cam = build_scene()
w, h = cam.width, cam.height
bg = jnp.zeros(3, jnp.float32)

for chunk in (128, 256):
    cfg = RasterConfig(max_keys=(1 << 20) + (1 << 19) + (1 << 18),
                       tile_list_len=4096, chunk=64,
                       pallas_chunk=chunk, stream_keys=(1 << 20) + (1 << 19))

    @jax.jit
    def step(xyz, shs, scales, quats, opacity, cfg=cfg):
        prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                          scales=scales, quats=quats)
        bins = bin_stream(prep, w, h, cfg)
        return pf.composite_stream_pallas(bins, bg, w, h, cfg,
                                          track_ncontrib=False)[0]

    args = (xyz, shs, scales, quats, opacity)
    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = step(*args)
    jax.block_until_ready(out)
    print(f"pallas_chunk={chunk}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")
