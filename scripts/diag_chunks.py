"""Diagnose the composite kernel's actual work: executed chunks per tile
(early termination) vs the static upper bound, from n_contrib stats."""

import sys

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.common import bin_stream, grid_dims, preprocess
from scorp_tpu.ops.raster.pallas_fwd import composite_stream_pallas

if __name__ == "__main__":
    xyz, shs, scales, quats, opacity, cam = build_scene()
    cfg = RasterConfig(max_keys=1 << 21, tile_list_len=4096, chunk=64, pallas_chunk=128)
    w, h = cam.width, cam.height
    tiles_x, tiles_y = grid_dims(w, h)
    bg = jnp.zeros(3, jnp.float32)

    @jax.jit
    def run(xyz, shs, scales, quats, opacity):
        prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                          scales=scales, quats=quats)
        bins = bin_stream(prep, w, h, cfg)
        color, depth, alpha, ncon = composite_stream_pallas(
            bins, bg, w, h, cfg, track_ncontrib=True)
        return bins.tile_start, bins.tile_count, ncon

    ts, tc, ncon = run(xyz, shs, scales, quats, opacity)
    ts = np.asarray(ts); tc = np.asarray(tc)
    ncon = np.asarray(ncon)[:, 0, :]  # [T, P]
    head = ts % 128
    C = cfg.pallas_chunk
    static_chunks = np.ceil((head + tc) / C)
    max_ncon = ncon.max(axis=1)
    # executed chunks ~ until every pixel saturated or stream exhausted
    exec_chunks = np.minimum(static_chunks, np.floor((head + max_ncon) / C) + 1)
    exec_chunks = np.where(tc > 0, exec_chunks, 0)
    print(f"tiles {tiles_x * tiles_y}, keys {tc.sum()}")
    print(f"static chunk iterations: {int(static_chunks[tc > 0].sum())}")
    print(f"executed chunk iterations (est): {int(exec_chunks.sum())}")
    print(f"mean keys/tile {tc.mean():.0f}; mean n_contrib (px) {ncon.mean():.1f}; "
          f"mean max-n_contrib/tile {max_ncon.mean():.1f}")
    print(f"exec chunks/tile: mean {exec_chunks.mean():.2f} "
          f"p50 {np.percentile(exec_chunks, 50):.0f} p99 {np.percentile(exec_chunks, 99):.0f}")
