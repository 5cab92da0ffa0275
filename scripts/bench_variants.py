"""Full-pipeline timing of binning variants (trustworthy: large jitted programs)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.common import (
    DATA_ROWS,
    DATA_ROWS_PADDED,
    StreamBins,
    _expand_keys_core,
    _tile_bounds,
    bin_stream,
    grid_dims,
    preprocess,
)
from scorp_tpu.ops.raster.pallas_fwd import composite_stream_pallas


def timeit(fn, args, n=20):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


xyz, shs, scales, quats, opacity, cam = build_scene()
cfg = RasterConfig(max_keys=1 << 21, tile_list_len=4096, chunk=64, pallas_chunk=256)
bg = jnp.zeros(3, jnp.float32)
w, h = cam.width, cam.height
tiles_x, tiles_y = grid_dims(w, h)
num_tiles = tiles_x * tiles_y


def make_table(prep):
    n = prep.xy.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return jnp.concatenate(
        [
            prep.xy, prep.conic, prep.color, prep.opacity[:, None],
            prep.depth[:, None],
            jax.lax.bitcast_convert_type(iota, jnp.float32),
        ],
        axis=1,
    )


def v0_current(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3, scales=scales, quats=quats)
    bins = bin_stream(prep, w, h, cfg)
    return composite_stream_pallas(bins, bg, w, h, cfg)[0]


def v1_payload_sort(xyz, shs, scales, quats, opacity):
    """Monotone gather to expansion order, then sort all payload columns."""
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3, scales=scales, quats=quats)
    tile, g_of_k, order, total = _expand_keys_core(prep, w, h, cfg.max_keys)
    table = make_table(prep)[order]  # [N, 11] depth-ordered
    exp_rows = table[jnp.maximum(g_of_k, 0)]  # [K, 11] monotone gather
    ops = (tile,) + tuple(exp_rows[:, i] for i in range(DATA_ROWS + 1))
    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    sorted_tile = s[0]
    data = jnp.concatenate(
        [
            jnp.stack(s[1 : DATA_ROWS + 1], axis=0),
            jnp.zeros((DATA_ROWS_PADDED - DATA_ROWS, cfg.max_keys), jnp.float32),
        ],
        axis=0,
    )
    tile_start, tile_count = _tile_bounds(sorted_tile, num_tiles)
    bins = StreamBins(data, jax.lax.bitcast_convert_type(s[DATA_ROWS + 1], jnp.int32),
                      tile_start, tile_count, jnp.int32(0))
    return composite_stream_pallas(bins, bg, w, h, cfg)[0]


def v2_expand_only(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3, scales=scales, quats=quats)
    tile, g_of_k, order, total = _expand_keys_core(prep, w, h, cfg.max_keys)
    return tile.sum() + g_of_k.sum() + order.sum() + total


def v3_monotone_gather(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3, scales=scales, quats=quats)
    tile, g_of_k, order, total = _expand_keys_core(prep, w, h, cfg.max_keys)
    table = make_table(prep)[order]
    exp_rows = table[jnp.maximum(g_of_k, 0)]
    return exp_rows.sum() + tile.sum()


def v4_sort_after_monotone(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3, scales=scales, quats=quats)
    tile, g_of_k, order, total = _expand_keys_core(prep, w, h, cfg.max_keys)
    table = make_table(prep)[order]
    exp_rows = table[jnp.maximum(g_of_k, 0)]
    ops = (tile,) + tuple(exp_rows[:, i] for i in range(DATA_ROWS + 1))
    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return sum(x.sum() for x in s)


args = (xyz, shs, scales, quats, opacity)
for name, fn in [
    ("v0 current full", v0_current),
    ("v2 expand only", v2_expand_only),
    ("v3 expand+monotone gather", v3_monotone_gather),
    ("v4 v3+payload sort", v4_sort_after_monotone),
    ("v1 payload-sort full", v1_payload_sort),
]:
    ms = timeit(jax.jit(fn), args)
    print(f"{name:30s} {ms:8.2f} ms")

# sanity: v1 == v0 output
o0 = jax.jit(v0_current)(*args)
o1 = jax.jit(v1_payload_sort)(*args)
print("max |v1-v0|:", float(jnp.max(jnp.abs(o0 - o1))))
