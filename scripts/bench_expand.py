"""Expansion restructure + composite chunk-size measurements (full programs)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.common import (
    _expand_keys_core,
    bin_stream,
    gather_rows_u16,
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
w, h = cam.width, cam.height
K = 1 << 21
tiles_x, tiles_y = grid_dims(w, h)
num_tiles = tiles_x * tiles_y


def prep_fn(*a):
    return preprocess(a[0], a[4], cam, shs=a[1], sh_degree=3, scales=a[2], quats=a[3])


def expand_v2(prep, k_cap):
    """marker scatter + cumsum + one u16 gather for (start, packed)."""
    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf), stable=True)
    rect = prep.rect[order]
    valid = prep.valid[order]
    x0, y0, x1, y1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    span = x1 - x0
    counts = jnp.where(valid, span * (y1 - y0), 0)
    starts = jnp.cumsum(counts) - counts
    total = starts[-1] + counts[-1]

    has_keys = counts > 0
    pos = jnp.where(has_keys, starts, k_cap)
    marker = jnp.zeros(k_cap, jnp.int32).at[pos].add(1, mode="drop")
    g_of_k = jnp.cumsum(marker) - 1

    packed = (x0 << 20) | (y0 << 10) | span
    tbl = jnp.stack([starts.astype(jnp.int32), packed], axis=1)  # [N,2] i32
    tbl_f = jax.lax.bitcast_convert_type(tbl, jnp.float32)
    rows = gather_rows_u16(tbl_f, jnp.maximum(g_of_k, 0))
    rows_i = jax.lax.bitcast_convert_type(rows, jnp.int32)
    start_of_k = rows_i[:, 0]
    packed_of_k = rows_i[:, 1]

    ks = jax.lax.broadcasted_iota(jnp.int32, (k_cap, 1), 0)[:, 0]
    local = ks - start_of_k
    kx0 = packed_of_k >> 20
    ky0 = (packed_of_k >> 10) & 1023
    kspan = jnp.maximum(packed_of_k & 1023, 1)
    tile = (ky0 + local // kspan) * tiles_x + (kx0 + local % kspan)
    in_range = (ks < jnp.minimum(total, k_cap)) & (g_of_k >= 0)
    tile = jnp.where(in_range, tile, num_tiles)
    return tile, g_of_k, order, total


def f_exp_v1(*a):
    prep = prep_fn(*a)
    t, g, o, tot = _expand_keys_core(prep, w, h, K)
    return t.sum() + g.sum() + o.sum() + tot


def f_exp_v2(*a):
    prep = prep_fn(*a)
    t, g, o, tot = expand_v2(prep, K)
    return t.sum() + g.sum() + o.sum() + tot


def f_exp_check(*a):
    prep = prep_fn(*a)
    t1, g1, o1, tot1 = _expand_keys_core(prep, w, h, K)
    t2, g2, o2, tot2 = expand_v2(prep, K)
    return (jnp.sum(jnp.abs(t1 - t2)), jnp.sum(jnp.abs(g1 - g2)), tot1 - tot2)


args = (xyz, shs, scales, quats, opacity)
print("check v2==v1:", [int(x) for x in jax.jit(f_exp_check)(*args)])
print(f"{'pre+expand v1':28s} {timeit(jax.jit(f_exp_v1), args):8.2f} ms")
print(f"{'pre+expand v2':28s} {timeit(jax.jit(f_exp_v2), args):8.2f} ms")

# composite chunk size sweep (full render)
for chunk in (128, 256, 512):
    cfg = RasterConfig(max_keys=K, tile_list_len=4096, chunk=64, pallas_chunk=chunk)

    def full(*a, cfg=cfg):
        prep = prep_fn(*a)
        bins = bin_stream(prep, w, h, cfg)
        return composite_stream_pallas(bins, bg=jnp.zeros(3), width=w, height=h, cfg=cfg)[0]

    print(f"full render chunk={chunk:4d}       {timeit(jax.jit(full), args):8.2f} ms")
