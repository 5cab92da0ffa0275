"""Stage-cost breakdown of the CURRENT eval render pipeline on the TPU.

Times cumulative prefixes of the real path (preprocess -> Pallas expansion
kernel -> packed single-operand sort -> tile bounds -> u16 stream gather ->
composite kernel); stage cost = difference of adjacent prefixes. Prefix
programs are realistic jits (micro-benchmarks through the axon tunnel lie).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402


def timeit(fn, args, n=20):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from scorp_tpu.ops.raster import RasterConfig
    from scorp_tpu.ops.raster import pallas_expand as pe
    from scorp_tpu.ops.raster.common import (
        DATA_ROWS,
        DATA_ROWS_PADDED,
        _tile_bounds,
        bin_stream,
        fast_gather_rows,
        grid_dims,
        preprocess,
    )
    from scorp_tpu.ops.raster.pallas_fwd import composite_stream_pallas

    xyz, shs, scales, quats, opacity, cam = build_scene()
    cfg = RasterConfig(max_keys=1 << 21, tile_list_len=4096, chunk=64,
                       pallas_chunk=128, stream_keys=(1 << 20) + (1 << 19))
    bg = jnp.zeros(3, jnp.float32)
    w, h = cam.width, cam.height
    tiles_x, tiles_y = grid_dims(w, h)
    num_tiles = tiles_x * tiles_y

    def prep_fn(xyz, shs, scales, quats, opacity):
        return preprocess(
            xyz, opacity, cam, shs=shs, sh_degree=3, scales=scales, quats=quats
        )

    def expand_fn(xyz, shs, scales, quats, opacity):
        prep = prep_fn(xyz, shs, scales, quats, opacity)
        return pe.expand_sorted_keys(prep, w, h, cfg.max_keys, cull=True)

    def sort_fn(xyz, shs, scales, quats, opacity):
        prep = prep_fn(xyz, shs, scales, quats, opacity)
        packed, order, total, kept, bits_g, _ = pe.expand_sorted_keys(
            prep, w, h, cfg.max_keys, cull=True)
        return jax.lax.sort(packed, is_stable=False), order

    def bins_fn(xyz, shs, scales, quats, opacity):
        prep = prep_fn(xyz, shs, scales, quats, opacity)
        return bin_stream(prep, w, h, cfg)

    def full_fn(xyz, shs, scales, quats, opacity):
        prep = prep_fn(xyz, shs, scales, quats, opacity)
        bins = bin_stream(prep, w, h, cfg)
        return composite_stream_pallas(bins, bg, w, h, cfg)

    args = (xyz, shs, scales, quats, opacity)
    stages = [
        ("preprocess", jax.jit(prep_fn)),
        ("`+expand kernel", jax.jit(expand_fn)),
        ("`+packed sort", jax.jit(sort_fn)),
        ("`+gather+bounds (bin_stream)", jax.jit(bins_fn)),
        ("`+composite (full)", jax.jit(full_fn)),
    ]
    prev = 0.0
    for name, fn in stages:
        ms = timeit(fn, args)
        print(f"{name:36s} {ms:8.2f} ms   (delta {ms - prev:+7.2f})")
        prev = ms

    bins = jax.jit(bins_fn)(*args)
    total_keys = int(jnp.sum(bins.tile_count))
    counts = np.asarray(bins.tile_count)
    print(f"kept keys: {total_keys}  (stream cap {cfg.stream_cap}, "
          f"expansion cap {cfg.max_keys})")
    print(f"tiles: {tiles_x}x{tiles_y}={num_tiles}, "
          f"keys/tile mean {counts.mean():.0f} max {counts.max()} "
          f"p99 {np.percentile(counts, 99):.0f}")
    prep = jax.jit(prep_fn)(*args)
    print(f"valid gaussians: {int(jnp.sum(prep.valid))} / {xyz.shape[0]}")

    _, _, total, kept, _, _ = jax.jit(expand_fn)(*args)
    print(f"ellipse-tile cull: keep {int(kept)} / {int(total)} "
          f"({100.0 * int(kept) / max(int(total), 1):.1f}%)")
    n_chunks = np.ceil(((np.asarray(bins.tile_start) % 128) + counts) / cfg.pallas_chunk)
    print(f"fwd chunk iterations: {int(n_chunks.sum())} (chunk={cfg.pallas_chunk})")
