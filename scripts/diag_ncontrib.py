"""Measure how much of the training stream is dead for backward.

The bwd kernel only writes gradient blocks up to each tile's max n_contrib
(post-termination keys contribute zero), but the scatter-add still
processes every K_pad row. This prints, on the bench scene:
  * kept keys (sum tile_count)
  * active keys (sum over tiles of min(max ncontrib, count))
  * chunk blocks total vs blocks intersecting any tile's active range
to size the win from compacting kept blocks before the scatter.
"""

import sys
import time

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.common import bin_stream, preprocess
from scorp_tpu.ops.raster.pallas_fwd import composite_stream_pallas

xyz, shs, scales, quats, opacity, cam = build_scene()
cfg = RasterConfig(max_keys=(1 << 20) + (1 << 19) + (1 << 18),
                   tile_list_len=4096, chunk=64,
                   pallas_chunk=128, stream_keys=(1 << 20) + (1 << 19))
w, h = cam.width, cam.height
bg = jnp.zeros(3, jnp.float32)
chunk = cfg.pallas_chunk
k2 = cfg.stream_cap
k_pad = -(-k2 // chunk) * chunk
n_blocks = k_pad // chunk


@jax.jit
def stats(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                      scales=scales, quats=quats)
    bins = bin_stream(prep, w, h, cfg)
    _, _, _, ncon = composite_stream_pallas(bins, bg, w, h, cfg,
                                            track_ncontrib=True)
    start, count = bins.tile_start, bins.tile_count  # [T]
    m = jnp.minimum(jnp.max(ncon[:, 0, :], axis=1), count)  # [T]
    kept = jnp.sum(count)
    active = jnp.sum(m)
    # block union of active ranges [start, start+m): interval diff trick
    lo_b = start // chunk
    hi_b = (start + m - 1) // chunk + 1  # exclusive, only valid if m > 0
    diff = jnp.zeros(n_blocks + 1, jnp.int32)
    ones = (m > 0).astype(jnp.int32)
    diff = diff.at[jnp.where(m > 0, lo_b, n_blocks)].add(ones, mode="drop")
    diff = diff.at[jnp.where(m > 0, hi_b, n_blocks + 1)].add(-ones, mode="drop")
    covered = jnp.cumsum(diff[:-1]) > 0
    blocks_active = jnp.sum(covered.astype(jnp.int32))
    blocks_total_used = jnp.sum(
        (jnp.cumsum(
            jnp.zeros(n_blocks + 1, jnp.int32)
            .at[jnp.where(count > 0, lo_b, n_blocks)].add(
                (count > 0).astype(jnp.int32), mode="drop")
            .at[jnp.where(count > 0, (start + count - 1) // chunk + 1,
                          n_blocks + 1)].add(
                -(count > 0).astype(jnp.int32), mode="drop")[:-1]
        ) > 0).astype(jnp.int32)
    )
    # sub-block coverage: union of [start, start+m) at finer granularities
    subs = []
    for g in (64, 32):
        nb = k_pad // g
        lo = start // g
        hi = (start + m - 1) // g + 1
        d = (jnp.zeros(nb + 1, jnp.int32)
             .at[jnp.where(m > 0, lo, nb)].add(ones, mode="drop")
             .at[jnp.where(m > 0, hi, nb + 1)].add(-ones, mode="drop"))
        subs.append(jnp.sum((jnp.cumsum(d[:-1]) > 0).astype(jnp.int32)))
    return kept, active, blocks_active, blocks_total_used, subs[0], subs[1]


t0 = time.perf_counter()
kept, active, blocks_active, blocks_used, sub64, sub32 = jax.block_until_ready(
    stats(xyz, shs, scales, quats, opacity))
print(f"compile+run {time.perf_counter() - t0:.1f}s")
kept, active = int(kept), int(active)
ba, bu = int(blocks_active), int(blocks_used)
print(f"kept keys            {kept}")
print(f"active keys (bwd)    {active}  ({active / kept:.1%} of kept)")
print(f"blocks total (K_pad) {n_blocks}")
print(f"blocks used (stream) {bu}")
print(f"blocks active (bwd)  {ba}  ({ba / n_blocks:.1%} of K_pad, "
      f"{ba / max(bu, 1):.1%} of used)")
print(f"scatter rows now     {k_pad}  -> compacted {ba * chunk}"
      f"  (est {k_pad * 15e-6:.1f} ms -> {ba * chunk * 15e-6:.1f} ms)")

s64, s32 = int(sub64), int(sub32)
print(f"sub-blocks g=64: {s64} of {k_pad // 64} "
      f"({100 * s64 * 64 / k_pad:.1f}% of K_pad rows)")
print(f"sub-blocks g=32: {s32} of {k_pad // 32} "
      f"({100 * s32 * 32 / k_pad:.1f}% of K_pad rows)")
