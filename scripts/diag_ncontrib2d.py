"""Surfel (2DGS) twin of diag_ncontrib.py: measure how much of the
training stream the backward scatter actually needs.

Prints, on the bench scene with bench.py's cfg2d: kept keys, active keys
(per-tile min(max n_contrib, count)), and covered chunk blocks vs K_pad —
to size bwd_block_frac for the surfel path (the 3DGS-measured 0.66 default
falls back to the full scatter if surfel termination is weaker).
"""

import sys
import time

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.common import gather_rows_u16_t
from scorp_tpu.ops.raster.pallas import _compact_routing
from scorp_tpu.ops.raster.pallas_surfel import SURFEL_ROWS
from scorp_tpu.ops.raster.pallas_surfel_train import (
    SURFEL_COLS,
    _surfel_train_fwd_call,
)
from scorp_tpu.ops.raster.surfel import (
    _surfel_prep_to_common,
    preprocess_surfel,
    surfel_adj,
    surfel_cull_ellipses,
)

xyz, shs, scales, quats, opacity, cam = build_scene()
cfg = RasterConfig(max_keys=(1 << 20) + (1 << 19) + (1 << 18),
                   tile_list_len=4096, chunk=64, pallas_chunk=128,
                   stream_keys=(1 << 20) + (1 << 19) + (1 << 17))
w, h = cam.width, cam.height
bg = jnp.zeros(3, jnp.float32)
chunk = cfg.pallas_chunk
k2 = cfg.stream_cap
k_pad = -(-k2 // chunk) * chunk
n_blocks = k_pad // chunk


@jax.jit
def stats(xyz, shs, scales, quats, opacity):
    prep = preprocess_surfel(xyz, opacity, cam, shs=shs, sh_degree=3,
                             scales=scales[:, :2], quats=quats)
    prep_sg = jax.lax.stop_gradient(_surfel_prep_to_common(prep))
    ell, circ = surfel_cull_ellipses(prep)
    extra = jnp.concatenate(
        [surfel_adj(prep.M), prep.zrow, prep.xy,
         prep.color, prep.normal, prep.opacity[:, None]], axis=1)
    g_pad, _, tile_start, tile_count, _, _, table = _compact_routing(
        prep_sg, w, h, cfg, cull=True,
        geo1=jax.lax.stop_gradient(ell), geo2=jax.lax.stop_gradient(circ),
        extra=extra)
    key_cols = gather_rows_u16_t(table, g_pad)
    data = jnp.concatenate(
        [key_cols, jnp.zeros((SURFEL_ROWS - SURFEL_COLS, k2), jnp.float32)],
        axis=0)
    data = jnp.concatenate(
        [data, jnp.zeros((SURFEL_ROWS, chunk), jnp.float32)], axis=1)
    outs = _surfel_train_fwd_call(data, tile_start, tile_count, bg,
                                  width=w, height=h, cfg=cfg)
    ncon = outs[6]  # [T, 1, P] i32
    start, count = tile_start, tile_count
    m = jnp.minimum(jnp.max(ncon[:, 0, :], axis=1), count)
    kept = jnp.sum(count)
    active = jnp.sum(m)
    lo_b = start // chunk
    hi_b = (start + m - 1) // chunk + 1
    ones = (m > 0).astype(jnp.int32)
    diff = (jnp.zeros(n_blocks + 1, jnp.int32)
            .at[jnp.where(m > 0, lo_b, n_blocks + 1)].add(ones, mode="drop")
            .at[jnp.where(m > 0, hi_b, n_blocks + 1)].add(-ones, mode="drop"))
    covered = jnp.cumsum(diff[:-1]) > 0
    blocks_active = jnp.sum(covered.astype(jnp.int32))
    subs = []
    for g in (64, 32):
        nb = k_pad // g
        lo = start // g
        hi = (start + m - 1) // g + 1
        d = (jnp.zeros(nb + 1, jnp.int32)
             .at[jnp.where(m > 0, lo, nb)].add(ones, mode="drop")
             .at[jnp.where(m > 0, hi, nb + 1)].add(-ones, mode="drop"))
        subs.append(jnp.sum((jnp.cumsum(d[:-1]) > 0).astype(jnp.int32)))
    return kept, active, blocks_active, subs[0], subs[1]


t0 = time.perf_counter()
kept, active, blocks_active, sub64, sub32 = jax.block_until_ready(
    stats(xyz, shs, scales, quats, opacity))
print(f"compile+run {time.perf_counter() - t0:.1f}s")
kept, active, ba = int(kept), int(active), int(blocks_active)
print(f"kept keys            {kept}")
print(f"active keys (bwd)    {active}  ({active / kept:.1%} of kept)")
print(f"blocks total (K_pad) {n_blocks}")
print(f"blocks active (bwd)  {ba}  ({ba / n_blocks:.1%} of K_pad)")
print(f"scatter rows now     {k_pad}  -> compacted {ba * chunk}"
      f"  (est {k_pad * 15e-6:.1f} ms -> {ba * chunk * 15e-6:.1f} ms)")

s64, s32 = int(sub64), int(sub32)
print(f"sub-blocks g=64: {s64} of {k_pad // 64} "
      f"({100 * s64 * 64 / k_pad:.1f}% of K_pad rows)")
print(f"sub-blocks g=32: {s32} of {k_pad // 32} "
      f"({100 * s32 * 32 / k_pad:.1f}% of K_pad rows)")
