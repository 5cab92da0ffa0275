"""Isolate the full-scale expansion breakage: check the mixed gather's
outputs and the coarse g_lo against golden XLA forms on device."""

import sys

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

from scorp_tpu.ops.raster.common import (
    default_cull_geo,
    gather_rows_mixed,
    preprocess,
)

xyz, shs, scales, quats, opacity, cam = build_scene()
w, h = cam.width, cam.height


@jax.jit
def parts(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                      scales=scales, quats=quats)
    n = prep.xy.shape[0]
    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf), stable=True)
    geo = default_cull_geo(prep)
    extra = jnp.concatenate(
        [prep.xy, prep.conic, prep.color, prep.opacity[:, None],
         prep.depth[:, None]], axis=1)

    aux_parts = [prep.rect.astype(jnp.uint16)]
    g16 = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(geo), jnp.uint16).reshape(n, 12)
    aux_parts.append(g16)
    aux16 = jnp.concatenate(aux_parts, axis=1)
    extra_sorted, aux_sorted = gather_rows_mixed(extra, aux16, order)

    rect = aux_sorted[:, :4].astype(jnp.int32)
    geo_s = jax.lax.bitcast_convert_type(
        aux_sorted[:, 4:16].reshape(n, 6, 2), jnp.float32)

    # golden forms
    rect_g = prep.rect.astype(jnp.uint16)[order].astype(jnp.int32)
    geo_g = geo[order]
    extra_g = extra[order]

    x0, y0, x1, y1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    counts = (x1 - x0) * (y1 - y0)
    starts = jnp.cumsum(counts) - counts
    total = starts[-1] + counts[-1]

    # coarse vs full g_lo at the kernel's consumption form
    n_blocks = 14336
    ks = jnp.arange(n_blocks, dtype=jnp.int32) * 128
    g_full = jnp.clip(
        jnp.searchsorted(starts, ks, side="right", method="sort") - 1, 0, n - 1)
    base_full = (g_full // 128) * 128
    coarse = starts[::128]
    win_blk = jnp.searchsorted(coarse, ks, side="right", method="sort") - 1
    base_coarse = jnp.clip(win_blk, 0, (n - 1) // 128) * 128

    return dict(
        rect_diff=jnp.max(jnp.abs(rect - rect_g)),
        geo_diff=jnp.max(jnp.abs(geo_s - geo_g)),
        extra_diff=jnp.max(jnp.abs(extra_sorted - extra_g)),
        base_diff=jnp.max(jnp.abs(base_full - base_coarse)),
        total=total,
    )


out = parts(xyz, shs, scales, quats, opacity)
for k, v in out.items():
    print(k, np.asarray(v))
