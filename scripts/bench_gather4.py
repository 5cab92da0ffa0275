"""u16 gather cost vs SOURCE table size (embedded in the real pipeline
prefix, which produces trustworthy timings through the tunnel)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster.common import _expand_keys_core, preprocess

xyz, shs, scales, quats, opacity, cam = build_scene()
w, h = cam.width, cam.height
K = 1 << 21


def timeit(fn, args, n=15):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def base(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                      scales=scales, quats=quats)
    tile, g_of_k, order, total, *_ = _expand_keys_core(prep, w, h, K)
    st, g = jax.lax.sort((tile, jnp.maximum(g_of_k, 0)), num_keys=1,
                         is_stable=True)
    return prep, st, g, tile


def nog(*a):
    prep, st, g, tile = base(*a)
    return st.sum() + g.sum() + prep.xy.sum()


def with_u16_gather(rows, width_f32, sort_idx=False):
    def fn(*a):
        prep, st, g, tile = base(*a)
        # big source table built in-program (columns replicated from prep)
        src = jnp.tile(
            jnp.concatenate([prep.xy, prep.conic, prep.color,
                             prep.opacity[:, None], prep.depth[:, None],
                             prep.xy, prep.conic, prep.xy[:, :1]], axis=1
                            )[:, :width_f32],
            (rows // prep.xy.shape[0] + 1, 1),
        )[:rows]
        idx = jnp.clip(g * (rows // 250000 + 1), 0, rows - 1)
        if sort_idx:
            idx = jax.lax.sort(idx)
        t16 = jax.lax.bitcast_convert_type(src, jnp.uint16).reshape(rows, -1)
        out = t16[idx]
        return out.sum() + st.sum()
    return fn


args = (xyz, shs, scales, quats, opacity)
b = timeit(jax.jit(nog), args)
print(f"{'prefix (no gather)':46s} {b:8.2f} ms")
for rows, wf in [(250_000, 11), (250_000, 16), (500_000, 16), (1_000_000, 16),
                 (2_000_000, 16), (4_000_000, 16)]:
    ms = timeit(jax.jit(with_u16_gather(rows, wf)), args)
    mb = rows * wf * 4 / 1e6
    print(f"u16 gather 2M rows from [{rows},{wf}] ({mb:.0f}MB)    {ms - b:8.2f} ms")
ms = timeit(jax.jit(with_u16_gather(4_000_000, 16, sort_idx=True)), args)
print(f"u16 gather 2M SORTED idx from [4M,16] (256MB) {ms - b:8.2f} ms")
