"""Gather cost scaling (rows vs bytes) inside the full render program."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.common import _expand_keys_core, grid_dims, preprocess


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


def base(k_cap):
    def fn(xyz, shs, scales, quats, opacity):
        prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                          scales=scales, quats=quats)
        tile, g_of_k, order, total = _expand_keys_core(prep, w, h, k_cap)
        st, g = jax.lax.sort((tile, jnp.maximum(g_of_k, 0)), num_keys=1,
                             is_stable=True)
        return prep, st, g
    return fn


def with_gather(k_cap, ncols, dtype=jnp.float32):
    b = base(k_cap)

    def fn(xyz, shs, scales, quats, opacity):
        prep, st, g = b(xyz, shs, scales, quats, opacity)
        n = prep.xy.shape[0]
        tbl = jnp.concatenate(
            [prep.xy, prep.conic, prep.color, prep.opacity[:, None],
             prep.depth[:, None], prep.xy, prep.conic],
            axis=1,
        )[:, :ncols].astype(dtype)
        rows = tbl[g]
        return rows.sum() + st.sum()
    return fn


args = (xyz, shs, scales, quats, opacity)


def run(name, fn):
    print(f"{name:44s} {timeit(jax.jit(fn), args):8.2f} ms")


def nogather(k_cap):
    b = base(k_cap)

    def fn(*a):
        prep, st, g = b(*a)
        return st.sum() + g.sum() + prep.xy.sum()
    return fn


run("pre+expand+sort cap=2M (no gather)", nogather(1 << 21))
for ncols in (4, 8, 11, 16):
    run(f"  + gather [2M,{ncols}] f32", with_gather(1 << 21, ncols))
run("  + gather [2M,11] bf16", with_gather(1 << 21, 11, jnp.bfloat16))
run("pre+expand+sort cap=1.25M (no gather)", nogather(5 << 18))
run("  + gather [1.25M,11] f32", with_gather(5 << 18, 11))
