"""Scatter/permute costs at backward scale, in-pipeline (trustworthy)."""

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
KPC = (K + (1 << 19)) // 128  # padded chunk slots
N = 250_000


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
    # fake "padded grads" built in-program: [KPC, 16, 128]
    blocks = jnp.broadcast_to(
        prep.xy[:2048].reshape(16, 128 * 2)[:, :128][None], (KPC, 16, 128)
    ) * 1.00001
    return prep, st, g, blocks


def nog(*a):
    prep, st, g, blocks = base(*a)
    return st.sum() + g.sum() + blocks[::977].sum()


def f_transpose(*a):
    prep, st, g, blocks = base(*a)
    rows = blocks.transpose(0, 2, 1).reshape(KPC * 128, 16)
    return rows[::977].sum() + st.sum()  # strided sum forces materialization


def f_transpose_scatter_unsorted(*a):
    prep, st, g, blocks = base(*a)
    rows = blocks.transpose(0, 2, 1).reshape(KPC * 128, 16)
    upd = rows[:K]  # slice: real keys
    out = jnp.zeros((N, 16), jnp.float32).at[g].add(upd)
    return out.sum() + st.sum()


def f_transpose_scatter_sorted(*a):
    prep, st, g, blocks = base(*a)
    rows = blocks.transpose(0, 2, 1).reshape(KPC * 128, 16)
    upd = rows[:K]
    gs = jax.lax.sort(g)
    out = jnp.zeros((N, 16), jnp.float32).at[gs].add(
        upd, indices_are_sorted=True
    )
    return out.sum() + st.sum()


def f_scatter_set_permute(*a):
    prep, st, g, blocks = base(*a)
    rows = blocks.transpose(0, 2, 1).reshape(KPC * 128, 16)
    upd = rows[:K]
    iota = jnp.arange(K, dtype=jnp.int32)
    perm = jax.lax.sort((g, iota), num_keys=1, is_stable=True)[1]
    out = jnp.zeros((K, 16), jnp.float32).at[perm].set(upd)
    return out.sum() + st.sum()


args = (xyz, shs, scales, quats, opacity)
b = timeit(jax.jit(nog), args)
print(f"{'prefix':52s} {b:8.2f} ms")
for name, fn in [
    ("+ transpose [KPC,16,128]->[K_pad,16]", f_transpose),
    ("+ transpose + UNSORTED scatter-add 2M->[N,16]", f_transpose_scatter_unsorted),
    ("+ transpose + sort idx + SORTED scatter-add", f_transpose_scatter_sorted),
    ("+ transpose + scatter-SET permute 2M->[2M,16]", f_scatter_set_permute),
]:
    print(f"{name:52s} {timeit(jax.jit(fn), args) - b:8.2f} ms")
