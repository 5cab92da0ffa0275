"""On-device cost of candidate key->payload movement strategies.

All candidates are embedded in a realistic jitted program (sum output) to
avoid tunnel-timing artifacts.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K = 1 << 21
N = 250_000
ROWS = 11


def timeit(fn, args, n=10):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(N, ROWS)).astype(np.float32))
table16 = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
tableT = table.T  # [11, N]
idx = jnp.asarray(rng.integers(0, N, size=K).astype(np.int32))
tile = jnp.asarray(rng.integers(0, 6700, size=K).astype(np.int32))
cols = [jnp.asarray(rng.normal(size=K).astype(np.float32)) for _ in range(ROWS)]
g_upd = jnp.asarray(rng.normal(size=(K, ROWS)).astype(np.float32))


def f_row_gather(table, idx):
    return table[idx].sum()


def f_row_gather16(table16, idx):
    return table16[idx].sum()


def f_col_gathers(tableT, idx):
    return sum(tableT[i][idx].sum() for i in range(ROWS))


def f_sort_ids(tile, idx):
    s = jax.lax.sort((tile, idx), num_keys=1, is_stable=True)
    return s[0].sum() + s[1].sum()


def f_sort_payload(tile, idx, *cols):
    ops = (tile, idx) + cols
    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return sum(x.sum() for x in s)


def f_sort_payload4(tile, idx, *cols):
    ops = (tile, idx) + cols[:4]
    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return sum(x.sum() for x in s)


def f_scatter_add(idx, g_upd):
    return jnp.zeros((N, ROWS), jnp.float32).at[idx].add(g_upd).sum()


def f_scatter_add_cols(idx, g_upd):
    return sum(
        jnp.zeros((N,), jnp.float32).at[idx].add(g_upd[:, i]).sum()
        for i in range(ROWS)
    )


def f_cumsum(x):
    return jnp.cumsum(x).sum()


def f_cummax(tile):
    return jax.lax.cummax(tile).sum()


def f_scatter_n(idx, g_upd):
    # N-sized scatter (expansion-style: 250k updates into 2M buffer)
    pos = idx[:N].astype(jnp.int32) * 8
    return jnp.zeros((K,), jnp.int32).at[pos].add(1, mode="drop").sum()


benches = [
    ("row gather [K,11]<-[N,11]", f_row_gather, (table, idx)),
    ("row gather [K,16]<-[N,16]", f_row_gather16, (table16, idx)),
    ("11x col gather [K]<-[N]", f_col_gathers, (tableT, idx)),
    ("sort (tile,id) K", f_sort_ids, (tile, idx)),
    ("sort tile + id + 4 f32", f_sort_payload4, (tile, idx) + tuple(cols)),
    ("sort tile + id + 11 f32", f_sort_payload, (tile, idx) + tuple(cols)),
    ("scatter-add [K,11]->[N,11]", f_scatter_add, (idx, g_upd)),
    ("11x col scatter-add", f_scatter_add_cols, (idx, g_upd)),
    ("cumsum [K] f32", f_cumsum, (cols[0],)),
    ("cummax [K] i32", f_cummax, (tile,)),
    ("scatter 250k -> [K] i32", f_scatter_n, (idx, g_upd)),
]

for name, fn, args in benches:
    ms = timeit(jax.jit(fn), args)
    print(f"{name:32s} {ms:8.2f} ms")
