"""Backward data-path candidates, embedded in realistic programs."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

K = 1 << 21
KP = K + (1 << 19)
N = 250_000


def timeit(fn, args, n=10):
    """Chain iterations through a scalar data dependency so the device can't
    overlap or elide them (isolated micro-benchmarks through the axon tunnel
    read ~0.03 ms otherwise)."""

    @jax.jit
    def chained(carry, *args):
        first = args[0]
        eps = (jnp.sum(carry) * 1e-38).astype(first.dtype)  # ~0, not foldable
        out = fn(first + eps, *args[1:])
        return carry + out.astype(jnp.float32) * 1e-30

    carry = chained(jnp.zeros(1024, jnp.float32), *args)
    carry.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        carry = chained(carry, *args)
    carry.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
grads_cm = jnp.asarray(rng.normal(size=(16, KP)).astype(np.float32))  # [16, K_pad]
pos = jnp.asarray(np.sort(rng.choice(KP, size=K, replace=False)).astype(np.int32))
pos_rand = jnp.asarray(rng.permutation(KP)[:K].astype(np.int32))
gid_sorted = jnp.asarray(np.sort(rng.integers(0, N, size=K)).astype(np.int32))
gid_rand = jnp.asarray(rng.integers(0, N, size=K).astype(np.int32))
upd = jnp.asarray(rng.normal(size=(K, 11)).astype(np.float32))
iota = jnp.arange(K, dtype=jnp.int32)


def u16g(table, idx):
    r, c = table.shape
    t16 = jax.lax.bitcast_convert_type(table, jnp.uint16).reshape(r, 2 * c)
    rows = t16[idx]
    return jax.lax.bitcast_convert_type(rows.reshape(-1, c, 2), jnp.float32)


def f_transpose_only(g):
    return jnp.sum(g.T * 2.0)


def f_transpose_gather(g, pos):
    rows = jnp.swapaxes(g, 0, 1)
    out = u16g(rows, pos)
    return out.sum()


def f_scatter_sorted(gid, upd):
    return (
        jnp.zeros((N, 11), jnp.float32)
        .at[gid]
        .add(upd, indices_are_sorted=True, unique_indices=False)
        .sum()
    )


def f_scatter_rand(gid, upd):
    return jnp.zeros((N, 11), jnp.float32).at[gid].add(upd).sum()


def f_sort_pairs(gid, iota):
    s = jax.lax.sort((gid, iota), num_keys=1, is_stable=True)
    return s[0].sum() + s[1].sum()


def f_seg_sum_sorted(gid, upd):
    return jax.ops.segment_sum(
        upd, gid, num_segments=N, indices_are_sorted=True
    ).sum()


benches = [
    ("transpose [16,KP] -> [KP,16] (mat)", f_transpose_only, (grads_cm,)),
    ("transpose + u16 row gather K", f_transpose_gather, (grads_cm, pos_rand)),
    ("scatter-add sorted idx [K,11]->[N,11]", f_scatter_sorted, (gid_sorted, upd)),
    ("scatter-add random idx [K,11]->[N,11]", f_scatter_rand, (gid_rand, upd)),
    ("segment_sum sorted [K,11]->[N,11]", f_seg_sum_sorted, (gid_sorted, upd)),
    ("sort (gid, iota) K", f_sort_pairs, (gid_rand, iota)),
]
for name, fn, args in benches:
    print(f"{name:40s} {timeit(jax.jit(fn), args):8.2f} ms")
