"""Does the fast 16-bit gather extend to exact f32-as-2xu16 reconstruction?"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster.common import _expand_keys_core, preprocess


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


def base(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                      scales=scales, quats=quats)
    tile, g_of_k, order, total = _expand_keys_core(prep, w, h, K)
    st, g = jax.lax.sort((tile, jnp.maximum(g_of_k, 0)), num_keys=1,
                         is_stable=True)
    tbl = jnp.concatenate(
        [prep.xy, prep.conic, prep.color, prep.opacity[:, None],
         prep.depth[:, None]], axis=1)  # [N, 10]
    return tbl, st, g


def f_u16(*a):
    tbl, st, g = base(*a)
    t16 = jax.lax.bitcast_convert_type(tbl, jnp.uint16).reshape(tbl.shape[0], -1)
    rows = t16[g]  # [K, 20] u16
    back = jax.lax.bitcast_convert_type(rows.reshape(K, 10, 2), jnp.float32)
    return back.sum() + st.sum()


def f_u16_pad32(*a):
    tbl, st, g = base(*a)
    t16 = jax.lax.bitcast_convert_type(tbl, jnp.uint16).reshape(tbl.shape[0], -1)
    t16 = jnp.concatenate([t16, jnp.zeros((t16.shape[0], 12), jnp.uint16)], axis=1)
    rows = t16[g]  # [K, 32] u16
    back = jax.lax.bitcast_convert_type(rows[:, :20].reshape(K, 10, 2), jnp.float32)
    return back.sum() + st.sum()


def f_i32(*a):
    tbl, st, g = base(*a)
    ti = jax.lax.bitcast_convert_type(tbl, jnp.int32)
    rows = ti[g]
    return jax.lax.bitcast_convert_type(rows, jnp.float32).sum() + st.sum()


def f_i8(*a):
    tbl, st, g = base(*a)
    t8 = jax.lax.bitcast_convert_type(tbl, jnp.uint8).reshape(tbl.shape[0], -1)
    rows = t8[g]  # [K, 40] u8
    back = jax.lax.bitcast_convert_type(rows.reshape(K, 10, 4), jnp.float32)
    return back.sum() + st.sum()


def f_f32(*a):
    tbl, st, g = base(*a)
    return tbl[g].sum() + st.sum()


def f_2xbf16gathers(*a):
    tbl, st, g = base(*a)
    t16 = jax.lax.bitcast_convert_type(tbl, jnp.uint16)  # [N, 10, 2]
    lo = t16[..., 0]
    hi = t16[..., 1]
    rl = lo[g]
    rh = hi[g]
    back = jax.lax.bitcast_convert_type(jnp.stack([rl, rh], axis=-1), jnp.float32)
    return back.sum() + st.sum()


args = (xyz, shs, scales, quats, opacity)
for name, fn in [
    ("gather f32 [2M,10]", f_f32),
    ("gather u16 [2M,20] + bitcast", f_u16),
    ("gather u16 [2M,32]pad + bitcast", f_u16_pad32),
    ("gather i32 [2M,10]", f_i32),
    ("gather u8  [2M,40] + bitcast", f_i8),
    ("2 sep u16 gathers [2M,10]x2", f_2xbf16gathers),
]:
    print(f"{name:36s} {timeit(jax.jit(fn), args):8.2f} ms")

# exactness check
o1 = jax.jit(f_u16)(*args)
o2 = jax.jit(f_f32)(*args)
print("u16 reconstruction matches f32 gather:", float(o1), float(o2))
