"""2DGS surfel timing at bench scale: eval render + full train step."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp

from scorp_tpu.core.plyio import GaussianData
from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.pallas_surfel import rasterize_surfel_pallas_fwd_only
from scorp_tpu.train import from_gaussian_data, init_adam
from scorp_tpu.train.step2d import Opt2DParams, train_step_2d


def timeit(fn, args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


if __name__ == "__main__":
    xyz, shs, scales, quats, opacity, cam = build_scene()
    cfg = RasterConfig(max_keys=1 << 21, tile_list_len=4096, chunk=64,
                       pallas_chunk=128)
    bg = jnp.zeros(3, jnp.float32)
    n = xyz.shape[0]

    # 2DGS state: two-axis scales
    g = GaussianData(
        xyz=np.asarray(xyz),
        f_dc=np.asarray(shs[:, :1]),
        f_rest=np.asarray(shs[:, 1:]),
        opacity=np.log(np.asarray(opacity) / (1 - np.asarray(opacity)))[:, None],
        scaling=np.log(np.asarray(scales))[:, :2],
        rotation=np.asarray(quats),
    )
    state = from_gaussian_data(g, capacity=n)
    adam = init_adam(state)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, cam.height, cam.width)).astype(np.float32))
    opt = Opt2DParams()

    @jax.jit
    def render(xyz, shs, scales2, quats, opacity):
        out = rasterize_surfel_pallas_fwd_only(
            xyz, opacity, cam, bg, shs=shs, sh_degree=3,
            scales=scales2, quats=quats, cfg=cfg,
        )
        return out.color

    zeros1 = jnp.zeros((1, cam.height, cam.width), jnp.float32)

    def step(state, adam, it):
        return train_step_2d(
            state, adam, cam, gt, zeros1, zeros1, it, bg,
            opt=opt, sh_degree=3, cfg=cfg,
        )

    ms = timeit(render, (xyz, shs, jnp.asarray(np.asarray(scales)[:, :2]),
                         quats, opacity))
    print(f"surfel eval render: {ms:.1f} ms ({1000.0 / ms:.1f} FPS)")
    it = jnp.int32(8000)
    ms = timeit(lambda s, a, i: step(s, a, i), (state, adam, it), n=5)
    print(f"surfel train step: {ms:.1f} ms")
