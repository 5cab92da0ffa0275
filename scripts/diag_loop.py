"""Time the components of the real training loop on the conv_run scene."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from scorp_tpu.config import ModelParams, OptimizationParams, get_combined_args  # noqa
from scorp_tpu.apps.train_3dgs import CameraSampler, GtDeviceCache
from scorp_tpu.scene import Scene
from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.train import OptParams, from_point_cloud, init_adam
from scorp_tpu.train.step import train_step


class NS:
    source_path = "/tmp/conv_run/scene"
    model_path = "/tmp/diag_model"
    images = "images"
    depths = ""
    resolution = -1
    white_background = False
    data_device = "cpu"
    eval = True
    sh_degree = 3
    split_yml_name = "split.yml"
    depth_dir = None
    llffhold = 8


scene = Scene(NS(), load_gaussians=False, max_sh_degree=3)
state = from_point_cloud(scene.init_points, scene.init_colors, max_sh_degree=3)
adam = init_adam(state)
cams = scene.get_train_cameras()
print(f"{len(cams)} cams, capacity {state.capacity}")

cfg = RasterConfig(max_keys=1 << min(22, max(14, (state.capacity * 16 - 1).bit_length())),
                   tile_list_len=1024, chunk=64)
opt = OptParams()
sampler = CameraSampler(cams)
cache = GtDeviceCache(cams)
rng = np.random.default_rng(0)

t_samp = t_tojax = t_gt = t_step = t_sync = 0.0
it0 = time.perf_counter()
n = 60
for i in range(1, n + 1):
    t0 = time.perf_counter()
    cam, gt = sampler.next()
    t1 = time.perf_counter()
    cj = cam.to_jax()
    t2 = time.perf_counter()
    gt_img, gt_dcam, gt_dest = cache.get(cam, gt)
    bg = jnp.asarray(rng.uniform(size=3).astype(np.float32))
    t3 = time.perf_counter()
    state, adam, metrics = train_step(
        state, adam, cj, gt_img, gt_dcam, gt_dest, jnp.int32(i), bg,
        opt=opt, sh_degree=3, cfg=cfg)
    t4 = time.perf_counter()
    if i % 10 == 0:
        float(metrics.loss)
    t5 = time.perf_counter()
    if i > 10:  # skip warmup/compile
        t_samp += t1 - t0; t_tojax += t2 - t1; t_gt += t3 - t2
        t_step += t4 - t3; t_sync += t5 - t4

m = n - 10
print(f"sampler {t_samp/m*1e3:.1f}  to_jax {t_tojax/m*1e3:.1f}  gt+bg {t_gt/m*1e3:.1f}  "
      f"step-dispatch {t_step/m*1e3:.1f}  sync {t_sync/m*1e3:.1f} ms/iter")
print(f"wall {(time.perf_counter()-it0)/n*1e3:.1f} ms/iter incl compile; "
      f"steady {(t_samp+t_tojax+t_gt+t_step+t_sync)/m*1e3:.1f} ms/iter")
