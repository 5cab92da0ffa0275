"""Reproduce the full-scale expansion breakage: Pallas kept vs XLA golden."""

import sys

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

from scorp_tpu.ops.raster import pallas_expand as pe
from scorp_tpu.ops.raster.common import (
    _expand_keys_core,
    preprocess,
)

xyz, shs, scales, quats, opacity, cam = build_scene()
w, h = cam.width, cam.height
K_CAP = 2_000_000


@jax.jit
def run(xyz, shs, scales, quats, opacity):
    prep = preprocess(xyz, opacity, cam, shs=shs, sh_degree=3,
                      scales=scales, quats=quats)
    extra = jnp.concatenate(
        [prep.xy, prep.conic, prep.color, prep.opacity[:, None],
         prep.depth[:, None]], axis=1)
    packed, order, total, kept, bits_g, extra_sorted = pe.expand_sorted_keys(
        prep, w, h, K_CAP, cull=True, extra=extra)
    # golden XLA form
    tile, g_of_k, order_g, total_g, _, _, _, kept_g = _expand_keys_core(
        prep, w, h, K_CAP, cull=True)
    return dict(kept=kept, kept_g=kept_g, total=total, total_g=total_g,
                ex_mean=jnp.mean(jnp.abs(extra_sorted)))


out = run(xyz, shs, scales, quats, opacity)
for k, v in out.items():
    print(k, np.asarray(v))
