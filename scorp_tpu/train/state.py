"""Fixed-capacity Gaussian parameter store + sparse Adam optimizer.

TPU-native redesign of the reference's `GaussianModel` parameter handling
(/root/reference/gs3dgs/scene/gaussian_model.py): instead of re-allocating
every tensor on densify/prune (which would force an XLA recompile every 100
iterations), Gaussians live in padded buffers of static capacity with an
`alive` mask. Clone/split/prune become masked scatters inside jit; capacity
grows geometrically on overflow (a handful of recompiles per run instead of
hundreds of reallocations).

The optimizer replicates torch.optim.Adam with eps=1e-15 and the reference's
per-group learning rates (gaussian_model.py:192-210), including the
"surgery" semantics: pruned rows keep nothing (their slots are reused with
zeroed moments), appended rows start with zero moments, and the global step
counter is preserved across densifications — exactly what
`cat_tensors_to_optimizer` / `_prune_optimizer` / `replace_tensor_to_optimizer`
do to torch's state dict.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plyio import GaussianData
from ..core.sh import rgb_to_sh
from ..ops.knn import knn_mean_dist2

PARAM_KEYS = ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")

# per-group LR factors match the reference's training_setup:
# f_rest uses feature_lr / 20
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15


class GaussianState(NamedTuple):
    """Padded Gaussian buffers. Rows with alive=False are inert."""

    params: dict[str, jnp.ndarray]
    alive: jnp.ndarray            # [C] bool
    max_radii2d: jnp.ndarray      # [C] f32
    xyz_grad_accum: jnp.ndarray   # [C] f32
    denom: jnp.ndarray            # [C] f32

    @property
    def capacity(self) -> int:
        return self.params["xyz"].shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round((self.params["f_rest"].shape[1] + 1) ** 0.5)) - 1

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


class AdamState(NamedTuple):
    m: dict[str, jnp.ndarray]
    v: dict[str, jnp.ndarray]
    step: jnp.ndarray  # scalar i32, shared across groups (torch per-tensor steps advance in lockstep)


def _pad(a: np.ndarray, capacity: int) -> np.ndarray:
    out = np.zeros((capacity,) + a.shape[1:], a.dtype)
    out[: a.shape[0]] = a
    return out


def round_capacity(n: int, multiple: int = 4096) -> int:
    return max(multiple, -(-n // multiple) * multiple)


def init_adam(state: GaussianState) -> AdamState:
    zeros = {k: jnp.zeros_like(v) for k, v in state.params.items()}
    return AdamState(m=zeros, v={k: jnp.zeros_like(v) for k, v in state.params.items()},
                     step=jnp.int32(0))


def from_gaussian_data(g: GaussianData, capacity: int | None = None) -> GaussianState:
    n = g.n
    cap = capacity or round_capacity(n)
    assert cap >= n
    params = {
        "xyz": jnp.asarray(_pad(g.xyz.astype(np.float32), cap)),
        "f_dc": jnp.asarray(_pad(g.f_dc.astype(np.float32), cap)),
        "f_rest": jnp.asarray(_pad(g.f_rest.astype(np.float32), cap)),
        "scaling": jnp.asarray(_pad(g.scaling.astype(np.float32), cap)),
        "rotation": jnp.asarray(_pad(g.rotation.astype(np.float32), cap)),
        "opacity": jnp.asarray(_pad(g.opacity.astype(np.float32), cap)),
    }
    alive = jnp.asarray(_pad(np.ones(n, bool), cap))
    # three distinct buffers: donation would reject one buffer donated thrice
    return GaussianState(
        params, alive,
        jnp.zeros(cap, jnp.float32), jnp.zeros(cap, jnp.float32), jnp.zeros(cap, jnp.float32),
    )


def to_gaussian_data(state: GaussianState) -> GaussianData:
    """Compact the padded buffers back to host-side numpy (alive rows only)."""
    alive = np.asarray(state.alive)
    idx = np.nonzero(alive)[0]
    p = {k: np.asarray(v)[idx] for k, v in state.params.items()}
    return GaussianData(
        xyz=p["xyz"], f_dc=p["f_dc"], f_rest=p["f_rest"],
        opacity=p["opacity"], scaling=p["scaling"], rotation=p["rotation"],
    )


def from_point_cloud(
    points: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int = 3,
    capacity: int | None = None,
    surfel: bool = False,
) -> GaussianState:
    """Initialize from a COLMAP point cloud like `create_from_pcd`
    (/root/reference/gs3dgs/scene/gaussian_model.py:167-190): SH DC from RGB,
    isotropic log-scales from sqrt of the 3-NN mean squared distance,
    identity rotations (random for surfels, gs2dgs:137), opacity 0.1."""
    n = points.shape[0]
    k = (max_sh_degree + 1) ** 2
    f_dc = rgb_to_sh(np.asarray(colors, np.float32)).reshape(n, 1, 3)
    f_rest = np.zeros((n, k - 1, 3), np.float32)

    dist2 = np.asarray(knn_mean_dist2(np.asarray(points, np.float32)))
    scale1d = np.log(np.sqrt(np.clip(dist2, 1e-7, None)))
    n_scale = 2 if surfel else 3
    scaling = np.repeat(scale1d[:, None], n_scale, axis=1).astype(np.float32)

    if surfel:
        rng = np.random.default_rng(0)
        rotation = rng.random((n, 4)).astype(np.float32)
    else:
        rotation = np.zeros((n, 4), np.float32)
        rotation[:, 0] = 1.0
    opacity = np.full((n, 1), np.log(0.1 / 0.9), np.float32)  # inverse_sigmoid(0.1)

    g = GaussianData(
        xyz=np.asarray(points, np.float32), f_dc=f_dc, f_rest=f_rest,
        opacity=opacity, scaling=scaling, rotation=rotation,
    )
    return from_gaussian_data(g, capacity)


def grow_capacity(state: GaussianState, adam: AdamState, new_capacity: int):
    """Host-side capacity bump (keeps all values; new rows dead/zero)."""
    cap = state.capacity
    assert new_capacity > cap
    pad_rows = new_capacity - cap

    def pad_leaf(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad_rows,) + x.shape[1:], x.dtype)], axis=0
        )

    params = {k: pad_leaf(v) for k, v in state.params.items()}
    new_state = GaussianState(
        params,
        pad_leaf(state.alive),
        pad_leaf(state.max_radii2d),
        pad_leaf(state.xyz_grad_accum),
        pad_leaf(state.denom),
    )
    new_adam = AdamState(
        m={k: pad_leaf(v) for k, v in adam.m.items()},
        v={k: pad_leaf(v) for k, v in adam.v.items()},
        step=adam.step,
    )
    return new_state, new_adam


def expon_lr(step, lr_init: float, lr_final: float, max_steps: int,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """Log-linear LR decay with optional sine-eased delay (JaxNeRF-style),
    matching /root/reference/gs3dgs/utils/general_utils.py:44-77."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    return delay * log_lerp


def adam_update(
    params: dict[str, jnp.ndarray],
    grads: dict[str, jnp.ndarray],
    adam: AdamState,
    lrs: dict[str, Any],
    frozen: tuple[str, ...] = (),
) -> tuple[dict[str, jnp.ndarray], AdamState]:
    """One Adam step over the parameter dict with per-group learning rates.

    Matches torch.optim.Adam(eps=1e-15) update math; `frozen` groups keep
    params and moments untouched (the reference's `set_freeze`,
    gaussian_model.py:65-90).
    """
    step = adam.step + 1
    bc1 = 1.0 - ADAM_B1 ** step.astype(jnp.float32)
    bc2 = 1.0 - ADAM_B2 ** step.astype(jnp.float32)
    new_params, new_m, new_v = {}, {}, {}
    for k in params:
        if k in frozen:
            new_params[k] = params[k]
            new_m[k] = adam.m[k]
            new_v[k] = adam.v[k]
            continue
        g = grads[k]
        m = ADAM_B1 * adam.m[k] + (1.0 - ADAM_B1) * g
        v = ADAM_B2 * adam.v[k] + (1.0 - ADAM_B2) * g * g
        update = (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS)
        new_params[k] = params[k] - lrs[k] * update
        new_m[k] = m
        new_v[k] = v
    return new_params, AdamState(new_m, new_v, step)


def get_normal(params: dict) -> jnp.ndarray:
    """Per-gaussian normal = rotation column of the smallest scale axis
    (/root/reference/gs3dgs/scene/gaussian_model.py:149-155)."""
    from ..core.quat import quat_to_rotmat

    R = quat_to_rotmat(params["rotation"])
    s = jnp.exp(params["scaling"])
    if s.shape[1] == 2:  # surfel: normal is the third frame axis
        n = R[:, :, 2]
    else:
        axis = jnp.argmin(s, axis=-1)
        n = jnp.take_along_axis(R, axis[:, None, None], axis=2)[:, :, 0]
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def get_color(params: dict) -> jnp.ndarray:
    """DC-band RGB (SH2RGB of f_dc, gaussian_model.py:157-158)."""
    return rgb_to_sh_inv(params["f_dc"][:, 0, :])


def rgb_to_sh_inv(sh):
    from ..core.sh import sh_to_rgb

    return sh_to_rgb(sh)
