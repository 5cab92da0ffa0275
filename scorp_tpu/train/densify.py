"""Jitted densification (clone/split) + pruning over fixed-capacity buffers.

Semantics mirror the reference's adaptive density control
(/root/reference/gs3dgs/scene/gaussian_model.py:445-601 and the hot-loop
call sites at train_3dgs.py:176-189) with the dynamic reallocation replaced
by masked scatters into dead slots:

  * clone: screen-grad >= threshold AND max scale <= percent_dense*extent
    -> copy appended (densify_and_clone, gm:530-545).
  * split: screen-grad >= threshold AND max scale > percent_dense*extent
    -> N=2 children sampled from N(0, scale) rotated into world space,
    child scale = scale/(0.8*N), original removed (densify_and_split,
    gm:445-470).
  * prune: opacity < min_opacity, plus (when a size threshold is active)
    world-size > 0.1*extent. The reference's screen-radius prune
    (max_radii2D > max_screen_size) is a no-op there because
    densification_postfix zeroes max_radii2D immediately before the prune
    (gm:438-443,572-586); we reproduce that net behavior and keep the
    radii test behind `use_radii_prune` for completeness.
  * bookkeeping: xyz_grad_accum/denom/max_radii2D reset to zero for all
    rows (postfix semantics), optimizer moments zeroed for appended rows
    and kept in place for survivors.

All shapes static; returns the number of candidates dropped for lack of
free slots so the host can grow capacity (geometric growth -> ~log
recompiles instead of one per densify).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.quat import quat_to_rotmat
from .state import AdamState, GaussianState


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@partial(jax.jit, static_argnames=("use_size_threshold", "use_radii_prune", "n_split"))
def densify_and_prune(
    state: GaussianState,
    adam: AdamState,
    rng: jax.Array,
    max_grad,
    min_opacity,
    extent,
    percent_dense,
    max_screen_size=0.0,
    use_size_threshold: bool = False,
    use_radii_prune: bool = False,
    n_split: int = 2,
):
    cap = state.capacity
    p = state.params
    alive = state.alive

    grads = state.xyz_grad_accum / jnp.maximum(state.denom, 1.0)
    grads = jnp.where(state.denom > 0, grads, 0.0)

    s = jnp.exp(p["scaling"])
    max_s = jnp.max(s, axis=1)
    hot = alive & (grads >= max_grad)
    clone_sel = hot & (max_s <= percent_dense * extent)
    split_sel = hot & (max_s > percent_dense * extent)

    # --- prune predicate (applies to originals and to fresh entries) ---
    def prune_of(opacity_logit, scaling_log, radii):
        pr = _sigmoid(opacity_logit[:, 0]) < min_opacity
        if use_size_threshold:
            big_ws = jnp.max(jnp.exp(scaling_log), axis=1) > 0.1 * extent
            pr = pr | big_ws
            if use_radii_prune:
                pr = pr | (radii > max_screen_size)
        return pr

    zero_radii = jnp.zeros_like(state.max_radii2d)  # postfix zeroes radii pre-prune
    pr_orig = prune_of(p["opacity"], p["scaling"], zero_radii)

    survivors = alive & ~split_sel & ~pr_orig

    # --- children of split gaussians ---
    if p["scaling"].shape[1] == 2:
        # surfel model: third axis has zero std (gs2dgs gaussian_model.py:447-448)
        std3 = jnp.concatenate([s, jnp.zeros((cap, 1), s.dtype)], axis=1)
    else:
        std3 = s
    R = quat_to_rotmat(p["rotation"])
    keys = jax.random.split(rng, n_split)
    child_scaling = jnp.log(s / (0.8 * n_split))
    pr_child = prune_of(p["opacity"], child_scaling, zero_radii)
    clone_keep = clone_sel & ~pr_orig
    child_keep = split_sel & ~pr_child

    # --- slot allocation: free slots first (stable index order) ---
    free = ~survivors
    slot_list = jnp.argsort(~free, stable=True).astype(jnp.int32)  # free slots first
    n_free = jnp.sum(free.astype(jnp.int32))

    n_clone = jnp.sum(clone_keep.astype(jnp.int32))
    n_child = jnp.sum(child_keep.astype(jnp.int32))

    new_params = dict(p)
    new_alive = survivors
    new_m = dict(adam.m)
    new_v = dict(adam.v)

    def scatter_group(sel, rank_offset, values, new_params, new_alive, new_m, new_v):
        rank = jnp.cumsum(sel.astype(jnp.int32)) - 1 + rank_offset
        ok = sel & (rank < n_free)
        target = jnp.where(ok, slot_list[jnp.clip(rank, 0, cap - 1)], cap)  # cap -> dropped
        for k in new_params:
            new_params[k] = new_params[k].at[target].set(values[k], mode="drop")
            zeros = jnp.zeros_like(values[k])
            new_m[k] = new_m[k].at[target].set(zeros, mode="drop")
            new_v[k] = new_v[k].at[target].set(zeros, mode="drop")
        new_alive = new_alive.at[target].set(True, mode="drop")
        return new_params, new_alive, new_m, new_v, jnp.sum(ok.astype(jnp.int32))

    # group 0: clones (verbatim copies)
    new_params, new_alive, new_m, new_v, placed_c = scatter_group(
        clone_keep, 0, p, new_params, new_alive, new_m, new_v
    )
    # groups 1..n_split: split children
    placed_children = jnp.int32(0)
    for j in range(n_split):
        eps = jax.random.normal(keys[j], std3.shape, std3.dtype) * std3
        child_xyz = p["xyz"] + jnp.einsum("nij,nj->ni", R, eps)
        child_vals = dict(p)
        child_vals["xyz"] = child_xyz
        child_vals["scaling"] = child_scaling
        offset = n_clone + j * n_child
        new_params, new_alive, new_m, new_v, placed = scatter_group(
            child_keep, offset, child_vals, new_params, new_alive, new_m, new_v
        )
        placed_children = placed_children + placed

    total_wanted = n_clone + n_split * n_child
    dropped = total_wanted - placed_c - placed_children

    zeros = jnp.zeros(cap, jnp.float32)
    new_state = GaussianState(new_params, new_alive, zeros, zeros, zeros)
    new_adam = AdamState(new_m, new_v, adam.step)
    return new_state, new_adam, dropped


@jax.jit
def reset_opacity(state: GaussianState, adam: AdamState, num_frozen=0):
    """opacity <- inverse_sigmoid(min(opacity, 0.01)); zero its Adam moments
    (reset_opacity + replace_tensor_to_optimizer, gaussian_model.py:253-256).
    `num_frozen` rows at the front are skipped (the 2DGS tuning mask,
    gs2dgs/scene/gaussian_model.py:211-220)."""
    op = _sigmoid(state.params["opacity"])
    new_logit = _inverse_sigmoid(jnp.minimum(op, 0.01))
    params = dict(state.params)
    row = jax.lax.broadcasted_iota(jnp.int32, (state.capacity, 1), 0)
    resettable = state.alive[:, None] & (row >= num_frozen)
    params["opacity"] = jnp.where(resettable, new_logit, params["opacity"])
    m = dict(adam.m)
    v = dict(adam.v)
    m["opacity"] = jnp.zeros_like(m["opacity"])
    v["opacity"] = jnp.zeros_like(v["opacity"])
    return state._replace(params=params), AdamState(m, v, adam.step)


@jax.jit
def accumulate_stats(state: GaussianState, screen_grad_ndc: jnp.ndarray, radii: jnp.ndarray):
    """Per-iteration densification statistics (train_3dgs.py:178-181):
    max_radii2D <- max(max_radii2D, radii) and
    xyz_grad_accum += ||ndc screen grad||, denom += 1, over visible gaussians."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(screen_grad_ndc, axis=-1)
    return state._replace(
        max_radii2d=jnp.where(
            visible, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
        xyz_grad_accum=jnp.where(visible, state.xyz_grad_accum + gnorm, state.xyz_grad_accum),
        denom=jnp.where(visible, state.denom + 1.0, state.denom),
    )


class OpacityTracker:
    """Host-side port of the reference's `reset_tracking_opacity`
    (/root/reference/gs3dgs/scene/gaussian_model.py:258-283): keeps a bank of
    the last 3 opacity snapshots; rows whose tracked minimum stays above 0.7
    are latched "always high" and reset to 0.99 instead of 0.01."""

    def __init__(self, capacity: int, max_bank_size: int = 3):
        self.max_bank_size = max_bank_size
        self.bank = None
        self.always_high = jnp.zeros(capacity, bool)

    def _grow(self, capacity: int):
        """Track capacity growth (grow_capacity between resets): new rows
        join un-latched, and their bank entries are 0 so the current bank
        epoch can never latch them (min <= 0.7)."""
        pad = capacity - self.always_high.shape[0]
        if pad <= 0:
            return
        self.always_high = jnp.concatenate(
            [self.always_high, jnp.zeros(pad, bool)]
        )
        if self.bank is not None:
            self.bank = jnp.concatenate(
                [self.bank, jnp.zeros((pad, self.bank.shape[1]), self.bank.dtype)],
                axis=0,
            )

    def reset(self, state: GaussianState, adam: AdamState):
        self._grow(state.params["opacity"].shape[0])
        op = _sigmoid(state.params["opacity"])  # [C, 1]
        if self.bank is None:
            self.bank = op
        else:
            self.bank = jnp.concatenate([self.bank, op], axis=1)

        params = dict(state.params)
        if self.bank.shape[1] == self.max_bank_size:
            track_min = self.bank.min(axis=1)
            self.bank = op
            self.always_high = self.always_high | (track_min > 0.7)
            ratio = float(self.always_high.sum()) / self.always_high.shape[0]
            print(f"always high ratio: {ratio}")
            new_op = jnp.where(self.always_high[:, None], 0.99, op)
        else:
            new_op = jnp.where(self.always_high[:, None], op, 0.01)
        params["opacity"] = jnp.where(
            state.alive[:, None], _inverse_sigmoid(new_op), params["opacity"]
        )
        m = dict(adam.m)
        v = dict(adam.v)
        m["opacity"] = jnp.zeros_like(m["opacity"])
        v["opacity"] = jnp.zeros_like(v["opacity"])
        return state._replace(params=params), AdamState(m, v, adam.step)


@jax.jit
def count_densify_candidates(state: GaussianState, max_grad) -> jnp.ndarray:
    """Upper bound on rows the next densify will add (clones + 2 children):
    used to pre-grow capacity so no candidate is ever dropped."""
    grads = state.xyz_grad_accum / jnp.maximum(state.denom, 1.0)
    grads = jnp.where(state.denom > 0, grads, 0.0)
    hot = state.alive & (grads >= max_grad)
    return 2 * jnp.sum(hot.astype(jnp.int32))
