"""Training-stack tests: Adam parity vs torch, densify/prune semantics over
padded buffers, opacity reset, and end-to-end convergence on a synthetic
scene (recover a known Gaussian set from rendered targets)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scorp_tpu.core.camera import look_at_camera
from scorp_tpu.core.plyio import GaussianData
from scorp_tpu.core.sh import rgb_to_sh
from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.ops.raster.xla import rasterize_xla
from scorp_tpu.train import (
    AdamState,
    OptParams,
    adam_update,
    densify_and_prune,
    from_gaussian_data,
    from_point_cloud,
    grow_capacity,
    init_adam,
    reset_opacity,
    to_gaussian_data,
    train_step,
)


def make_data(n=16, seed=0, sh_degree=3):
    rng = np.random.default_rng(seed)
    k = (sh_degree + 1) ** 2
    return GaussianData(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        f_rest=rng.normal(scale=0.01, size=(n, k - 1, 3)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        scaling=rng.normal(loc=-3.0, size=(n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
    )


class TestState:
    def test_roundtrip(self):
        g = make_data(10)
        st = from_gaussian_data(g, capacity=32)
        assert int(st.num_alive()) == 10
        g2 = to_gaussian_data(st)
        np.testing.assert_array_equal(g.xyz, g2.xyz)
        np.testing.assert_array_equal(g.rotation, g2.rotation)

    def test_grow_capacity(self):
        g = make_data(10)
        st = from_gaussian_data(g, capacity=16)
        adam = init_adam(st)
        st2, adam2 = grow_capacity(st, adam, 64)
        assert st2.capacity == 64
        assert int(st2.num_alive()) == 10
        np.testing.assert_array_equal(np.asarray(st2.params["xyz"])[:16], st.params["xyz"])

    def test_from_point_cloud_scales(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(50, 3))
        st = from_point_cloud(pts, rng.uniform(size=(50, 3)), max_sh_degree=3)
        g = to_gaussian_data(st)
        # isotropic scales = 0.5*log(mean d2 of 3-NN)
        from scorp_tpu.ops.knn import knn_mean_dist2
        d2 = np.asarray(knn_mean_dist2(pts.astype(np.float32)))
        np.testing.assert_allclose(g.scaling[:, 0], 0.5 * np.log(np.clip(d2, 1e-7, None)), atol=1e-5)
        np.testing.assert_allclose(g.scaling[:, 0], g.scaling[:, 1])
        # opacity logit of 0.1
        np.testing.assert_allclose(g.opacity, np.log(0.1 / 0.9), atol=1e-6)


class TestOpacityTracker:
    """Reference reset_tracking_opacity semantics
    (/root/reference/gs3dgs/scene/gaussian_model.py:258-283): a 3-snapshot
    opacity bank; rows whose tracked minimum stays > 0.7 latch "always
    high" and get 0.99 at bank-full resets, everyone else 0.01 at
    intermediate resets; the latch must survive capacity growth."""

    def _state(self, logits, capacity=None):
        import dataclasses

        n = len(logits)
        g = make_data(n, seed=3)
        g = dataclasses.replace(g, opacity=np.asarray(logits, np.float32)[:, None])
        st = from_gaussian_data(g, capacity=capacity or n)
        return st, init_adam(st)

    def test_bank_latch_and_resets(self):
        from scorp_tpu.train.densify import OpacityTracker

        hi = 5.0    # sigmoid ~0.993 (stays > 0.7)
        lo = -2.0   # sigmoid ~0.119
        st, adam = self._state([hi, hi, lo, hi])
        tr = OpacityTracker(st.capacity)

        # resets 1 and 2: bank not full -> non-latched rows forced to 0.01
        st, adam = tr.reset(st, adam)
        op = 1 / (1 + np.exp(-np.asarray(st.params["opacity"])[:, 0]))
        np.testing.assert_allclose(op, 0.01, atol=1e-5)
        assert not bool(np.asarray(tr.always_high).any())
        # keep opacities high between resets (training would)
        st = st._replace(params={**st.params, "opacity": jnp.full_like(
            st.params["opacity"], hi)})
        st, adam = tr.reset(st, adam)
        # third reset fills the bank: min over the 3 snapshots latches only
        # rows that stayed high in ALL of them
        st = st._replace(params={**st.params, "opacity": jnp.asarray(
            np.array([hi, hi, hi, lo], np.float32))[:, None]})
        st, adam = tr.reset(st, adam)
        latched = np.asarray(tr.always_high)
        # row 0,1 high in all 3 snapshots; row 2 was low in snapshot 1;
        # row 3 low in snapshot 3
        np.testing.assert_array_equal(latched, [True, True, False, False])
        op = 1 / (1 + np.exp(-np.asarray(st.params["opacity"])[:, 0]))
        np.testing.assert_allclose(op[:2], 0.99, atol=1e-5)   # latched -> 0.99
        np.testing.assert_allclose(op[3], 1 / (1 + np.exp(-lo)), atol=1e-5)
        # bank restarted: next (intermediate) reset forces non-latched to
        # 0.01 and leaves latched rows at their current value
        st, adam = tr.reset(st, adam)
        op = 1 / (1 + np.exp(-np.asarray(st.params["opacity"])[:, 0]))
        np.testing.assert_allclose(op[2:], 0.01, atol=1e-5)
        np.testing.assert_allclose(op[:2], 0.99, atol=1e-4)
        # moments zeroed every reset
        assert float(jnp.abs(adam.m["opacity"]).max()) == 0.0

    def test_growth_between_resets(self):
        from scorp_tpu.train.densify import OpacityTracker

        st, adam = self._state([5.0, 5.0], capacity=2)
        tr = OpacityTracker(st.capacity)
        st, adam = tr.reset(st, adam)
        st = st._replace(params={**st.params, "opacity": jnp.full_like(
            st.params["opacity"], 5.0)})
        st, adam = grow_capacity(st, adam, 8)
        st = st._replace(params={**st.params, "opacity": jnp.full_like(
            st.params["opacity"], 5.0)}, alive=jnp.ones(8, bool))
        st, adam = tr.reset(st, adam)
        # training raises opacity again before the bank-filling reset
        st = st._replace(params={**st.params, "opacity": jnp.full_like(
            st.params["opacity"], 5.0)})
        st, adam = tr.reset(st, adam)  # bank full
        latched = np.asarray(tr.always_high)
        assert latched.shape == (8,)
        # original rows latch; grown rows cannot latch in the epoch they
        # joined (their bank min is 0)
        np.testing.assert_array_equal(latched[:2], [True, True])
        assert not latched[2:].any()


class TestAdam:
    def test_matches_torch_adam(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        x0 = rng.normal(size=(8, 3)).astype(np.float32)

        # torch: 30 steps of Adam(lr=0.01, eps=1e-15) on f(x) = sum(x^2 * w)
        w = rng.uniform(0.5, 2.0, size=(8, 3)).astype(np.float32)
        xt = torch.tensor(x0.copy(), requires_grad=True)
        opt = torch.optim.Adam([xt], lr=0.01, eps=1e-15)
        for _ in range(30):
            opt.zero_grad()
            loss = (xt**2 * torch.tensor(w)).sum()
            loss.backward()
            opt.step()

        params = {"xyz": jnp.asarray(x0)}
        adam = AdamState(
            m={"xyz": jnp.zeros_like(params["xyz"])},
            v={"xyz": jnp.zeros_like(params["xyz"])},
            step=jnp.int32(0),
        )
        wj = jnp.asarray(w)
        for _ in range(30):
            g = jax.grad(lambda p: jnp.sum(p["xyz"] ** 2 * wj))(params)
            params, adam = adam_update(params, g, adam, {"xyz": 0.01})
        np.testing.assert_allclose(np.asarray(params["xyz"]), xt.detach().numpy(), atol=1e-5)

    def test_frozen_group(self):
        params = {"xyz": jnp.ones((4, 3)), "opacity": jnp.ones((4, 1))}
        adam = AdamState(
            m=jax.tree_util.tree_map(jnp.zeros_like, params),
            v=jax.tree_util.tree_map(jnp.zeros_like, params),
            step=jnp.int32(0),
        )
        grads = {"xyz": jnp.ones((4, 3)), "opacity": jnp.ones((4, 1))}
        new, _ = adam_update(params, grads, adam, {"xyz": 0.1, "opacity": 0.1}, frozen=("xyz",))
        np.testing.assert_array_equal(new["xyz"], params["xyz"])
        assert not np.allclose(new["opacity"], params["opacity"])


class TestDensify:
    def _state(self, n=8, cap=32):
        g = make_data(n, seed=3)
        g.opacity[:] = 3.0  # sigmoid ~0.95: no opacity prune
        st = from_gaussian_data(g, capacity=cap)
        return st, init_adam(st)

    def test_clone_small_high_grad(self):
        st, adam = self._state()
        # small scales everywhere; gaussian 2 has a high accumulated grad
        st = st._replace(
            params={**st.params, "scaling": jnp.full_like(st.params["scaling"], -5.0)},
            xyz_grad_accum=st.xyz_grad_accum.at[2].set(1.0),
            denom=st.denom.at[2].set(1.0),
        )
        st2, adam2, dropped = densify_and_prune(
            st, adam, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.005, extent=10.0, percent_dense=0.01,
        )
        assert int(dropped) == 0
        assert int(st2.num_alive()) == 9  # one clone appended
        g2 = to_gaussian_data(st2)
        # the clone is exact
        src = np.asarray(st.params["xyz"])[2]
        matches = (g2.xyz == src).all(axis=1).sum()
        assert matches == 2

    def test_split_large_high_grad(self):
        st, adam = self._state()
        st = st._replace(
            params={**st.params, "scaling": st.params["scaling"].at[3].set(2.0)},
            xyz_grad_accum=st.xyz_grad_accum.at[3].set(1.0),
            denom=st.denom.at[3].set(1.0),
        )
        old_alive = int(st.num_alive())
        st2, adam2, dropped = densify_and_prune(
            st, adam, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.005, extent=1.0, percent_dense=0.01,
        )
        # original removed, 2 children added -> net +1
        assert int(st2.num_alive()) == old_alive + 1
        g2 = to_gaussian_data(st2)
        # children have scaling = log(exp(2)/1.6)
        expected = 2.0 - np.log(1.6)
        assert np.isclose(np.sort(g2.scaling[:, 0])[-1], expected, atol=1e-5)

    def test_opacity_prune(self):
        st, adam = self._state()
        low = st.params["opacity"].at[1].set(-8.0).at[5].set(-8.0)  # sigmoid ~0
        st = st._replace(params={**st.params, "opacity": low})
        st2, _, _ = densify_and_prune(
            st, adam, jax.random.PRNGKey(0),
            max_grad=1e9, min_opacity=0.005, extent=1.0, percent_dense=0.01,
        )
        assert int(st2.num_alive()) == 6

    def test_stats_reset(self):
        st, adam = self._state()
        st = st._replace(denom=jnp.ones_like(st.denom), max_radii2d=jnp.ones_like(st.max_radii2d))
        st2, _, _ = densify_and_prune(
            st, adam, jax.random.PRNGKey(0),
            max_grad=1e9, min_opacity=0.005, extent=1.0, percent_dense=0.01,
        )
        assert float(st2.denom.sum()) == 0.0
        assert float(st2.max_radii2d.sum()) == 0.0

    def test_overflow_reported(self):
        st, adam = self._state(n=8, cap=8)  # no free slots
        st = st._replace(
            params={**st.params, "scaling": jnp.full_like(st.params["scaling"], -5.0)},
            xyz_grad_accum=jnp.ones_like(st.xyz_grad_accum),
            denom=jnp.ones_like(st.denom),
        )
        st2, _, dropped = densify_and_prune(
            st, adam, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.005, extent=10.0, percent_dense=0.01,
        )
        assert int(dropped) == 8  # 8 clones wanted, 0 slots
        assert int(st2.num_alive()) == 8

    def test_adam_moments_zeroed_for_new(self):
        st, adam = self._state()
        adam = AdamState(
            m={k: jnp.ones_like(v) for k, v in adam.m.items()},
            v={k: jnp.ones_like(v) for k, v in adam.v.items()},
            step=jnp.int32(7),
        )
        st = st._replace(
            params={**st.params, "scaling": jnp.full_like(st.params["scaling"], -5.0)},
            xyz_grad_accum=st.xyz_grad_accum.at[2].set(1.0),
            denom=st.denom.at[2].set(1.0),
        )
        st2, adam2, _ = densify_and_prune(
            st, adam, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.005, extent=10.0, percent_dense=0.01,
        )
        assert int(adam2.step) == 7  # step preserved
        new_slots = np.asarray(st2.alive) & ~np.asarray(st.alive)
        assert new_slots.sum() == 1
        assert float(np.asarray(adam2.m["xyz"])[new_slots].sum()) == 0.0

    def test_reset_opacity(self):
        st, adam = self._state()
        st2, adam2 = reset_opacity(st, adam)
        op = jax.nn.sigmoid(st2.params["opacity"][np.asarray(st2.alive), 0])
        assert np.all(np.asarray(op) <= 0.0101)
        assert float(adam2.m["opacity"].sum()) == 0.0


class TestTrainStep:
    def test_synthetic_convergence(self):
        # build a ground-truth scene, render targets, then fit from a
        # perturbed init — PSNR must increase substantially.
        rng = np.random.default_rng(7)
        n = 48
        xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        colors = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
        g_true = GaussianData(
            xyz=xyz,
            f_dc=rgb_to_sh(colors).reshape(n, 1, 3).astype(np.float32),
            f_rest=np.zeros((n, 15, 3), np.float32),
            opacity=np.full((n, 1), 2.0, np.float32),
            scaling=np.full((n, 3), np.log(0.15), np.float32),
            rotation=np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1)),
        )
        cams = [
            look_at_camera(eye=e, target=[0, 0, 0], up=[0, 1, 0],
                           fovx=0.9, fovy=0.9, width=64, height=64)
            for e in ([0, 0, -4], [1.5, 0.5, -3.5], [-1.5, -0.5, -3.5])
        ]
        cfg = RasterConfig(max_keys=1 << 15, tile_list_len=512, chunk=32)
        bg = jnp.zeros(3)

        st_true = from_gaussian_data(g_true, capacity=64)
        targets = []
        for cam in cams:
            out = rasterize_xla(
                st_true.params["xyz"], jax.nn.sigmoid(st_true.params["opacity"][:, 0]),
                cam, bg,
                shs=jnp.concatenate([st_true.params["f_dc"], st_true.params["f_rest"]], 1),
                sh_degree=0,
                scales=jnp.exp(st_true.params["scaling"]),
                quats=st_true.params["rotation"], alive=st_true.alive, cfg=cfg,
            )
            targets.append(out.color)

        # perturbed init
        g0 = g_true.copy()
        g0.xyz = g0.xyz + rng.normal(0, 0.1, size=g0.xyz.shape).astype(np.float32)
        g0.f_dc = g0.f_dc + rng.normal(0, 0.3, size=g0.f_dc.shape).astype(np.float32)
        st = from_gaussian_data(g0, capacity=64)
        adam = init_adam(st)
        opt = OptParams(iterations=400, depth_from_iter=10**9, lambda_isotropic=0.0)

        zero_d = jnp.zeros((1, 64, 64))
        cam0_psnrs = []
        for it in range(1, 202):
            cam_i = (it - 1) % 3
            st, adam, metrics = train_step(
                st, adam, cams[cam_i], targets[cam_i], zero_d, zero_d,
                jnp.int32(it), bg, opt=opt, sh_degree=0, cfg=cfg,
            )
            if cam_i == 0:
                cam0_psnrs.append(float(metrics.psnr))
        assert cam0_psnrs[-1] > cam0_psnrs[0] + 3.0, (cam0_psnrs[0], cam0_psnrs[-1])
        assert int(metrics.num_dropped_keys) == 0

    def test_stats_accumulate(self):
        g = make_data(12, seed=9)
        st = from_gaussian_data(g, capacity=16)
        adam = init_adam(st)
        cam = look_at_camera(eye=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0],
                             fovx=0.9, fovy=0.9, width=32, height=32)
        cfg = RasterConfig(max_keys=1 << 12, tile_list_len=128, chunk=16)
        tgt = jnp.zeros((3, 32, 32))
        zero_d = jnp.zeros((1, 32, 32))
        opt = OptParams(depth_from_iter=10**9)
        st2, _, _ = train_step(
            st, adam, cam, tgt, zero_d, zero_d, jnp.int32(1), jnp.zeros(3),
            opt=opt, sh_degree=3, cfg=cfg,
        )
        assert float(st2.denom.sum()) > 0
        assert float(st2.xyz_grad_accum.sum()) > 0
