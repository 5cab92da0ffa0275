"""Camera-batch data-parallel training on the 8-virtual-device CPU mesh
(the same environment the driver's multi-chip dryrun uses)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scorp_tpu.core.camera import look_at_camera
from scorp_tpu.core.plyio import GaussianData
from scorp_tpu.core.sh import rgb_to_sh
from scorp_tpu.ops.raster import RasterConfig
from scorp_tpu.parallel import dp_train_step, make_mesh, replicate, shard_batch
from scorp_tpu.parallel.train_dp import stack_cameras
from scorp_tpu.train import OptParams, from_gaussian_data, init_adam
from scorp_tpu.train.step import train_step

CFG = RasterConfig(max_keys=1 << 13, tile_list_len=128, chunk=32, pallas_chunk=128)
W, H = 64, 48


def make_state(n=48, seed=0, capacity=64):
    rng = np.random.default_rng(seed)
    g = GaussianData(
        xyz=rng.uniform(-1, 1, size=(n, 3)).astype(np.float32),
        f_dc=rgb_to_sh(rng.uniform(0.2, 0.8, (n, 3))).reshape(n, 1, 3).astype(np.float32),
        f_rest=np.zeros((n, 15, 3), np.float32),
        opacity=np.full((n, 1), 1.2, np.float32),
        scaling=np.full((n, 3), np.log(0.14), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
    )
    return from_gaussian_data(g, capacity=capacity)


def make_cams(b):
    return [
        look_at_camera(
            eye=[2.5 * np.sin(a), 0.4, -2.5 * np.cos(a)], target=[0, 0, 0],
            up=[0, 1, 0], fovx=0.9, fovy=0.75, width=W, height=H,
        )
        for a in np.linspace(0, 2 * np.pi, b, endpoint=False)
    ]


class TestDpTrainStep:
    def test_sharded_step_runs_and_matches_unsharded(self):
        b = 8
        mesh = make_mesh(b)
        state = make_state()
        adam = init_adam(state)
        cams = make_cams(b)
        rng = np.random.default_rng(1)
        gt = jnp.asarray(rng.uniform(0, 1, (b, 3, H, W)).astype(np.float32))
        bg = jnp.zeros(3, jnp.float32)
        batch = stack_cameras(cams)

        s1, a1, m1 = dp_train_step(
            state, adam, batch, gt, jnp.int32(1), bg,
            opt=OptParams(), sh_degree=0, cfg=CFG, width=W, height=H,
        )

        state_r = replicate(state, mesh)
        adam_r = replicate(init_adam(state), mesh)
        batch_r = shard_batch(batch, mesh)
        gt_r = shard_batch(gt, mesh)
        with mesh:
            s2, a2, m2 = dp_train_step(
                state_r, adam_r, batch_r, gt_r, jnp.int32(1), bg,
                opt=OptParams(), sh_degree=0, cfg=CFG, width=W, height=H,
            )
        assert np.isfinite(float(m2["loss"]))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            s1.params["xyz"], s2.params["xyz"], atol=1e-6
        )
        np.testing.assert_allclose(
            s1.xyz_grad_accum, s2.xyz_grad_accum, atol=1e-6
        )

    def test_sharded_2d_step_runs_and_matches_unsharded(self):
        from scorp_tpu.parallel import dp_train_step_2d
        from scorp_tpu.train.step2d import Opt2DParams

        b = 8
        mesh = make_mesh(b)
        rng = np.random.default_rng(3)
        n = 48
        g = GaussianData(
            xyz=rng.uniform(-1, 1, size=(n, 3)).astype(np.float32),
            f_dc=rgb_to_sh(rng.uniform(0.2, 0.8, (n, 3))).reshape(n, 1, 3).astype(np.float32),
            f_rest=np.zeros((n, 15, 3), np.float32),
            opacity=np.full((n, 1), 1.2, np.float32),
            scaling=np.full((n, 2), np.log(0.14), np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
        )
        state = from_gaussian_data(g, capacity=64)
        adam = init_adam(state)
        cams = make_cams(b)
        gt = jnp.asarray(rng.uniform(0, 1, (b, 3, H, W)).astype(np.float32))
        bg = jnp.zeros(3, jnp.float32)
        batch = stack_cameras(cams)
        opt = Opt2DParams(lambda_dist=10.0)
        it = jnp.int32(8000)  # normal + distortion losses active

        s1, a1, m1 = dp_train_step_2d(
            state, adam, batch, gt, it, bg,
            opt=opt, sh_degree=0, cfg=CFG, width=W, height=H,
        )

        state_r = replicate(state, mesh)
        adam_r = replicate(init_adam(state), mesh)
        batch_r = shard_batch(batch, mesh)
        gt_r = shard_batch(gt, mesh)
        with mesh:
            s2, a2, m2 = dp_train_step_2d(
                state_r, adam_r, batch_r, gt_r, it, bg,
                opt=opt, sh_degree=0, cfg=CFG, width=W, height=H,
            )
        assert np.isfinite(float(m2["loss"]))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        np.testing.assert_allclose(s1.params["xyz"], s2.params["xyz"], atol=1e-6)
        np.testing.assert_allclose(s1.xyz_grad_accum, s2.xyz_grad_accum, atol=1e-6)
        # 2-axis scaling actually trained
        assert s2.params["scaling"].shape[1] == 2
        assert float(jnp.abs(s2.params["scaling"] - state.params["scaling"]).max()) > 0

    def test_densify_stats_match_sequential_reference(self):
        """B-camera DP stats == sum of B single-camera reference stats."""
        b = 2
        state = make_state(seed=3)
        cams = make_cams(b)
        rng = np.random.default_rng(2)
        gts = jnp.asarray(rng.uniform(0, 1, (b, 3, H, W)).astype(np.float32))
        bg = jnp.zeros(3, jnp.float32)
        z1 = jnp.zeros((1, H, W), jnp.float32)
        opt = OptParams()

        accs, denoms = [], []
        for i in range(b):
            s, _, _ = train_step(
                state, init_adam(state), cams[i], gts[i], z1, z1,
                jnp.int32(1), bg, opt=opt, sh_degree=0, cfg=CFG,
            )
            accs.append(np.asarray(s.xyz_grad_accum))
            denoms.append(np.asarray(s.denom))

        s_dp, _, _ = dp_train_step(
            state, init_adam(state), stack_cameras(cams), gts,
            jnp.int32(1), bg, opt=opt, sh_degree=0, cfg=CFG, width=W, height=H,
        )
        np.testing.assert_allclose(
            np.asarray(s_dp.xyz_grad_accum), accs[0] + accs[1], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_dp.denom), denoms[0] + denoms[1], atol=1e-6
        )

    def test_depth_losses_wired(self):
        b = 4
        state = make_state(seed=5)
        cams = make_cams(b)
        rng = np.random.default_rng(4)
        gt = jnp.asarray(rng.uniform(0, 1, (b, 3, H, W)).astype(np.float32))
        d_cam = jnp.asarray(rng.uniform(0.5, 5.0, (b, 1, H, W)).astype(np.float32))
        d_est = jnp.asarray(rng.uniform(0.5, 5.0, (b, 1, H, W)).astype(np.float32))
        bg = jnp.zeros(3, jnp.float32)
        opt = OptParams(depth_from_iter=0)

        _, _, m_plain = dp_train_step(
            state, init_adam(state), stack_cameras(cams), gt,
            jnp.int32(10), bg,
            opt=opt, sh_degree=0, cfg=CFG, width=W, height=H,
        )
        _, _, m_depth = dp_train_step(
            state, init_adam(state), stack_cameras(cams), gt,
            jnp.int32(10), bg, d_cam, d_est,
            opt=opt, sh_degree=0, cfg=CFG, width=W, height=H,
            has_depth_cam=True, has_depth_est=True,
        )
        assert float(m_depth["loss"]) > float(m_plain["loss"])


class TestDryrunContract:
    def test_dryrun_multichip(self):
        import subprocess
        import sys
        import os

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = (
            f"import sys; sys.path.insert(0, {here!r}); "
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
        )
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=480,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "ok" in r.stdout
