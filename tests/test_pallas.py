"""Pallas rasterizer tests (interpreter mode on CPU): forward parity with
the XLA golden path and custom-VJP gradient parity with autodiff."""

import numpy as np
import jax
import jax.numpy as jnp

from scorp_tpu.ops.raster import RasterConfig, rasterize_xla
from scorp_tpu.ops.raster.pallas import rasterize_pallas
from scorp_tpu.ops.raster.pallas_fwd import rasterize_pallas_fwd_only
from tests.test_raster import BG, CAM, make_scene

CFG = RasterConfig(max_keys=1 << 14, tile_list_len=256, chunk=16, pallas_chunk=128)


class TestPallasForward:
    def test_matches_xla(self):
        xyz, scales, quats, opa, shs = make_scene(n=150, seed=2)
        out_x = rasterize_xla(
            xyz, opa, CAM, BG, shs=shs, sh_degree=3, scales=scales, quats=quats, cfg=CFG
        )
        out_p = rasterize_pallas_fwd_only(
            xyz, opa, CAM, BG, shs=shs, sh_degree=3, scales=scales, quats=quats,
            cfg=CFG, interpret=True,
        )
        # ~2e-5 relative: the kernel runs the transmittance recurrence in log
        # space (exp/log round trip) and evaluates the Gaussian exponent in
        # quadratic-basis form on the MXU — both reorder f32 arithmetic.
        np.testing.assert_allclose(out_p.color, out_x.color, atol=5e-5)
        np.testing.assert_allclose(out_p.alpha, out_x.alpha, atol=5e-5)
        np.testing.assert_allclose(out_p.depth_accum, out_x.depth_accum, atol=2e-4)
        np.testing.assert_array_equal(out_p.radii, out_x.radii)

    def test_differentiable_path_forward(self):
        xyz, scales, quats, opa, shs = make_scene(n=80, seed=3)
        out_x = rasterize_xla(
            xyz, opa, CAM, BG, shs=shs, sh_degree=0, scales=scales, quats=quats, cfg=CFG
        )
        out_p = rasterize_pallas(
            xyz, opa, CAM, BG, shs=shs, sh_degree=0, scales=scales, quats=quats,
            cfg=CFG, interpret=True,
        )
        np.testing.assert_allclose(out_p.color, out_x.color, atol=5e-5)


class TestPallasVJP:
    def test_grads_match_xla(self):
        xyz, scales, quats, opa, shs = make_scene(n=96, seed=5)
        target = jnp.zeros((3, 48, 64))
        deltas = jnp.zeros((96, 2))

        def loss(raster, interp):
            def f(xyz, scales, quats, opa, shs, deltas):
                kw = {"interpret": True} if interp else {}
                out = raster(
                    xyz, opa, CAM, BG, shs=shs, sh_degree=1,
                    scales=scales, quats=quats, screen_deltas=deltas, cfg=CFG, **kw
                )
                return (
                    ((out.color - target) ** 2).mean()
                    + 0.1 * (out.alpha ** 2).mean()
                    + 0.05 * (out.depth_accum ** 2).mean()
                )
            return f

        g_x = jax.grad(loss(rasterize_xla, False), argnums=(0, 1, 2, 3, 4, 5))(
            xyz, scales, quats, opa, shs, deltas
        )
        g_p = jax.grad(loss(rasterize_pallas, True), argnums=(0, 1, 2, 3, 4, 5))(
            xyz, scales, quats, opa, shs, deltas
        )
        names = ["xyz", "scales", "quats", "opa", "shs", "deltas"]
        for a, b, name in zip(g_p, g_x, names):
            scale = max(float(jnp.abs(b).max()), 1e-8)
            np.testing.assert_allclose(a, b, atol=2e-5 * max(scale, 1.0) + 1e-9,
                                       err_msg=name)

    def test_bg_gradient(self):
        xyz, scales, quats, opa, shs = make_scene(n=32, seed=7)

        def f_bg(raster, interp):
            def f(bg):
                kw = {"interpret": True} if interp else {}
                out = raster(
                    xyz, opa, CAM, bg, shs=shs, sh_degree=0,
                    scales=scales, quats=quats, cfg=CFG, **kw
                )
                return (out.color ** 2).mean()
            return f

        g_x = jax.grad(f_bg(rasterize_xla, False))(BG)
        g_p = jax.grad(f_bg(rasterize_pallas, True))(BG)
        np.testing.assert_allclose(g_p, g_x, atol=1e-6)


class TestPallasSurfel:
    def test_surfel_kernel_matches_xla(self):
        from scorp_tpu.ops.raster.pallas_surfel import rasterize_surfel_pallas_fwd_only
        from scorp_tpu.ops.raster.surfel import rasterize_surfel_xla

        rng = np.random.default_rng(5)
        n = 60
        xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
        scales = jnp.asarray(np.exp(rng.normal(np.log(0.25), 0.3, (n, 2))).astype(np.float32))
        quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        opa = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        bg = jnp.array([0.1, 0.2, 0.3])
        a = rasterize_surfel_xla(
            xyz, opa, CAM, bg, colors_precomp=colors, scales=scales, quats=quats, cfg=CFG
        )
        b = rasterize_surfel_pallas_fwd_only(
            xyz, opa, CAM, bg, colors_precomp=colors, scales=scales, quats=quats,
            cfg=CFG, interpret=True,
        )
        for name in ["color", "alpha", "depth_accum", "normal", "depth_median", "distortion"]:
            # 2e-5: bf16x2 scan contractions (SCAN_BF16X2) round the scan
            # inputs to 16 mantissa bits (~1e-5 noise on w*z sums)
            np.testing.assert_allclose(
                getattr(b, name), getattr(a, name), atol=2e-5, err_msg=name
            )
        np.testing.assert_array_equal(a.radii, b.radii)


def make_saturating_scene(n=400, seed=11):
    """Splats stacked over the same screen area with alpha ~0.07 each:
    transmittance crosses the 1e-4 termination threshold around key ~127,
    mid-stream relative to pallas_chunk=128, with hundreds of keys behind it
    — the regression case for the sticky-done rule and the n_contrib
    prefix semantics (post-termination keys must stay excluded)."""
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.05, 0.05, size=(n, 3)).astype(np.float32)
    xyz[:, 2] = np.linspace(-0.5, 0.5, n)  # well-spread depths
    scales = np.full((n, 3), 1.5, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opacity = np.full(n, 0.07, np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    from scorp_tpu.core.sh import rgb_to_sh

    shs[:, 0, :] = rgb_to_sh(colors)
    return (
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacity), jnp.asarray(shs),
    )


SAT_CFG = RasterConfig(max_keys=1 << 14, tile_list_len=512, chunk=16, pallas_chunk=128)


class TestSaturation:
    def test_forward_matches_xla_when_saturated(self):
        xyz, scales, quats, opa, shs = make_saturating_scene()
        out_x = rasterize_xla(
            xyz, opa, CAM, BG, shs=shs, sh_degree=0, scales=scales, quats=quats,
            cfg=SAT_CFG,
        )
        # nearly every pixel must actually terminate for this to regress-test
        assert float(jnp.mean(out_x.alpha)) > 0.999
        out_p = rasterize_pallas_fwd_only(
            xyz, opa, CAM, BG, shs=shs, sh_degree=0, scales=scales, quats=quats,
            cfg=SAT_CFG, interpret=True,
        )
        # atol 2e-5, not 3e-6: the render path's telescoped Σ-weight alpha
        # (pallas_fwd, bf16x3 accumulation) rounds ~1e-5 absolute at
        # saturated pixels — far below the 5e-3 parity budget and the
        # orders-of-magnitude inflation this test regression-guards
        np.testing.assert_allclose(out_p.color, out_x.color, atol=2e-5)
        np.testing.assert_allclose(out_p.alpha, out_x.alpha, atol=2e-5)
        np.testing.assert_allclose(out_p.depth_accum, out_x.depth_accum, atol=3e-5)

    def test_grads_match_xla_when_saturated(self):
        xyz, scales, quats, opa, shs = make_saturating_scene(n=320, seed=12)
        target = jnp.zeros((3, 48, 64))

        def f(raster, interp):
            def loss(xyz, opa):
                kw = {"interpret": True} if interp else {}
                out = raster(
                    xyz, opa, CAM, BG, shs=shs, sh_degree=0,
                    scales=scales, quats=quats, cfg=SAT_CFG, **kw
                )
                return jnp.sum((out.color - target) ** 2) + jnp.sum(out.alpha)
            return loss

        gx = jax.grad(f(rasterize_xla, False), argnums=(0, 1))(xyz, opa)
        gp = jax.grad(f(rasterize_pallas, True), argnums=(0, 1))(xyz, opa)
        # gradients at saturated pixels hinge on excluding post-termination
        # keys; the old non-sticky kernel inflated these by orders of magnitude
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


class TestCompactBwdScatter:
    """bwd_block_frac compacts the gradient scatter to covered chunk blocks;
    gradients must match the uncompacted scatter, and an undersized cap must
    take the cond fallback (full scatter) rather than dropping blocks."""

    def _grads_3dgs(self, cfg):
        xyz, scales, quats, opa, shs = make_scene(n=96, seed=5)
        target = jnp.zeros((3, 48, 64))

        def loss(xyz, scales, quats, opa, shs):
            out = rasterize_pallas(
                xyz, opa, CAM, BG, shs=shs, sh_degree=1,
                scales=scales, quats=quats, cfg=cfg, interpret=True,
            )
            return (
                ((out.color - target) ** 2).mean()
                + 0.1 * (out.alpha ** 2).mean()
                + 0.05 * (out.depth_accum ** 2).mean()
            )

        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            xyz, scales, quats, opa, shs
        )

    def test_3dgs_compact_matches_full(self):
        base = self._grads_3dgs(CFG)
        # n_blocks = 16384/128 = 128; frac 0.66 -> cap 84 >> covered (~12
        # tiles' worth), so the compact branch is the one exercised
        compact = self._grads_3dgs(CFG._replace(bwd_block_frac=0.66))
        # cap = max(1, int(128*0.008)) = 1 < covered -> cond fallback
        fallback = self._grads_3dgs(CFG._replace(bwd_block_frac=0.008))
        for got, ref in [(compact, base), (fallback, base)]:
            for a, b in zip(got, ref):
                scale = max(float(jnp.abs(b).max()), 1e-8)
                np.testing.assert_allclose(a, b, atol=1e-6 * max(scale, 1.0))

    def test_surfel_compact_matches_full(self):
        from scorp_tpu.ops.raster.pallas_surfel_train import rasterize_surfel_pallas

        rng = np.random.default_rng(13)
        n = 60
        xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
        scales = jnp.asarray(
            np.exp(rng.normal(np.log(0.25), 0.3, (n, 2))).astype(np.float32)
        )
        quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        opa = jnp.asarray(rng.uniform(0.2, 0.9, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        bg = jnp.zeros(3)

        def grads(cfg):
            def loss(xyz, scales, quats, opa, colors):
                out = rasterize_surfel_pallas(
                    xyz, opa, CAM, bg, colors_precomp=colors,
                    scales=scales, quats=quats, cfg=cfg, interpret=True,
                )
                return (
                    (out.color ** 2).mean()
                    + 0.1 * (out.depth_accum ** 2).mean()
                    + 0.05 * (out.depth_median ** 2).mean()
                    + 0.5 * out.distortion.mean()
                )
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                xyz, scales, quats, opa, colors
            )

        base = grads(CFG)
        compact = grads(CFG._replace(bwd_block_frac=0.66))
        fallback = grads(CFG._replace(bwd_block_frac=0.008))
        for got in [compact, fallback]:
            for a, b in zip(got, base):
                scale = max(float(jnp.abs(b).max()), 1e-8)
                np.testing.assert_allclose(a, b, atol=1e-6 * max(scale, 1.0))


class TestPallasSurfelTrain:
    def _scene(self, n=70, seed=9):
        rng = np.random.default_rng(seed)
        xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
        scales = jnp.asarray(
            np.exp(rng.normal(np.log(0.25), 0.3, (n, 2))).astype(np.float32)
        )
        quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        opa = jnp.asarray(rng.uniform(0.2, 0.9, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        return xyz, scales, quats, opa, colors

    def test_forward_matches_xla(self):
        from scorp_tpu.ops.raster.pallas_surfel_train import rasterize_surfel_pallas
        from scorp_tpu.ops.raster.surfel import rasterize_surfel_xla

        xyz, scales, quats, opa, colors = self._scene()
        bg = jnp.array([0.1, 0.2, 0.3])
        a = rasterize_surfel_xla(
            xyz, opa, CAM, bg, colors_precomp=colors, scales=scales, quats=quats,
            cfg=CFG,
        )
        b = rasterize_surfel_pallas(
            xyz, opa, CAM, bg, colors_precomp=colors, scales=scales, quats=quats,
            cfg=CFG, interpret=True,
        )
        for name in ["color", "alpha", "depth_accum", "normal", "depth_median",
                     "distortion"]:
            np.testing.assert_allclose(
                getattr(b, name), getattr(a, name), atol=2e-5, err_msg=name
            )
        np.testing.assert_array_equal(a.radii, b.radii)

    def test_grads_match_xla(self):
        from scorp_tpu.ops.raster.pallas_surfel_train import rasterize_surfel_pallas
        from scorp_tpu.ops.raster.surfel import rasterize_surfel_xla

        xyz, scales, quats, opa, colors = self._scene(n=60, seed=13)
        bg = jnp.array([0.0, 0.0, 0.0])
        tgt = jnp.full((3, 48, 64), 0.4)

        def make_loss(raster, interp):
            def loss(xyz, scales, quats, opa, colors):
                kw = {"interpret": True} if interp else {}
                out = raster(
                    xyz, opa, CAM, bg, colors_precomp=colors,
                    scales=scales, quats=quats, cfg=CFG, **kw
                )
                # exercise every differentiable channel like train_2dgs
                return (
                    ((out.color - tgt) ** 2).mean()
                    + 0.2 * (out.alpha ** 2).mean()
                    + 0.1 * (out.depth_accum ** 2).mean()
                    + 0.1 * ((out.normal - 0.1) ** 2).mean()
                    + 0.05 * (out.depth_median ** 2).mean()
                    + 0.5 * out.distortion.mean()
                )
            return loss

        args = (xyz, scales, quats, opa, colors)
        gx = jax.grad(make_loss(rasterize_surfel_xla, False),
                      argnums=(0, 1, 2, 3, 4))(*args)
        gp = jax.grad(make_loss(rasterize_surfel_pallas, True),
                      argnums=(0, 1, 2, 3, 4))(*args)
        names = ["xyz", "scales", "quats", "opa", "colors"]
        for a, b, name in zip(gp, gx, names):
            scale = max(float(jnp.abs(b).max()), 1e-8)
            np.testing.assert_allclose(
                a, b, atol=3e-5 * max(scale, 1.0) + 1e-9, rtol=2e-4,
                err_msg=name,
            )
