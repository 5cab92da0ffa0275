"""Differentiable rasterizer tests: tiled XLA path vs naive golden renderer,
plus finite-difference gradient checks (the strategy SURVEY.md §4 calls for:
golden-image tests against a slow obviously-correct reference + VJP checks).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scorp_tpu.core.camera import look_at_camera
from scorp_tpu.core.sh import rgb_to_sh
from scorp_tpu.ops.raster import RasterConfig, rasterize_naive, rasterize_xla


def make_scene(n=128, seed=0, spread=1.0, scale=0.05, opacity_logit=1.0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(np.log(scale), 0.3, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = 1.0 / (1.0 + np.exp(-rng.normal(opacity_logit, 1.0, size=n))).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0, :] = rgb_to_sh(colors)
    shs[:, 1:, :] = rng.normal(0, 0.05, size=(n, 15, 3))
    return (
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacity), jnp.asarray(shs),
    )


CAM = look_at_camera(
    eye=[0, 0, -4.0], target=[0, 0, 0], up=[0, 1, 0],
    fovx=0.8, fovy=0.8, width=64, height=48,
)
BG = jnp.array([0.2, 0.3, 0.4], jnp.float32)
CFG = RasterConfig(max_keys=1 << 14, tile_list_len=256, chunk=16)


class TestForward:
    def test_tiled_matches_naive(self):
        xyz, scales, quats, opa, shs = make_scene(n=200, seed=1)
        out_t = rasterize_xla(
            xyz, opa, CAM, BG, shs=shs, sh_degree=3, scales=scales, quats=quats, cfg=CFG
        )
        out_n = rasterize_naive(
            xyz, opa, CAM, BG, shs=shs, sh_degree=3, scales=scales, quats=quats
        )
        assert int(out_t.num_dropped_keys) == 0
        assert int(out_t.num_dropped_tail) == 0
        np.testing.assert_allclose(out_t.color, out_n.color, atol=2e-5)
        np.testing.assert_allclose(out_t.alpha, out_n.alpha, atol=2e-5)
        np.testing.assert_allclose(out_t.depth_accum, out_n.depth_accum, atol=1e-4)
        np.testing.assert_array_equal(out_t.radii, out_n.radii)

    def test_empty_scene_renders_background(self):
        xyz, scales, quats, opa, shs = make_scene(n=8)
        out = rasterize_xla(
            xyz, jnp.zeros_like(opa), CAM, BG, shs=shs, sh_degree=0,
            scales=scales, quats=quats, cfg=CFG,
        )
        expected = np.broadcast_to(np.asarray(BG)[:, None, None], (3, 48, 64))
        np.testing.assert_allclose(out.color, expected, atol=1e-6)
        np.testing.assert_allclose(out.alpha, 0.0, atol=1e-6)

    def test_behind_camera_culled(self):
        xyz = jnp.array([[0.0, 0.0, -10.0]])  # behind (camera at z=-4 looking +z)
        scales = jnp.full((1, 3), 0.1)
        quats = jnp.array([[1.0, 0, 0, 0.0]])
        opa = jnp.array([0.9])
        colors = jnp.array([[1.0, 0, 0]])
        out = rasterize_xla(
            xyz, opa, CAM, BG, colors_precomp=colors, scales=scales, quats=quats, cfg=CFG
        )
        assert int(out.radii[0]) == 0
        expected = np.broadcast_to(np.asarray(BG)[:, None, None], (3, 48, 64))
        np.testing.assert_allclose(out.color, expected, atol=1e-6)

    def test_single_gaussian_center(self):
        # opaque gaussian dead center -> center pixel dominated by its color
        xyz = jnp.array([[0.0, 0.0, 0.0]])
        scales = jnp.full((1, 3), 0.3)
        quats = jnp.array([[1.0, 0, 0, 0.0]])
        opa = jnp.array([0.99])
        colors = jnp.array([[1.0, 0.0, 0.0]])
        out = rasterize_xla(
            xyz, opa, CAM, BG, colors_precomp=colors, scales=scales, quats=quats, cfg=CFG
        )
        center = np.asarray(out.color[:, 24, 32])
        assert center[0] > 0.9 and center[1] < 0.1
        assert int(out.radii[0]) > 0

    def test_alive_mask(self):
        xyz, scales, quats, opa, shs = make_scene(n=64, seed=3)
        alive = jnp.arange(64) < 32
        out_masked = rasterize_xla(
            xyz, opa, CAM, BG, shs=shs, sh_degree=1, scales=scales, quats=quats,
            alive=alive, cfg=CFG,
        )
        out_subset = rasterize_naive(
            xyz[:32], opa[:32], CAM, BG, shs=shs[:32], sh_degree=1,
            scales=scales[:32], quats=quats[:32],
        )
        np.testing.assert_allclose(out_masked.color, out_subset.color, atol=2e-5)
        assert np.all(np.asarray(out_masked.radii[32:]) == 0)

    def test_depth_ordering(self):
        # nearer opaque gaussian must occlude the farther one
        xyz = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])  # first is nearer
        scales = jnp.full((2, 3), 0.3)
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
        opa = jnp.array([0.99, 0.99])
        colors = jnp.array([[1.0, 0, 0], [0.0, 1.0, 0]])
        out = rasterize_xla(
            xyz, opa, CAM, BG, colors_precomp=colors, scales=scales, quats=quats, cfg=CFG
        )
        center = np.asarray(out.color[:, 24, 32])
        assert center[0] > 0.8 and center[1] < 0.2
        # and reversed storage order must give the same image (sort works)
        out2 = rasterize_xla(
            xyz[::-1], opa[::-1], CAM, BG, colors_precomp=colors[::-1],
            scales=scales, quats=quats, cfg=CFG,
        )
        np.testing.assert_allclose(out.color, out2.color, atol=1e-6)

    def test_key_overflow_reported(self):
        xyz, scales, quats, opa, shs = make_scene(n=256, seed=5, scale=0.3)
        tiny = RasterConfig(max_keys=64, tile_list_len=64, chunk=16)
        out = rasterize_xla(
            xyz, opa, CAM, BG, shs=shs, sh_degree=0, scales=scales, quats=quats, cfg=tiny
        )
        assert int(out.num_dropped_keys) > 0


class TestGradients:
    def _loss_fn(self, target):
        def loss(xyz, scales, quats, opa, shs, deltas):
            out = rasterize_xla(
                xyz, opa, CAM, BG, shs=shs, sh_degree=1, scales=scales, quats=quats,
                screen_deltas=deltas, cfg=CFG,
            )
            return ((out.color - target) ** 2).mean() + 0.1 * (out.alpha**2).mean()
        return loss

    def test_grads_match_naive_autodiff(self):
        xyz, scales, quats, opa, shs = make_scene(n=96, seed=7)
        target = jnp.zeros((3, 48, 64))
        deltas = jnp.zeros((96, 2))

        def loss_naive(xyz, scales, quats, opa, shs, deltas):
            out = rasterize_naive(
                xyz, opa, CAM, BG, shs=shs, sh_degree=1, scales=scales, quats=quats,
                screen_deltas=deltas,
            )
            return ((out.color - target) ** 2).mean() + 0.1 * (out.alpha**2).mean()

        g_t = jax.grad(self._loss_fn(target), argnums=(0, 1, 2, 3, 4, 5))(
            xyz, scales, quats, opa, shs, deltas
        )
        g_n = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4, 5))(
            xyz, scales, quats, opa, shs, deltas
        )
        for a, b, name in zip(g_t, g_n, ["xyz", "scales", "quats", "opa", "shs", "deltas"]):
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-3, err_msg=name)

    def test_finite_difference_opacity(self):
        xyz, scales, quats, opa, shs = make_scene(n=24, seed=9)
        target = jnp.zeros((3, 48, 64))
        deltas = jnp.zeros((24, 2))
        loss = self._loss_fn(target)
        g = jax.grad(loss, argnums=3)(xyz, scales, quats, opa, shs, deltas)
        eps = 1e-3
        rng = np.random.default_rng(0)
        for i in rng.choice(24, size=4, replace=False):
            dopa = opa.at[i].add(eps)
            dopa2 = opa.at[i].add(-eps)
            fd = (loss(xyz, scales, quats, dopa, shs, deltas)
                  - loss(xyz, scales, quats, dopa2, shs, deltas)) / (2 * eps)
            assert abs(float(g[i]) - float(fd)) < 5e-3 * max(1.0, abs(float(fd))), (
                f"gaussian {i}: analytic {float(g[i])}, fd {float(fd)}"
            )

    def test_finite_difference_xyz(self):
        xyz, scales, quats, opa, shs = make_scene(n=24, seed=11)
        target = jnp.zeros((3, 48, 64))
        deltas = jnp.zeros((24, 2))
        loss = self._loss_fn(target)
        g = jax.grad(loss, argnums=0)(xyz, scales, quats, opa, shs, deltas)
        eps = 2e-3
        rng = np.random.default_rng(1)
        checked = 0
        for i in rng.choice(24, size=6, replace=False):
            for d in range(3):
                x1 = xyz.at[i, d].add(eps)
                x2 = xyz.at[i, d].add(-eps)
                fd = (loss(x1, scales, quats, opa, shs, deltas)
                      - loss(x2, scales, quats, opa, shs, deltas)) / (2 * eps)
                an = float(g[i, d])
                if abs(float(fd)) < 1e-5 and abs(an) < 1e-5:
                    continue
                # tile-membership changes make fd noisy; tolerate 10% relative
                if abs(an - float(fd)) < 0.1 * max(abs(an), abs(float(fd)), 1e-3):
                    checked += 1
        assert checked >= 8  # most probes must agree

    def test_screen_delta_grads_nonzero(self):
        xyz, scales, quats, opa, shs = make_scene(n=48, seed=13)
        target = jnp.zeros((3, 48, 64))
        deltas = jnp.zeros((48, 2))
        g = jax.grad(self._loss_fn(target), argnums=5)(xyz, scales, quats, opa, shs, deltas)
        # visible gaussians must receive a screen-space gradient signal
        out = rasterize_xla(
            xyz, opa, CAM, BG, shs=shs, sh_degree=1, scales=scales, quats=quats, cfg=CFG
        )
        visible = np.asarray(out.radii) > 0
        norms = np.linalg.norm(np.asarray(g), axis=1)
        assert norms[visible].max() > 0
        assert np.all(norms[~visible] == 0)


class TestEllipseTileCull:
    """The in-expansion exact ellipse-vs-tile cull must never drop a key
    whose gaussian reaches alpha >= 1/255 anywhere on its tile (such a drop
    would change the composite); verified brute-force per surviving vs
    culled key."""

    def _max_tile_alpha(self, prep, ktx, kty, g_of_k, order):
        """Brute-force max alpha of key's gaussian over its 16x16 tile."""
        xy = np.asarray(prep.xy)[np.asarray(order)]
        conic = np.asarray(prep.conic)[np.asarray(order)]
        opa = np.asarray(prep.opacity)[np.asarray(order)]
        px = np.arange(16)[None, :] + 16 * np.asarray(ktx)[:, None]  # [K,16]
        py = np.arange(16)[None, :] + 16 * np.asarray(kty)[:, None]
        g = np.asarray(g_of_k)
        out = []
        for k in range(len(g)):
            gx, gy = xy[g[k]]
            a, b, c = conic[g[k]]
            X, Y = np.meshgrid(px[k], py[k])
            d_x, d_y = gx - X, gy - Y
            power = -0.5 * (a * d_x**2 + c * d_y**2) - b * d_x * d_y
            alpha = np.minimum(0.99, opa[g[k]] * np.exp(np.minimum(power, 0.0)))
            alpha = np.where(power > 0.0, 0.0, alpha)
            out.append(alpha.max())
        return np.array(out)

    def test_cull_is_output_invariant(self):
        from scorp_tpu.ops.raster.common import _expand_keys_core, preprocess

        xyz, scales, quats, opa, shs = make_scene(n=96, seed=21, scale=0.15,
                                                  opacity_logit=-0.5)
        prep = preprocess(xyz, opa, CAM, shs=shs, sh_degree=1,
                          scales=scales, quats=quats)
        k_cap = CFG.max_keys
        t0, g0, order, total, x0, y0, r0, kept0 = jax.jit(
            lambda p: _expand_keys_core(p, 64, 48, k_cap, cull=False)
        )(prep)
        t1, g1, _, _, x1, y1, r1, kept1 = jax.jit(
            lambda p: _expand_keys_core(p, 64, 48, k_cap, cull=True)
        )(prep)
        r0 = np.asarray(r0)
        r1 = np.asarray(r1)
        assert int(kept1) < int(kept0)  # the cull does something
        # culled = in_range before but not after
        culled = r0 & ~r1
        keptm = r1
        amax = self._max_tile_alpha(prep, x0, y0, np.maximum(np.asarray(g0), 0),
                                    order)
        # no culled key reaches the alpha threshold on its tile
        assert amax[culled].max(initial=0.0) < 1.0 / 255.0
        # sanity: plenty of kept keys do contribute
        assert (amax[keptm] >= 1.0 / 255.0).mean() > 0.3

    def _max_tile_alpha_vec(self, prep, ktx, kty, g_of_k, order, mask):
        """Vectorized brute-force max tile alpha, restricted to mask."""
        xy = np.asarray(prep.xy)[np.asarray(order)]
        conic = np.asarray(prep.conic)[np.asarray(order)]
        opa = np.asarray(prep.opacity)[np.asarray(order)]
        idx = np.nonzero(mask)[0]
        out = np.zeros(len(idx), np.float32)
        pix = np.arange(16, dtype=np.float32)
        for lo in range(0, len(idx), 4096):
            sl = idx[lo:lo + 4096]
            g = g_of_k[sl]
            a, b, c = conic[g, 0], conic[g, 1], conic[g, 2]
            dx = xy[g, 0][:, None] - (ktx[sl][:, None] * 16.0 + pix[None, :])
            dy = xy[g, 1][:, None] - (kty[sl][:, None] * 16.0 + pix[None, :])
            power = (
                -0.5 * (a[:, None, None] * dx[:, None, :] ** 2
                        + c[:, None, None] * dy[:, :, None] ** 2)
                - b[:, None, None] * dx[:, None, :] * dy[:, :, None]
            )
            alpha = np.where(
                power > 0.0, 0.0,
                np.minimum(0.99, opa[g][:, None, None]
                           * np.exp(np.minimum(power, 0.0))),
            )
            out[lo:lo + len(sl)] = alpha.reshape(len(sl), -1).max(axis=1)
        return out

    def test_cull_conservative_large_anisotropic(self):
        """Advisor regression (round 2): bf16 cancellation on large thin
        rotated gaussians at high resolution must not cull keys whose true
        f32 max tile alpha reaches 1/255 — the terms of q reach 1e4-1e5 at
        tile distances of hundreds of px, so the tolerance must track the
        actual packing-error magnitude (qabs), not a constant."""
        from scorp_tpu.ops.raster.common import _expand_keys_core, preprocess

        rng = np.random.default_rng(7)
        n = 64
        cam = look_at_camera(
            eye=[0, 0, -4.0], target=[0, 0, 0], up=[0, 1, 0],
            fovx=1.1, fovy=0.9, width=1024, height=768,
        )
        xyz = jnp.asarray(rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32))
        s_long = np.exp(rng.uniform(np.log(0.5), np.log(1.5), n))
        s_thin = np.exp(rng.uniform(np.log(0.004), np.log(0.05), n))
        s_mid = np.exp(rng.uniform(np.log(0.05), np.log(0.3), n))
        scales = jnp.asarray(np.stack([s_long, s_thin, s_mid], 1).astype(np.float32))
        quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        opa = jnp.asarray(rng.uniform(0.3, 0.99, n).astype(np.float32))
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        prep = preprocess(xyz, opa, cam, colors_precomp=colors,
                          scales=scales, quats=quats)
        k_cap = 1 << 19
        t0, g0, order, total, x0, y0, r0, kept0 = jax.jit(
            lambda p: _expand_keys_core(p, 1024, 768, k_cap, cull=False)
        )(prep)
        _, _, _, _, _, _, r1, kept1 = jax.jit(
            lambda p: _expand_keys_core(p, 1024, 768, k_cap, cull=True)
        )(prep)
        assert int(total) <= k_cap, "test scene overflows key capacity"
        r0 = np.asarray(r0)
        r1 = np.asarray(r1)
        culled = r0 & ~r1
        assert culled.any()                # the cull still fires
        assert int(kept1) < int(kept0)
        amax = self._max_tile_alpha_vec(
            prep, np.asarray(x0), np.asarray(y0),
            np.maximum(np.asarray(g0), 0), order, culled,
        )
        assert amax.max(initial=0.0) < 1.0 / 255.0


class TestTunedConfig:
    """The trainer apps must run the benched configuration, and regrow must
    preserve every field it does not intend to change (round-2 verdict:
    the overflow path silently dropped pallas_chunk/stream_keys)."""

    def test_tuned_defaults(self):
        from scorp_tpu.render import tuned_raster_config

        cfg = tuned_raster_config(250_000)
        assert cfg.pallas_chunk == 128
        assert cfg.stream_keys == cfg.max_keys // 4 * 3
        assert cfg.stream_keys % 128 == 0

    def test_regrow_preserves_fields(self):
        from scorp_tpu.render import regrow_config, tuned_raster_config

        cfg = tuned_raster_config(250_000, chunk=32)
        g = regrow_config(cfg, 5, 0)
        assert g.max_keys == 2 * cfg.max_keys
        assert g.stream_keys == 2 * cfg.stream_keys
        assert (g.tile_list_len, g.chunk, g.pallas_chunk) == (
            cfg.tile_list_len, cfg.chunk, cfg.pallas_chunk)
        g2 = regrow_config(cfg, 0, 3)
        assert g2.tile_list_len == 2 * cfg.tile_list_len
        assert (g2.max_keys, g2.stream_keys, g2.chunk, g2.pallas_chunk) == (
            cfg.max_keys, cfg.stream_keys, cfg.chunk, cfg.pallas_chunk)
        assert regrow_config(cfg, 0, 0) == cfg
        # stream trim off stays off
        g3 = regrow_config(cfg._replace(stream_keys=0), 1, 0)
        assert g3.stream_keys == 0


class TestCompactRouting:
    """Compact training-stream routing invariants (sorted key positions
    ARE stream positions; scatter slots past the kept total carry the
    drop sentinel)."""

    def test_compact_invariants(self):
        from scorp_tpu.ops.raster.common import preprocess
        from scorp_tpu.ops.raster.pallas import _compact_routing

        xyz, scales, quats, opa, shs = make_scene(n=150, seed=2)
        prep = preprocess(xyz, opa, CAM, shs=shs, sh_degree=1,
                          scales=scales, quats=quats)
        cfg = CFG._replace(pallas_chunk=128)
        g_pad, g_drop, tstart, tcount, dropped, order, _ = jax.jit(
            lambda p: _compact_routing(p, 64, 48, cfg)
        )(prep)
        a = np.asarray(tstart)
        c = np.asarray(tcount)
        n = xyz.shape[0]
        chunk = cfg.pallas_chunk
        k2 = cfg.stream_cap
        k_pad = -(-k2 // chunk) * chunk
        assert int(dropped) == 0
        # tile segments are contiguous: positions are the sorted order
        for t in range(len(a) - 1):
            assert a[t + 1] == a[t] + c[t]
        # non-sentinel scatter slots == kept keys, all ids in range
        gd = np.asarray(g_drop)
        assert len(gd) == k_pad
        assert (gd != n).sum() == c.sum()
        assert gd.max() <= n
        # sentinel slots are exactly the tail past the kept total
        k_end = a[-1] + c[-1]
        assert (gd[:k_end] != n).all() and (gd[k_end:] == n).all()
        # gather ids cover the compact stream and match scatter ids on
        # live slots
        gp = np.asarray(g_pad)
        assert len(gp) == k2
        np.testing.assert_array_equal(gp[:k_end], gd[:k_end])


class TestPallasExpand:
    """The Pallas expansion kernel must reproduce the XLA expansion's
    sorted (tile, depth-rank) stream exactly (cull=False), and with
    cull=True may only drop ADDITIONAL keys that are non-contributing
    (its f32 cull is tighter than the XLA path's bf16-packed one)."""

    def _xla_keys(self, prep, w, h, k_cap, cull):
        from scorp_tpu.ops.raster.common import _expand_keys_core

        tile, g_of_k, order, total, ktx, kty, in_range, kept = jax.jit(
            lambda p: _expand_keys_core(p, w, h, k_cap, cull=cull)
        )(prep)
        t = np.asarray(tile)
        g = np.maximum(np.asarray(g_of_k), 0)
        r = np.asarray(in_range)
        return set(zip(t[r].tolist(), g[r].tolist())), order, ktx, kty, g_of_k, r

    def _kernel_keys(self, prep, w, h, k_cap, cull):
        from scorp_tpu.ops.raster.common import grid_dims
        from scorp_tpu.ops.raster.pallas_expand import expand_sorted_keys

        packed, order, total, kept, bits_g, _ = jax.jit(
            lambda p: expand_sorted_keys(p, w, h, k_cap, cull=cull,
                                         interpret=True)
        )(prep)
        tiles_x, tiles_y = grid_dims(w, h)
        pk = np.asarray(packed)
        live = (pk >> bits_g) < tiles_x * tiles_y
        t = (pk[live] >> bits_g).tolist()
        g = (pk[live] & ((1 << bits_g) - 1)).tolist()
        assert int(kept) == live.sum()
        return set(zip(t, g)), order

    def test_matches_xla_no_cull(self):
        from scorp_tpu.ops.raster.common import preprocess

        xyz, scales, quats, opa, shs = make_scene(n=150, seed=2)
        prep = preprocess(xyz, opa, CAM, shs=shs, sh_degree=1,
                          scales=scales, quats=quats)
        k_cap = 1 << 14
        keys_x, order_x, *_ = self._xla_keys(prep, 64, 48, k_cap, cull=False)
        keys_k, order_k = self._kernel_keys(prep, 64, 48, k_cap, cull=False)
        np.testing.assert_array_equal(order_x, order_k)
        assert keys_x == keys_k

    def test_cull_subset_and_output_invariant(self):
        from scorp_tpu.ops.raster.common import preprocess

        xyz, scales, quats, opa, shs = make_scene(n=96, seed=21, scale=0.15,
                                                  opacity_logit=-0.5)
        prep = preprocess(xyz, opa, CAM, shs=shs, sh_degree=1,
                          scales=scales, quats=quats)
        k_cap = 1 << 14
        keys_x, order, ktx, kty, g_of_k, r = self._xla_keys(
            prep, 64, 48, k_cap, cull=True)
        keys_k, _ = self._kernel_keys(prep, 64, 48, k_cap, cull=True)
        assert keys_k <= keys_x
        extra = keys_x - keys_k
        if extra:
            # every additionally-culled key is non-contributing
            cull_test = TestEllipseTileCull()
            t = np.asarray(ktx) + 0  # map (tile,g) back via brute force
            tiles_x = 4
            mask = np.zeros(len(np.asarray(g_of_k)), bool)
            tile_arr = np.asarray(kty) * tiles_x + np.asarray(ktx)
            g_arr = np.maximum(np.asarray(g_of_k), 0)
            for k in range(len(mask)):
                if r[k] and (int(tile_arr[k]), int(g_arr[k])) in extra:
                    mask[k] = True
            amax = cull_test._max_tile_alpha_vec(
                prep, np.asarray(ktx), np.asarray(kty), g_arr, order, mask)
            assert amax.max(initial=0.0) < 1.0 / 255.0


class TestGatherRowsMixed:
    def test_value_and_grad(self):
        from scorp_tpu.ops.raster.common import gather_rows_mixed

        rng = np.random.default_rng(11)
        n, c = 64, 5
        extra = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        aux16 = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 6), dtype=np.uint16))
        idx = jnp.asarray(rng.integers(0, n, size=100, dtype=np.int32))

        ex, aux = jax.jit(gather_rows_mixed)(extra, aux16, idx)
        np.testing.assert_array_equal(np.asarray(ex), np.asarray(extra)[np.asarray(idx)])
        np.testing.assert_array_equal(np.asarray(aux), np.asarray(aux16)[np.asarray(idx)])

        # VJP of the f32 block = scatter-add by idx; aux/idx get no tangent
        w = jnp.asarray(rng.normal(size=(100, c)).astype(np.float32))
        g = jax.grad(lambda e: jnp.sum(gather_rows_mixed(e, aux16, idx)[0] * w))(extra)
        expected = np.zeros((n, c), np.float32)
        np.add.at(expected, np.asarray(idx), np.asarray(w))
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)

    def test_perm_variant_value_and_grad(self):
        from scorp_tpu.ops.raster.common import (
            fast_gather_rows_perm,
            gather_rows_mixed_perm,
        )

        rng = np.random.default_rng(12)
        n, c = 96, 7
        extra = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        aux16 = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 5), dtype=np.uint16))
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))

        ex, aux = jax.jit(gather_rows_mixed_perm)(extra, aux16, perm)
        np.testing.assert_array_equal(np.asarray(ex), np.asarray(extra)[np.asarray(perm)])
        np.testing.assert_array_equal(np.asarray(aux), np.asarray(aux16)[np.asarray(perm)])

        # permutation VJP: d_extra = w unpermuted (exact: inverse gather)
        w = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        g = jax.grad(
            lambda e: jnp.sum(gather_rows_mixed_perm(e, aux16, perm)[0] * w)
        )(extra)
        expected = np.zeros((n, c), np.float32)
        expected[np.asarray(perm)] = np.asarray(w)
        np.testing.assert_array_equal(np.asarray(g), expected)

        g2 = jax.grad(
            lambda e: jnp.sum(fast_gather_rows_perm(e, perm) * w)
        )(extra)
        np.testing.assert_array_equal(np.asarray(g2), expected)


class TestTileSort:
    def test_packed_equals_two_column(self):
        from scorp_tpu.ops.raster.common import _tile_sort

        rng = np.random.default_rng(3)
        tile = jnp.asarray(rng.integers(0, 40, size=500, dtype=np.int32))
        g = jnp.asarray(np.sort(rng.integers(0, 200, size=500)).astype(np.int32))
        # packed path (small n) vs forced two-column fallback (huge n)
        t1, g1 = jax.jit(lambda t, g: _tile_sort(t, g, 40, 256))(tile, g)
        t2, g2 = jax.jit(lambda t, g: _tile_sort(t, g, 40, 1 << 28))(tile, g)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(g1, g2)
        # sorted by tile, depth-rank ascending within tile
        t1 = np.asarray(t1); g1 = np.asarray(g1)
        assert (np.diff(t1) >= 0).all()
        for t in np.unique(t1):
            assert (np.diff(g1[t1 == t]) >= 0).all()
