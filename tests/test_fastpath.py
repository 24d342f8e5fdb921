"""Fast path tests: parity with the general integrator, compaction
invariance, frame rendering, megakernel statistical parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.camera import get_rays
from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops.fastpath import (
    fastpath_supported,
    render_frame_fast,
    trace_fast,
)
from pathtrace_tpu.render import integrator
from pathtrace_tpu.utils.compare import assert_statistical_parity


def camera_rays(cam, n, seed=0):
    key = jax.random.PRNGKey(seed)
    s = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    u = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    return get_rays(cam, s, t, u)


class TestSupport:
    def test_all_presets_supported(self):
        for name in presets.names():
            scene, _ = presets.from_name(name, 1.0)
            assert fastpath_supported(SceneFeatures.from_scene(scene)), name


class TestParity:
    @pytest.mark.parametrize(
        "preset",
        ["small", "simple_light", "smallpt", "cornell", "cornell_smoke",
         "earth", "aras"],
    )
    def test_statistical_match_with_integrator(self, preset):
        scene, cam = presets.from_name(preset, 4 / 3)
        feats = SceneFeatures.from_scene(scene)
        n = 8192
        ro, rd, tm = camera_rays(cam, n)
        key = jax.random.PRNGKey(0)
        r1, c1 = integrator.trace(scene, ro, rd, tm, key, 8, features=feats)
        r2, c2 = trace_fast(scene, ro, rd, tm, 0, 8, feats, min_size=512)
        m1 = np.asarray(r1).mean(axis=0)
        m2 = np.asarray(r2).mean(axis=0)
        np.testing.assert_allclose(m1, m2, atol=0.02)
        assert abs(c2 - int(c1)) < 0.03 * int(c1) + 10

    def test_image_textured_rect_and_box_uv(self):
        """Image textures on rects/boxes use the face UV parameterization
        (not sphere UV): fast path must match the general integrator, which
        computes the reference's per-kind u/v (rect.rs:93-160)."""
        from pathtrace_tpu.models.build import SceneBuilder

        b = SceneBuilder()
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :4] = (1.0, 0.1, 0.1)   # left half red
        img[:, 4:] = (0.1, 0.1, 1.0)   # right half blue
        tex = b.image_texture(img)
        mat = b.lambertian(tex)
        b.rect_xy(-4.0, 0.0, -2.0, 2.0, -3.0, False, mat)
        b.box((0.5, -2.0, -2.5), (3.5, 2.0, -0.5), mat)
        scene = b.finish()
        from pathtrace_tpu.camera import make_camera

        cam = make_camera((0.0, 0.0, 6.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                          60.0, 1.0, aperture=0.0, focus_dist=6.0,
                          time0=0.0, time1=0.0)
        feats = SceneFeatures.from_scene(scene)
        assert feats.has_image and feats.has_rects and feats.has_boxes
        ro, rd, tm = camera_rays(cam, 4096)
        key = jax.random.PRNGKey(0)
        r1, _ = integrator.trace(scene, ro, rd, tm, key, 4, features=feats)
        r2, _ = trace_fast(scene, ro, rd, tm, 0, 4, feats, min_size=512)
        m1 = np.asarray(r1).mean(axis=0)
        m2 = np.asarray(r2).mean(axis=0)
        # both halves visible => red and blue both contribute; sphere-UV
        # fallback would sample wildly different texels
        np.testing.assert_allclose(m1, m2, atol=0.02)

    def test_compaction_bit_exact_invariance(self):
        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 2048)
        a, ca = trace_fast(scene, ro, rd, tm, 5, 8, feats, min_size=128)
        b, cb = trace_fast(scene, ro, rd, tm, 5, 8, feats, compaction=False)
        # stable lane ids => compaction cannot change any sample
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        assert ca == cb

    def test_device_trace_matches_host_ladder(self):
        """trace_fast_device (pure-device scan, shard_map body) must equal
        the host-ladder trace bit-for-bit: same kernels, same RNG keys."""
        from pathtrace_tpu.ops.fastpath import trace_fast_device

        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 2048)
        a, ca = trace_fast(scene, ro, rd, tm, 5, 8, feats, compaction=False)
        b, cb = trace_fast_device(scene, ro, rd, tm, 5, 8, feats)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ca == int(cb)

    def test_row_compaction_bit_exact_invariance(self, monkeypatch):
        """Force the row-compaction tier (normally > 512k lanes) at test
        scale: results must be bit-identical to the uncompacted trace."""
        from pathtrace_tpu.ops import fastpath as fp

        monkeypatch.setattr(fp, "LANE_COMPACT_MAX", 256)
        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 4096)
        a, ca = trace_fast(scene, ro, rd, tm, 5, 8, feats, min_size=128)
        monkeypatch.setattr(fp, "LANE_COMPACT_MAX", 1 << 19)
        b, cb = trace_fast(scene, ro, rd, tm, 5, 8, feats, compaction=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        assert ca == cb

    def test_lane_fallback_above_row_tier_bit_exact(self, monkeypatch):
        """When deaths scatter, every 128-lane row keeps a live lane and
        the row tier can't shrink; the ladder must fall back to a lane
        compaction (>=~3x shrink) instead of staying at full width —
        and stay bit-identical. camera_rays directions are random, so
        deaths scatter naturally."""
        from pathtrace_tpu.ops import fastpath as fp
        from pathtrace_tpu.render import compact_util as cu

        lane_compacts = []
        orig_compact = cu.compact

        def spy(out_rad, state, indices, next_size, **kw):
            lane_compacts.append((state.alive.shape[0], next_size))
            return orig_compact(out_rad, state, indices, next_size, **kw)

        monkeypatch.setattr(fp, "LANE_COMPACT_MAX", 512)
        monkeypatch.setattr(fp, "INTERLEAVE_CHUNK", 1 << 20)  # single chunk
        monkeypatch.setattr(fp, "_compact", spy)
        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 8192)
        a, ca = trace_fast(scene, ro, rd, tm, 5, 8, feats, min_size=128)
        assert any(size > 512 for size, _ in lane_compacts), (
            "lane fallback above LANE_COMPACT_MAX never fired", lane_compacts
        )
        monkeypatch.setattr(fp, "_compact", orig_compact)
        monkeypatch.setattr(fp, "LANE_COMPACT_MAX", 1 << 19)
        b, cb = trace_fast(scene, ro, rd, tm, 5, 8, feats, compaction=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(ca) == int(cb)

    def test_interleaved_ladder_bit_exact(self, monkeypatch):
        """Force the interleaved multi-chunk ladder (normally > 1M lanes)
        at test scale: results must be bit-identical to the single-chunk
        uncompacted trace (lane-keyed RNG + at most one radiance emission
        per lane make every schedule equivalent)."""
        from pathtrace_tpu.ops import fastpath as fp

        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 8192)
        monkeypatch.setattr(fp, "INTERLEAVE_CHUNK", 2048)
        # scale COUNT_SKIP down too, or the test-sized chunks would skip
        # every count read and the ladder would never compact
        monkeypatch.setattr(fp, "COUNT_SKIP_SIZE", 256)
        a, ca = trace_fast(scene, ro, rd, tm, 5, 8, feats, min_size=128)
        monkeypatch.setattr(fp, "INTERLEAVE_CHUNK", 1 << 20)
        b, cb = trace_fast(scene, ro, rd, tm, 5, 8, feats, compaction=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(ca) == int(cb)

    def test_interleaved_ladder_ragged_tail(self, monkeypatch):
        """Non-multiple-of-chunk ray counts: the last chunk is smaller and
        padded; the assembled radiance must still match lane for lane."""
        from pathtrace_tpu.ops import fastpath as fp

        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 5000)
        monkeypatch.setattr(fp, "INTERLEAVE_CHUNK", 2048)
        # scale COUNT_SKIP down too, or the test-sized chunks would skip
        # every count read and the ladder would never compact
        monkeypatch.setattr(fp, "COUNT_SKIP_SIZE", 256)
        a, ca = trace_fast(scene, ro, rd, tm, 5, 8, feats, min_size=128)
        monkeypatch.setattr(fp, "INTERLEAVE_CHUNK", 1 << 20)
        b, cb = trace_fast(scene, ro, rd, tm, 5, 8, feats, compaction=False)
        assert a.shape == b.shape == (5000, 3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(ca) == int(cb)

    def test_primary_cull_bit_exact_end_to_end(self, monkeypatch):
        """The depth-0 in-kernel tile cull (active for scenes >= 8 sphere
        tiles) must not change a single bit of the render."""
        from pathtrace_tpu.ops import fastpath as fp

        # random_spheres spans 4 tiles; force the cull on via the patch
        scene, cam = presets.random_spheres(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 4096)
        monkeypatch.setattr(fp, "CULL_MIN_TILES", 1)
        a, ca = trace_fast(scene, ro, rd, tm, 5, 8, feats)
        monkeypatch.setattr(fp, "CULL_MIN_TILES", 10_000)
        b, cb = trace_fast(scene, ro, rd, tm, 5, 8, feats)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ca == cb

    def test_deterministic_per_seed(self):
        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 1024)
        a, _ = trace_fast(scene, ro, rd, tm, 7, 6, feats)
        b, _ = trace_fast(scene, ro, rd, tm, 7, 6, feats)
        c, _ = trace_fast(scene, ro, rd, tm, 8, 6, feats)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))


class TestFrame:
    def test_render_frame_fast_matches_general(self):
        from pathtrace_tpu.render.frame import render_frame

        scene, cam = presets.small(aspect=4 / 3)
        feats = SceneFeatures.from_scene(scene)
        W, H, S = 48, 36, 8
        key = jax.random.PRNGKey(3)
        img_gen, _ = render_frame(scene, cam, W, H, S, 8, key, features=feats)
        # same primary rays (same key), different bounce RNG stream
        img_fast, rays = render_frame_fast(
            scene, cam, W, H, S, 8, jax.random.split(key)[0], 0, feats
        )
        assert np.asarray(img_fast).shape == (H, W, 3)
        assert rays > W * H * S
        assert_statistical_parity(
            np.asarray(img_gen), np.asarray(img_fast), mae_tol=0.04, bias_tol=0.01
        )


class TestFastDiff:
    def test_scan_matches_host_loop(self):
        """trace_fast (fused Pallas shading) vs trace_fast_diff (XLA scan):
        same estimator; per-lane agreement to FMA-contraction slack with a
        tiny outlier budget for ULP-flipped discrete decisions (see
        test_shade_pallas.py for why bitwise equality is off the table)."""
        from pathtrace_tpu.ops.fastpath import trace_fast_diff

        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 2048)
        a, ca = trace_fast(scene, ro, rd, tm, 3, 6, feats, compaction=False)
        b, cb = trace_fast_diff(scene, ro, rd, tm, 3, 6, feats)
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        close = np.abs(a - b) <= 1e-3 + 1e-3 * np.abs(b)
        assert close.mean() > 0.995
        assert abs(ca - int(cb)) <= 0.01 * int(cb)

    def test_albedo_gradient_matches_fd_exactly(self):
        import dataclasses

        from pathtrace_tpu.ops.fastpath import trace_fast_diff

        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 2048)

        def loss(c0):
            color = jnp.asarray(scene.textures.color).at[0].set(c0)
            tx = dataclasses.replace(scene.textures, color=color)
            s2 = dataclasses.replace(scene, textures=tx)
            rad, _ = trace_fast_diff(s2, ro, rd, tm, 3, 4, feats)
            return jnp.mean(rad)

        c0 = jnp.float32(0.3)
        g_auto = float(jax.grad(loss)(c0))
        g_fd = float((loss(c0 + 1e-2) - loss(c0 - 1e-2)) / 2e-2)
        assert g_auto == pytest.approx(g_fd, rel=1e-3)
        assert g_auto > 0

    def test_geometry_gradient_finite(self):
        import dataclasses

        from pathtrace_tpu.ops.fastpath import trace_fast_diff

        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ro, rd, tm = camera_rays(cam, 1024)

        def loss(centers):
            sp = dataclasses.replace(scene.spheres, center=centers)
            s2 = dataclasses.replace(scene, spheres=sp)
            rad, _ = trace_fast_diff(s2, ro, rd, tm, 3, 4, feats)
            return jnp.mean(rad)

        g = jax.grad(loss)(jnp.asarray(scene.spheres.center))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestMegakernel:
    def test_megakernel_statistical_parity(self):
        from pathtrace_tpu.ops.megakernel import (
            megakernel_supported,
            trace_megakernel,
        )

        scene, cam = presets.small(aspect=4 / 3)
        feats = SceneFeatures.from_scene(scene)
        assert megakernel_supported(feats)
        n = 4096
        ro, rd, tm = camera_rays(cam, n)
        key = jax.random.PRNGKey(0)
        r1, c1 = integrator.trace(scene, ro, rd, tm, key, 8, features=feats)
        r2, c2 = trace_megakernel(scene, ro, rd, tm, 0, 8, feats)
        np.testing.assert_allclose(
            np.asarray(r1).mean(axis=0), np.asarray(r2).mean(axis=0), atol=0.02
        )
        assert abs(int(c2) - int(c1)) < 0.03 * int(c1) + 10
