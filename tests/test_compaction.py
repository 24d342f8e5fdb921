"""Stream-compaction ladder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render import integrator
from pathtrace_tpu.render.compaction import (
    _rung,
    render_frame_compacted,
    trace_compacted,
)
from pathtrace_tpu.render.frame import render_frame
from pathtrace_tpu.utils.compare import assert_statistical_parity


class TestRung:
    def test_power_of_two(self):
        assert _rung(1000, 16) == 1024
        assert _rung(1024, 16) == 1024
        assert _rung(1025, 16) == 2048
        assert _rung(3, 16) == 16


def camera_rays(scene_cam, n, seed=0):
    from pathtrace_tpu.camera import get_rays

    _, cam = scene_cam
    key = jax.random.PRNGKey(seed)
    s = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    u = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    return get_rays(cam, s, t, u)


class TestTraceCompacted:
    def test_no_compaction_matches_trace_exactly(self):
        sc = presets.small(aspect=1.0)
        scene, cam = sc
        feats = SceneFeatures.from_scene(scene)
        n = 256
        ro, rd, tm = camera_rays(sc, n)
        key = jax.random.PRNGKey(5)
        r_ref, c_ref = integrator.trace(scene, ro, rd, tm, key, 8, features=feats)
        # min_size >= n disables compaction: identical RNG slots -> exact
        r_cmp, c_cmp = trace_compacted(
            scene, ro, rd, tm, key, 8, features=feats, min_size=n
        )
        np.testing.assert_allclose(np.asarray(r_ref), np.asarray(r_cmp), atol=1e-6)
        assert int(c_ref) == c_cmp

    def test_compacted_statistically_matches(self):
        scene, cam = presets.small(aspect=4 / 3)
        feats = SceneFeatures.from_scene(scene)
        W, H, S = 48, 36, 16
        key = jax.random.PRNGKey(7)
        img_ref, rays_ref = render_frame(scene, cam, W, H, S, 8, key, features=feats)
        img_cmp, rays_cmp = render_frame_compacted(
            scene, cam, W, H, S, 8, key, features=feats, min_size=1 << 10
        )
        assert_statistical_parity(
            np.asarray(img_ref), np.asarray(img_cmp), mae_tol=0.03, bias_tol=0.005
        )
        # compaction changes RNG slotting; segment counts agree loosely
        assert abs(rays_cmp - int(rays_ref)) < 0.05 * int(rays_ref)

    def test_bvh_intersect_fn_rides_the_ladder(self):
        # -B in auto mode routes through the compaction ladder: the
        # whole-scene-BVH intersect_fn must survive compaction re-slotting
        from pathtrace_tpu.models import bvh as pbvh

        scene, cam = presets.simple_light(aspect=1.0)  # spheres + rect
        sc = (scene, cam)
        feats = SceneFeatures.from_scene(scene)
        flat, _, offsets = pbvh.build_scene_bvh(scene, seed=0)
        ifn = pbvh.make_bvh_intersect_fn(flat, offsets, feats)
        n = 512
        ro, rd, tm = camera_rays(sc, n)
        key = jax.random.PRNGKey(11)
        r_ref, c_ref = integrator.trace(
            scene, ro, rd, tm, key, 8, features=feats, intersect_fn=ifn
        )
        # exact twin with compaction disabled (same RNG slots)
        r_off, c_off = trace_compacted(
            scene, ro, rd, tm, key, 8, features=feats, intersect_fn=ifn,
            min_size=n,
        )
        np.testing.assert_allclose(np.asarray(r_ref), np.asarray(r_off),
                                   atol=1e-6)
        assert int(c_ref) == c_off
        # statistical twin with the ladder active
        r_on, _ = trace_compacted(
            scene, ro, rd, tm, key, 8, features=feats, intersect_fn=ifn,
            min_size=64,
        )
        assert abs(float(r_on.mean()) - float(r_ref.mean())) < 0.05

    def test_ray_count_exactness_single_bounce(self):
        # black-sky scene of one light: every ray traces exactly once or twice
        from pathtrace_tpu.models.build import SceneBuilder

        b = SceneBuilder()
        b.sphere((0, 0, -3), 1.0, b.diffuse_light_color((1, 1, 1)))
        b.sky = (0, 0, 0)
        scene = b.finish()
        feats = SceneFeatures.from_scene(scene)
        n = 128
        ro = jnp.zeros((n, 3))
        rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
        tm = jnp.zeros(n)
        _, count = trace_compacted(
            scene, ro, rd, tm, jax.random.PRNGKey(0), 8, features=feats, min_size=8
        )
        assert count == n  # all hit the light, light never scatters
