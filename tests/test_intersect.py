"""Intersection kernels vs closed forms (SURVEY.md §4: kernel unit tests
against the math at reference sphere.rs:29-66, rect.rs:73-160, aabb.rs:46-58).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.config import MAX_T
from pathtrace_tpu.models.build import (
    SceneBuilder,
    affine_from_rotation_y_translation,
)
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops import intersect as isect


def ray(o, d):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d, jnp.zeros(1, jnp.float32)


def build(fn):
    b = SceneBuilder()
    fn(b)
    return b.finish()


class TestSphere:
    def scene(self):
        def f(b):
            m = b.lambertian_color((0.5, 0.5, 0.5))
            b.sphere((0.0, 0.0, -2.0), 0.5, m)
            b.sphere((0.0, 0.0, -5.0), 1.0, m)

        return build(f)

    def test_front_hit(self):
        s = self.scene()
        ro, rd, t = ray((0, 0, 0), (0, 0, -1))
        tt, idx = isect.sphere_nearest(s.spheres, ro, rd, t)
        assert float(tt[0]) == pytest.approx(1.5, abs=1e-5)
        assert int(idx[0]) == 0

    def test_second_sphere_when_first_missed(self):
        s = self.scene()
        ro, rd, t = ray((0, 0.75, 0), (0, 0, -1))
        tt, idx = isect.sphere_nearest(s.spheres, ro, rd, t)
        # misses r=0.5 sphere, hits r=1 sphere at z=-5: t = 5 - sqrt(1-0.5625)
        expect = 5.0 - np.sqrt(1.0 - 0.75 ** 2)
        assert int(idx[0]) == 1
        assert float(tt[0]) == pytest.approx(expect, abs=1e-4)

    def test_inside_hits_far_root(self):
        s = self.scene()
        ro, rd, t = ray((0, 0, -2.0), (0, 0, -1))
        tt, idx = isect.sphere_nearest(s.spheres, ro, rd, t)
        assert float(tt[0]) == pytest.approx(0.5, abs=1e-5)

    def test_miss(self):
        s = self.scene()
        ro, rd, t = ray((0, 3, 0), (0, 0, -1))
        tt, _ = isect.sphere_nearest(s.spheres, ro, rd, t)
        assert float(tt[0]) >= MAX_T * 0.99

    def test_record_normal(self):
        s = self.scene()
        ro, rd, t = ray((0, 0, 0), (0, 0, -1))
        tt, idx = isect.sphere_nearest(s.spheres, ro, rd, t)
        rec = isect.sphere_record(s.spheres, tt, idx, ro, rd, t)
        np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(rec.point)[0], [0, 0, -1.5], atol=1e-5)

    def test_negative_radius_flips_normal(self):
        def f(b):
            b.sphere((0.0, 0.0, -2.0), -0.5, b.dielectric(1.5))

        s = build(f)
        ro, rd, t = ray((0, 0, 0), (0, 0, -1))
        tt, idx = isect.sphere_nearest(s.spheres, ro, rd, t)
        assert float(tt[0]) == pytest.approx(1.5, abs=1e-5)
        rec = isect.sphere_record(s.spheres, tt, idx, ro, rd, t)
        # inward normal for the hollow shell
        np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, 0, -1], atol=1e-5)

    def test_moving_sphere_center_lerp(self):
        def f(b):
            b.moving_sphere((0, 0, -2), (2, 0, -2), 0.0, 1.0, 0.5,
                            b.lambertian_color((0.5, 0.5, 0.5)))

        s = build(f)
        ro = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]], jnp.float32)
        rd = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
        time = jnp.asarray([0.0, 1.0], jnp.float32)
        tt, _ = isect.sphere_nearest(s.spheres, ro, rd, time)
        # at t=0 center x=0 (ray 0 hits); at t=1 center x=2 (ray 1 hits)
        assert float(tt[0]) == pytest.approx(1.5, abs=1e-5)
        assert float(tt[1]) == pytest.approx(1.5, abs=1e-5)


class TestRect:
    def scene(self):
        def f(b):
            m = b.lambertian_color((0.5, 0.5, 0.5))
            b.rect_xy(-1.0, 1.0, -1.0, 1.0, -3.0, False, m)   # z = -3 plane
            b.rect_xz(-1.0, 1.0, -1.0, 1.0, -2.0, True, m)    # y = -2 plane, flipped

        return build(f)

    def test_xy_hit_uv(self):
        s = self.scene()
        ro, rd, _ = ray((0.5, -0.5, 0), (0, 0, -1))
        tt, idx = isect.rect_nearest(s.rects, ro, rd)
        assert float(tt[0]) == pytest.approx(3.0, abs=1e-5)
        assert int(idx[0]) == 0
        rec = isect.rect_record(s.rects, tt, idx, ro, rd)
        np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, 0, 1], atol=1e-6)
        assert float(rec.u[0]) == pytest.approx(0.75, abs=1e-5)  # (0.5+1)/2
        assert float(rec.v[0]) == pytest.approx(0.25, abs=1e-5)  # (-0.5+1)/2

    def test_outside_bounds_misses(self):
        s = self.scene()
        ro, rd, _ = ray((1.5, 0, 0), (0, 0, -1))
        tt, _ = isect.rect_nearest(s.rects, ro, rd)
        assert float(tt[0]) >= MAX_T * 0.99

    def test_flipped_normal(self):
        s = self.scene()
        ro, rd, _ = ray((0, 0, 0), (0, -1, 0))
        tt, idx = isect.rect_nearest(s.rects, ro, rd)
        assert int(idx[0]) == 1
        rec = isect.rect_record(s.rects, tt, idx, ro, rd)
        np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, -1, 0], atol=1e-6)


class TestBox:
    def test_axis_aligned_entry(self):
        def f(b):
            b.box((-1, -1, -4), (1, 1, -2), b.lambertian_color((0.5, 0.5, 0.5)))

        s = build(f)
        ro, rd, _ = ray((0, 0, 0), (0, 0, -1))
        tt, idx = isect.box_nearest(s.boxes, ro, rd)
        assert float(tt[0]) == pytest.approx(2.0, abs=1e-5)
        rec = isect.box_record(s.boxes, tt, idx, ro, rd)
        np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, 0, 1], atol=1e-5)

    def test_inside_exits(self):
        def f(b):
            b.box((-1, -1, -1), (1, 1, 1), b.lambertian_color((0.5, 0.5, 0.5)))

        s = build(f)
        ro, rd, _ = ray((0, 0, 0), (0, 0, -1))
        tt, idx = isect.box_nearest(s.boxes, ro, rd)
        assert float(tt[0]) == pytest.approx(1.0, abs=1e-5)
        rec = isect.box_record(s.boxes, tt, idx, ro, rd)
        # exit face outward normal points along the ray
        np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, 0, -1], atol=1e-5)

    def test_rotated_box(self):
        # 45-degree rotated unit box: ray along -z hits the edge-on corner
        # at sqrt(2)/2 from the center plane
        def f(b):
            m = affine_from_rotation_y_translation(45.0, (0.0, 0.0, -3.0))
            b.box((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5),
                  b.lambertian_color((0.5, 0.5, 0.5)), m)

        s = build(f)
        ro, rd, _ = ray((0, 0, 0), (0, 0, -1))
        tt, _ = isect.box_nearest(s.boxes, ro, rd)
        expect = 3.0 - np.sqrt(2.0) / 2.0
        assert float(tt[0]) == pytest.approx(expect, abs=1e-4)

    def test_transform_roundtrip_normal(self):
        def f(b):
            m = affine_from_rotation_y_translation(30.0, (1.0, 2.0, -5.0))
            b.box((-1, -1, -1), (1, 1, 1), b.lambertian_color((0.5, 0.5, 0.5)), m)

        s = build(f)
        ro, rd, _ = ray((1.0, 2.0, 5.0), (0, 0, -1))
        tt, idx = isect.box_nearest(s.boxes, ro, rd)
        rec = isect.box_record(s.boxes, tt, idx, ro, rd)
        n = np.asarray(rec.normal)[0]
        # normal is unit length and faces the ray
        assert np.linalg.norm(n) == pytest.approx(1.0, abs=1e-5)
        assert n @ np.array([0, 0, -1.0]) < 0


class TestMedia:
    def test_always_hits_with_huge_density(self):
        def f(b):
            b.medium_box((-1, -1, -4), (1, 1, -2), 1e6, b.constant_texture((1, 1, 1)))

        s = build(f)
        ro, rd, _ = ray((0, 0, 0), (0, 0, -1))
        u = jnp.full((1, s.media.count), 0.5, jnp.float32)
        tt, _ = isect.media_nearest(s.media, ro, rd, u)
        # free flight ~ 0 => hit essentially at entry t=2
        assert float(tt[0]) == pytest.approx(2.0, abs=1e-3)

    def test_never_hits_with_tiny_density(self):
        def f(b):
            b.medium_box((-1, -1, -4), (1, 1, -2), 1e-9, b.constant_texture((1, 1, 1)))

        s = build(f)
        ro, rd, _ = ray((0, 0, 0), (0, 0, -1))
        u = jnp.full((1, s.media.count), 0.5, jnp.float32)
        tt, _ = isect.media_nearest(s.media, ro, rd, u)
        assert float(tt[0]) >= MAX_T * 0.99

    def test_expected_hit_rate_matches_beer_lambert(self):
        # slab of thickness 2, density d: P(hit) = 1 - exp(-d*2)
        density = 0.7

        def f(b):
            b.medium_box((-5, -5, -4), (5, 5, -2), density, b.constant_texture((1, 1, 1)))

        s = build(f)
        n = 20000
        ro = jnp.zeros((n, 3), jnp.float32)
        rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
        import jax

        u = jax.random.uniform(jax.random.PRNGKey(0), (n, s.media.count))
        tt, _ = isect.media_nearest(s.media, ro, rd, u)
        rate = float(jnp.mean(tt < MAX_T * 0.99))
        expect = 1.0 - np.exp(-density * 2.0)
        assert rate == pytest.approx(expect, abs=0.01)

    def test_medium_sphere_interval(self):
        def f(b):
            b.medium_sphere((0, 0, -3), 1.0, 1e6, b.constant_texture((1, 1, 1)))

        s = build(f)
        ro, rd, _ = ray((0, 0, 0), (0, 0, -1))
        u = jnp.full((1, s.media.count), 0.5, jnp.float32)
        tt, _ = isect.media_nearest(s.media, ro, rd, u)
        assert float(tt[0]) == pytest.approx(2.0, abs=1e-3)


class TestSceneCombine:
    def test_closest_kind_wins(self):
        def f(b):
            m = b.lambertian_color((0.5, 0.5, 0.5))
            b.sphere((0, 0, -5), 0.5, m)
            b.rect_xy(-1, 1, -1, 1, -3.0, False, m)
            b.box((-1, -1, -2.5), (1, 1, -2.0), m)

        s = build(f)
        feats = SceneFeatures.from_scene(s)
        ro, rd, t = ray((0, 0, 0), (0, 0, -1))
        rec = isect.intersect_scene(s, ro, rd, t, None, features=feats)
        assert bool(rec.hit[0])
        assert float(rec.t[0]) == pytest.approx(2.0, abs=1e-5)  # the box face
