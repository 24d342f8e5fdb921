"""Integrator tests: estimator semantics, early exit, determinism,
trace vs trace_diff equivalence (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models.build import SceneBuilder
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render import integrator


def build(add, sky=None):
    b = SceneBuilder()
    add(b)
    if sky is not None:
        b.sky = sky
    return b.finish()


def rays_down_z(n, origin=(0, 0, 0)):
    ro = jnp.tile(jnp.asarray([origin], jnp.float32), (n, 1))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    return ro, rd, jnp.zeros(n, jnp.float32)


class TestSky:
    def test_gradient_sky_formula(self):
        # empty scene: radiance == sky of the primary ray
        s = build(lambda b: None)
        f = SceneFeatures.from_scene(s)
        rd = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        ro = jnp.zeros((3, 3), jnp.float32)
        time = jnp.zeros(3, jnp.float32)
        rad, count = integrator.trace(s, ro, rd, time, jax.random.PRNGKey(0), 10, features=f)
        rad = np.asarray(rad)
        # t=1: (0,0,0)+1*0.3*(0.5,0.7,1.0)
        np.testing.assert_allclose(rad[0], [0.15, 0.21, 0.3], atol=1e-6)
        # t=0: white
        np.testing.assert_allclose(rad[1], [1.0, 1.0, 1.0], atol=1e-6)
        # t=0.5
        np.testing.assert_allclose(rad[2], [0.575, 0.605, 0.65], atol=1e-6)
        assert int(count) == 3

    def test_constant_sky(self):
        s = build(lambda b: None, sky=(0.0, 0.0, 0.0))
        f = SceneFeatures.from_scene(s)
        ro, rd, t = rays_down_z(5)
        rad, _ = integrator.trace(s, ro, rd, t, jax.random.PRNGKey(0), 10, features=f)
        np.testing.assert_allclose(np.asarray(rad), 0.0)


class TestEmission:
    def test_direct_light_hit(self):
        s = build(
            lambda b: b.sphere((0, 0, -3), 1.0, b.diffuse_light_color((5.0, 4.0, 3.0))),
            sky=(0, 0, 0),
        )
        f = SceneFeatures.from_scene(s)
        ro, rd, t = rays_down_z(2)
        rad, count = integrator.trace(s, ro, rd, t, jax.random.PRNGKey(0), 10, features=f)
        np.testing.assert_allclose(np.asarray(rad), [[5.0, 4.0, 3.0]] * 2, atol=1e-6)
        # light never scatters: exactly one segment per ray
        assert int(count) == 2

    def test_attenuated_bounce_to_light(self):
        # metal mirror floor under a light: ray reflects up into the light,
        # radiance = albedo * emission
        def add(b):
            b.rect_xz(-10, 10, -10, 10, 0.0, False, b.metal((0.5, 0.5, 0.5), 0.0))
            b.rect_xz(-10, 10, -10, 10, 5.0, True, b.diffuse_light_color((2.0, 2.0, 2.0)))

        s = build(add, sky=(0, 0, 0))
        f = SceneFeatures.from_scene(s)
        n = 4
        ro = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        rd = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
        t = jnp.zeros(n, jnp.float32)
        rad, count = integrator.trace(s, ro, rd, t, jax.random.PRNGKey(0), 10, features=f)
        np.testing.assert_allclose(np.asarray(rad), 1.0, atol=1e-5)
        assert int(count) == 2 * n  # floor segment + light segment per ray

    def test_max_depth_zero_emits_only(self):
        def add(b):
            b.rect_xz(-10, 10, -10, 10, 0.0, False, b.metal((0.5, 0.5, 0.5), 0.0))
            b.rect_xz(-10, 10, -10, 10, 5.0, True, b.diffuse_light_color((2.0, 2.0, 2.0)))

        s = build(add, sky=(0, 0, 0))
        f = SceneFeatures.from_scene(s)
        ro = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        rd = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        t = jnp.zeros(1, jnp.float32)
        # depth 0: hit floor, no scatter allowed -> emitted only (0)
        rad, count = integrator.trace(s, ro, rd, t, jax.random.PRNGKey(0), 0, features=f)
        np.testing.assert_allclose(np.asarray(rad), 0.0, atol=1e-6)
        assert int(count) == 1


class TestEquivalence:
    def test_trace_equals_trace_diff(self):
        from pathtrace_tpu.models import presets

        s, cam = presets.small(aspect=1.0)
        f = SceneFeatures.from_scene(s)
        key = jax.random.PRNGKey(7)
        n = 64
        ro = jnp.tile(jnp.asarray([[3.0, 3.0, 2.0]], jnp.float32), (n, 1))
        d = jax.random.normal(key, (n, 3)) * jnp.asarray([0.2, 0.2, 1.0]) + jnp.asarray(
            [-0.55, -0.55, -0.55]
        )
        rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t = jnp.zeros(n, jnp.float32)
        r1, c1 = integrator.trace(s, ro, rd, t, key, 8, features=f)
        r2, c2 = integrator.trace_diff(s, ro, rd, t, key, 8, features=f)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
        assert int(c1) == int(c2)

    def test_determinism(self):
        from pathtrace_tpu.models import presets

        s, cam = presets.small(aspect=1.0)
        f = SceneFeatures.from_scene(s)
        ro, rd, t = rays_down_z(32, origin=(3, 3, 2))
        key = jax.random.PRNGKey(3)
        r1, _ = integrator.trace(s, ro, rd, t, key, 8, features=f)
        r2, _ = integrator.trace(s, ro, rd, t, key, 8, features=f)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


class TestEnergyConservation:
    def test_radiance_bounded_by_sky_for_passive_scene(self):
        # no lights: radiance <= max sky value (albedo <= 1 everywhere)
        from pathtrace_tpu.models import presets

        s, cam = presets.small(aspect=1.0)
        f = SceneFeatures.from_scene(s)
        key = jax.random.PRNGKey(11)
        n = 256
        d = jax.random.normal(key, (n, 3))
        rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        ro = jnp.tile(jnp.asarray([[3.0, 3.0, 2.0]], jnp.float32), (n, 1))
        t = jnp.zeros(n, jnp.float32)
        rad, _ = integrator.trace(s, ro, rd, t, key, 10, features=f)
        assert float(jnp.max(rad)) <= 1.0 + 1e-4
        assert float(jnp.min(rad)) >= 0.0
