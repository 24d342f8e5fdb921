"""Material scatter tests (reference material.rs behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models.build import SceneBuilder
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops import bsdf
from pathtrace_tpu.ops.intersect import HitRecord


def make_scene(add):
    b = SceneBuilder()
    add(b)
    return b.finish()


def make_rec(n, mat_id, point=(0.0, 0.0, 0.0), normal=(0.0, 1.0, 0.0)):
    return HitRecord(
        t=jnp.ones(n),
        point=jnp.tile(jnp.asarray([point], jnp.float32), (n, 1)),
        normal=jnp.tile(jnp.asarray([normal], jnp.float32), (n, 1)),
        u=jnp.zeros(n),
        v=jnp.zeros(n),
        mat_id=jnp.full((n,), mat_id, jnp.int32),
        hit=jnp.ones(n, bool),
    )


def uniforms(n, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 4))


class TestLambertian:
    def test_cosine_ish_upper_hemisphere(self):
        s = make_scene(lambda b: b.sphere((0, 0, 0), 1.0, b.lambertian_color((0.5, 0.6, 0.7))))
        f = SceneFeatures.from_scene(s)
        n = 20000
        rec = make_rec(n, 0)
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
        out = bsdf.scatter(s, rec, d, uniforms(n), features=f)
        dirs = np.asarray(out.direction)
        assert np.all(np.asarray(out.ok))
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
        # normal + unit vector is always in the upper hemisphere
        assert dirs[:, 1].min() > -1e-5
        # mean direction of n + unit sample points along the normal
        mean = dirs.mean(axis=0)
        assert mean[1] > 0.5
        np.testing.assert_allclose(np.asarray(out.attenuation)[0], [0.5, 0.6, 0.7], atol=1e-6)

    def test_emitted_zero(self):
        s = make_scene(lambda b: b.sphere((0, 0, 0), 1.0, b.lambertian_color((0.5, 0.6, 0.7))))
        f = SceneFeatures.from_scene(s)
        rec = make_rec(4, 0)
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (4, 1))
        out = bsdf.scatter(s, rec, d, uniforms(4), features=f)
        np.testing.assert_allclose(np.asarray(out.emitted), 0.0)


class TestMetal:
    def test_perfect_mirror(self):
        s = make_scene(lambda b: b.sphere((0, 0, 0), 1.0, b.metal((0.8, 0.6, 0.2), 0.0)))
        f = SceneFeatures.from_scene(s)
        n = 8
        rec = make_rec(n, 0)
        inv_sqrt2 = 1.0 / np.sqrt(2.0)
        d = jnp.tile(jnp.asarray([[inv_sqrt2, -inv_sqrt2, 0.0]], jnp.float32), (n, 1))
        out = bsdf.scatter(s, rec, d, uniforms(n), features=f)
        assert np.all(np.asarray(out.ok))
        np.testing.assert_allclose(
            np.asarray(out.direction), [[inv_sqrt2, inv_sqrt2, 0.0]] * n, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(out.attenuation)[0], [0.8, 0.6, 0.2], atol=1e-6)

    def test_below_horizon_absorbed(self):
        s = make_scene(lambda b: b.sphere((0, 0, 0), 1.0, b.metal((1, 1, 1), 0.0)))
        f = SceneFeatures.from_scene(s)
        # grazing from behind the normal: reflected dot n < 0
        rec = make_rec(4, 0, normal=(0.0, 1.0, 0.0))
        d = jnp.tile(jnp.asarray([[0.0, 0.5, -1.0]], jnp.float32), (4, 1))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        out = bsdf.scatter(s, rec, d, uniforms(4), features=f)
        assert not np.any(np.asarray(out.ok))


class TestDielectric:
    def test_attenuation_is_white(self):
        s = make_scene(lambda b: b.sphere((0, 0, 0), 1.0, b.dielectric(1.5)))
        f = SceneFeatures.from_scene(s)
        n = 100
        rec = make_rec(n, 0)
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
        out = bsdf.scatter(s, rec, d, uniforms(n), features=f)
        np.testing.assert_allclose(np.asarray(out.attenuation), 1.0, atol=1e-6)
        assert np.all(np.asarray(out.ok))

    def test_normal_incidence_mostly_refracts(self):
        # at normal incidence schlick = 0.04, so ~96% refract straight through
        s = make_scene(lambda b: b.sphere((0, 0, 0), 1.0, b.dielectric(1.5)))
        f = SceneFeatures.from_scene(s)
        n = 10000
        rec = make_rec(n, 0)
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
        out = bsdf.scatter(s, rec, d, uniforms(n), features=f)
        dirs = np.asarray(out.direction)
        frac_down = (dirs[:, 1] < 0).mean()
        assert frac_down == pytest.approx(0.96, abs=0.01)

    def test_tir_always_reflects(self):
        # inside glass beyond the critical angle: all rays reflect
        s = make_scene(lambda b: b.sphere((0, 0, 0), 1.0, b.dielectric(1.5)))
        f = SceneFeatures.from_scene(s)
        n = 1000
        rec = make_rec(n, 0, normal=(0.0, 1.0, 0.0))
        ang = np.deg2rad(60.0)
        # exiting: direction dot normal > 0
        d = jnp.tile(
            jnp.asarray([[np.sin(ang), np.cos(ang), 0.0]], jnp.float32), (n, 1)
        )
        out = bsdf.scatter(s, rec, d, uniforms(n), features=f)
        dirs = np.asarray(out.direction)
        # reflected about n: y component flips sign
        assert np.all(dirs[:, 1] < 0)


class TestLight:
    def test_emits_and_does_not_scatter(self):
        s = make_scene(
            lambda b: b.sphere((0, 0, 0), 1.0, b.diffuse_light_color((4.0, 4.0, 4.0)))
        )
        f = SceneFeatures.from_scene(s)
        rec = make_rec(4, 0)
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (4, 1))
        out = bsdf.scatter(s, rec, d, uniforms(4), features=f)
        assert not np.any(np.asarray(out.ok))
        np.testing.assert_allclose(np.asarray(out.emitted), 4.0, atol=1e-6)


class TestIsotropic:
    def test_uniform_directions(self):
        s = make_scene(
            lambda b: b.medium_box((-1, -1, -1), (1, 1, 1), 0.5, b.constant_texture((1, 1, 1)))
        )
        f = SceneFeatures.from_scene(s)
        n = 20000
        # isotropic material id is 0 (the only material)
        rec = make_rec(n, 0)
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
        out = bsdf.scatter(s, rec, d, uniforms(n), features=f)
        dirs = np.asarray(out.direction)
        assert np.abs(dirs.mean(axis=0)).max() < 0.02
        assert np.all(np.asarray(out.ok))
