"""Unit tests for sampling/shading math vs closed forms.

Covers the reference's math helpers (reference src/math.rs) per the test
strategy in SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.ops import math as pmath


def uniforms(key, shape):
    return jax.random.uniform(jax.random.PRNGKey(key), shape)


class TestReflect:
    def test_mirror(self):
        v = jnp.array([[1.0, -1.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        out = pmath.reflect(v, n)
        np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)

    def test_preserves_length(self):
        v = pmath.normalize(uniforms(0, (100, 3)) - 0.5)
        n = pmath.normalize(uniforms(1, (100, 3)) - 0.5)
        out = pmath.reflect(v, n)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5
        )


class TestRefract:
    def test_straight_through(self):
        # normal incidence passes straight through
        v = jnp.array([[0.0, -1.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        refr, ok = pmath.refract(v, n, jnp.array([1.0 / 1.5]))
        assert bool(ok[0])
        np.testing.assert_allclose(refr, [[0.0, -1.0, 0.0]], atol=1e-6)

    def test_snell(self):
        # 45 degrees in, check sin(theta_t) = sin(theta_i)/1.5
        s = np.sqrt(0.5)
        v = jnp.array([[s, -s, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        refr, ok = pmath.refract(v, n, jnp.array([1.0 / 1.5]))
        assert bool(ok[0])
        refr = np.asarray(pmath.normalize(refr))[0]
        assert refr[0] == pytest.approx(s / 1.5, abs=1e-6)

    def test_total_internal_reflection(self):
        # glass->air beyond critical angle (sin > 1/1.5 -> angle > 41.8 deg)
        ang = np.deg2rad(60.0)
        v = jnp.array([[np.sin(ang), -np.cos(ang), 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        _, ok = pmath.refract(v, n, jnp.array([1.5]))
        assert not bool(ok[0])


class TestSchlick:
    def test_normal_incidence(self):
        # r0 = ((1-1.5)/(1+1.5))^2 = 0.04
        assert float(pmath.schlick(jnp.float32(1.0), jnp.float32(1.5))) == pytest.approx(
            0.04, abs=1e-6
        )

    def test_grazing(self):
        assert float(pmath.schlick(jnp.float32(0.0), jnp.float32(1.5))) == pytest.approx(
            1.0, abs=1e-6
        )


class TestSampling:
    def test_unit_vector_norm_and_mean(self):
        u = uniforms(2, (20000, 2))
        v = np.asarray(pmath.random_unit_vector(u[:, 0], u[:, 1]))
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
        # uniform on sphere: mean ~ 0, E[z^2] = 1/3
        assert np.abs(v.mean(axis=0)).max() < 0.02
        assert v[:, 2].__pow__(2).mean() == pytest.approx(1.0 / 3.0, abs=0.01)

    def test_unit_sphere_radius_distribution(self):
        u = uniforms(3, (20000, 3))
        v = np.asarray(pmath.random_in_unit_sphere(u[:, 0], u[:, 1], u[:, 2]))
        r = np.linalg.norm(v, axis=-1)
        assert r.max() <= 1.0 + 1e-6
        # E[r] for uniform ball = 3/4
        assert r.mean() == pytest.approx(0.75, abs=0.01)

    def test_unit_disk(self):
        u = uniforms(4, (20000, 2))
        v = np.asarray(pmath.random_in_unit_disk(u[:, 0], u[:, 1]))
        assert np.all(v[:, 2] == 0.0)
        r = np.linalg.norm(v[:, :2], axis=-1)
        assert r.max() <= 1.0 + 1e-6
        # E[r] for uniform disk = 2/3
        assert r.mean() == pytest.approx(2.0 / 3.0, abs=0.01)


class TestSrgb:
    def test_matches_reference_curve(self):
        x = jnp.array([0.0, 0.1, 0.5, 1.0, 2.0, -1.0])
        out = np.asarray(pmath.linear_to_srgb_f32(x))
        expect = np.clip(1.055 * np.maximum(np.asarray(x), 0.0) ** 0.41666666 - 0.055, 0, 1)
        np.testing.assert_allclose(out, expect, atol=1e-6)

    def test_u8_quantization(self):
        out = np.asarray(pmath.linear_to_srgb_u8(jnp.array([0.0, 1.0])))
        assert out[0] == 0
        assert out[1] == 255
