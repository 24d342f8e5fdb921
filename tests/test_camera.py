"""Camera tests (reference src/camera.rs:22-68)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.camera import get_rays, make_camera
from pathtrace_tpu.models.build import (
    affine_from_rotation_y_translation,
    identity_affine,
    invert_affine,
)


def std_camera(aperture=0.0, time1=0.0):
    return make_camera(
        (13.0, 2.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 20.0, 16 / 9,
        aperture=aperture, focus_dist=10.0, time0=0.0, time1=time1,
    )


class TestBasis:
    def test_orthonormal(self):
        cam = std_camera()
        for v in (cam.u, cam.v, cam.w):
            assert float(jnp.linalg.norm(v)) == pytest.approx(1.0, abs=1e-6)
        assert float(jnp.dot(cam.u, cam.v)) == pytest.approx(0.0, abs=1e-6)
        assert float(jnp.dot(cam.u, cam.w)) == pytest.approx(0.0, abs=1e-6)
        assert float(jnp.dot(cam.v, cam.w)) == pytest.approx(0.0, abs=1e-6)

    def test_w_points_backward(self):
        cam = std_camera()
        look_dir = -np.asarray(cam.w)
        expect = np.asarray([0.0, 0.0, 0.0]) - np.asarray([13.0, 2.0, 3.0])
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(look_dir, expect, atol=1e-6)


class TestRays:
    def test_center_ray_hits_lookat(self):
        cam = std_camera()
        u = jnp.zeros((1, 3))
        ro, rd, t = get_rays(cam, jnp.asarray([0.5]), jnp.asarray([0.5]), u)
        # center ray passes through the lookat point
        to_target = np.asarray([0.0, 0.0, 0.0]) - np.asarray(ro)[0]
        to_target /= np.linalg.norm(to_target)
        np.testing.assert_allclose(np.asarray(rd)[0], to_target, atol=1e-5)

    def test_directions_normalized(self):
        cam = std_camera(aperture=0.3)
        key = jax.random.PRNGKey(0)
        s = jax.random.uniform(key, (256,))
        t = jax.random.uniform(jax.random.fold_in(key, 1), (256,))
        u = jax.random.uniform(jax.random.fold_in(key, 2), (256, 3))
        ro, rd, tm = get_rays(cam, s, t, u)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rd), axis=-1), 1.0, atol=1e-5
        )

    def test_zero_aperture_is_pinhole(self):
        cam = std_camera(aperture=0.0)
        u1 = jnp.asarray([[0.1, 0.9, 0.0]])
        u2 = jnp.asarray([[0.7, 0.2, 0.0]])
        s = jnp.asarray([0.3])
        t = jnp.asarray([0.6])
        ro1, rd1, _ = get_rays(cam, s, t, u1)
        ro2, rd2, _ = get_rays(cam, s, t, u2)
        # disk sample must not matter at aperture 0
        np.testing.assert_allclose(np.asarray(ro1), np.asarray(ro2), atol=1e-7)
        np.testing.assert_allclose(np.asarray(rd1), np.asarray(rd2), atol=1e-7)

    def test_aperture_spreads_origins(self):
        cam = std_camera(aperture=0.5)
        key = jax.random.PRNGKey(3)
        u = jax.random.uniform(key, (64, 3))
        s = jnp.full((64,), 0.5)
        t = jnp.full((64,), 0.5)
        ro, rd, _ = get_rays(cam, s, t, u)
        assert float(np.asarray(ro).std(axis=0).max()) > 0.01

    def test_shutter_time_sampling(self):
        cam = std_camera(time1=1.0)
        key = jax.random.PRNGKey(4)
        u = jax.random.uniform(key, (1000, 3))
        _, _, tm = get_rays(cam, jnp.full((1000,), 0.5), jnp.full((1000,), 0.5), u)
        tm = np.asarray(tm)
        assert tm.min() >= 0.0 and tm.max() <= 1.0
        assert tm.mean() == pytest.approx(0.5, abs=0.05)


class TestAffine:
    def test_invert_roundtrip(self):
        m = affine_from_rotation_y_translation(37.0, (1.0, -2.0, 3.0))
        inv = invert_affine(m)
        p = np.asarray([0.3, 0.7, -1.1], np.float32)
        q = m[:, :3] @ p + m[:, 3]
        back = inv[:, :3] @ q + inv[:, 3]
        np.testing.assert_allclose(back, p, atol=1e-5)

    def test_identity(self):
        m = identity_affine()
        np.testing.assert_allclose(m[:, :3], np.eye(3), atol=0)
        np.testing.assert_allclose(m[:, 3], 0.0, atol=0)
