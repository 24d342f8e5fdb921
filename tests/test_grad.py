"""Gradient correctness: autodiff vs central finite differences
(BASELINE.json north star; SURVEY.md §4 'finite-difference vs autodiff
allclose').

Common random numbers: the same Threefry key drives both FD evaluations and
the autodiff pass, so the Monte Carlo estimator is a deterministic function
of parameters and FD is exact up to O(h^2) smoothness error — away from
visibility silhouettes and discrete-decision boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models.build import SceneBuilder
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render.frame import render_frame


def fd_grad(f, x0, h):
    return (f(x0 + h) - f(x0 - h)) / (2.0 * h)


def render_loss(scene, cam_args, features, key, w=24, h=24, spp=4, depth=3):
    from pathtrace_tpu.camera import make_camera

    cam = make_camera(*cam_args)
    img, _ = render_frame(
        scene, cam, w, h, spp, depth, key, differentiable=True, features=features
    )
    return jnp.mean(img)


CAM = ((0.0, 0.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 40.0, 1.0, 0.0, 3.0)


def full_view_sphere_scene(albedo=(0.4, 0.5, 0.6)):
    """A big sphere filling the whole frame: no silhouette edges in view, so
    geometry gradients are smooth and FD-comparable."""
    b = SceneBuilder()
    b.sphere((0.0, 0.0, -4.0), 4.0, b.lambertian_color(albedo))
    return b.finish()


class TestAlbedoGrad:
    def test_linear_in_albedo(self):
        key = jax.random.PRNGKey(0)
        scene = full_view_sphere_scene()
        feats = SceneFeatures.from_scene(scene)

        def loss_of_albedo(a):
            s2 = scene
            color = s2.textures.color.copy() if hasattr(s2.textures.color, "copy") else s2.textures.color
            color = jnp.asarray(s2.textures.color).at[0, 0].set(a)
            s2 = jax.tree_util.tree_map(lambda x: x, s2)
            import dataclasses

            tex = dataclasses.replace(s2.textures, color=color)
            s2 = dataclasses.replace(s2, textures=tex)
            return render_loss(s2, CAM, feats, key)

        a0 = jnp.float32(0.4)
        g_auto = jax.grad(loss_of_albedo)(a0)
        g_fd = fd_grad(loss_of_albedo, a0, 1e-2)
        assert float(g_auto) == pytest.approx(float(g_fd), rel=2e-2)
        assert float(g_auto) > 0.0

    def test_emission_grad(self):
        key = jax.random.PRNGKey(0)
        b = SceneBuilder()
        b.sphere((0.0, 0.0, -4.0), 4.0, b.diffuse_light_color((2.0, 2.0, 2.0)))
        b.sky = (0.0, 0.0, 0.0)
        scene = b.finish()
        feats = SceneFeatures.from_scene(scene)

        def loss_of_emission(e):
            import dataclasses

            color = jnp.asarray(scene.textures.color).at[0].set(e)
            tex = dataclasses.replace(scene.textures, color=color)
            s2 = dataclasses.replace(scene, textures=tex)
            return render_loss(s2, CAM, feats, key)

        e0 = jnp.float32(2.0)
        g_auto = jax.grad(loss_of_emission)(e0)
        g_fd = fd_grad(loss_of_emission, e0, 1e-2)
        # every pixel sees the light directly and all 3 channels share e:
        # d(mean)/d(e) = 1
        assert float(g_auto) == pytest.approx(float(g_fd), rel=1e-3)
        assert float(g_auto) == pytest.approx(1.0, abs=1e-3)


class TestGeometryGrad:
    def test_sphere_center_z(self):
        key = jax.random.PRNGKey(1)

        def loss_of_z(z):
            import dataclasses

            b = full_view_sphere_scene()
            center = jnp.asarray(b.spheres.center).at[0, 2].set(z)
            sp = dataclasses.replace(b.spheres, center=center)
            s2 = dataclasses.replace(b, spheres=sp)
            return render_loss(s2, CAM, SceneFeatures.from_scene(b), key)

        z0 = jnp.float32(-4.0)
        g_auto = float(jax.grad(loss_of_z)(z0))
        g_fd = float(fd_grad(loss_of_z, z0, 1e-3))
        assert np.isfinite(g_auto)
        assert g_auto == pytest.approx(g_fd, rel=0.05, abs=1e-4)

    def test_sphere_radius(self):
        key = jax.random.PRNGKey(2)

        def loss_of_r(r):
            import dataclasses

            b = full_view_sphere_scene()
            radius = jnp.asarray(b.spheres.radius).at[0].set(r)
            sp = dataclasses.replace(b.spheres, radius=radius)
            s2 = dataclasses.replace(b, spheres=sp)
            return render_loss(s2, CAM, SceneFeatures.from_scene(b), key)

        r0 = jnp.float32(4.0)
        g_auto = float(jax.grad(loss_of_r)(r0))
        g_fd = float(fd_grad(loss_of_r, r0, 1e-3))
        assert np.isfinite(g_auto)
        assert g_auto == pytest.approx(g_fd, rel=0.05, abs=1e-4)


class TestMaterialGrad:
    def test_metal_fuzz(self):
        key = jax.random.PRNGKey(3)

        def loss_of_fuzz(fz):
            import dataclasses

            b = SceneBuilder()
            b.sphere((0.0, 0.0, -4.0), 4.0, b.metal((0.9, 0.9, 0.9), 0.3))
            scene = b.finish()
            fuzz = jnp.asarray(scene.materials.fuzz).at[0].set(fz)
            mats = dataclasses.replace(scene.materials, fuzz=fuzz)
            s2 = dataclasses.replace(scene, materials=mats)
            return render_loss(s2, CAM, SceneFeatures.from_scene(scene), key)

        f0 = jnp.float32(0.3)
        g_auto = float(jax.grad(loss_of_fuzz)(f0))
        g_fd = float(fd_grad(loss_of_fuzz, f0, 1e-3))
        assert np.isfinite(g_auto)
        assert g_auto == pytest.approx(g_fd, rel=0.05, abs=1e-4)

    def test_perlin_point_grad_through_noise_texture(self):
        key = jax.random.PRNGKey(4)

        def loss_of_z(z):
            import dataclasses

            b = SceneBuilder()
            b.sphere((0.0, 0.0, -4.0), 4.0, b.lambertian(b.noise_texture(4.0)))
            scene = b.finish()
            center = jnp.asarray(scene.spheres.center).at[0, 2].set(z)
            sp = dataclasses.replace(scene.spheres, center=center)
            s2 = dataclasses.replace(scene, spheres=sp)
            return render_loss(s2, CAM, SceneFeatures.from_scene(scene), key)

        z0 = jnp.float32(-4.0)
        g_auto = float(jax.grad(loss_of_z)(z0))
        g_fd = float(fd_grad(loss_of_z, z0, 1e-3))
        assert np.isfinite(g_auto)
        # marble texture is high-frequency; allow a loose but meaningful match
        assert g_auto == pytest.approx(g_fd, rel=0.2, abs=1e-3)


class TestCameraGrad:
    """The camera is a differentiable lens model (BASELINE.json north star:
    'camera/DoF sampling -> batched differentiable lens model'): pixel
    gradients must flow through make_camera's basis construction and
    get_ray's lens/film arithmetic to the user-facing camera parameters."""

    def test_lookfrom_z(self):
        key = jax.random.PRNGKey(5)

        def loss_of_z(z):
            lookfrom = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), z])
            cam_args = (lookfrom, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                        40.0, 1.0, 0.0, 3.0)
            scene = full_view_sphere_scene()
            return render_loss(scene, cam_args, SceneFeatures.from_scene(scene), key)

        z0 = jnp.float32(3.0)
        g_auto = float(jax.grad(loss_of_z)(z0))
        g_fd = float(fd_grad(loss_of_z, z0, 1e-3))
        assert np.isfinite(g_auto)
        assert g_auto == pytest.approx(g_fd, rel=0.05, abs=1e-4)

    def test_vfov(self):
        key = jax.random.PRNGKey(6)

        def loss_of_fov(fov):
            cam_args = ((0.0, 0.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                        fov, 1.0, 0.0, 3.0)
            scene = full_view_sphere_scene()
            return render_loss(scene, cam_args, SceneFeatures.from_scene(scene), key)

        f0 = jnp.float32(40.0)
        g_auto = float(jax.grad(loss_of_fov)(f0))
        g_fd = float(fd_grad(loss_of_fov, f0, 1e-2))
        assert np.isfinite(g_auto)
        assert g_auto == pytest.approx(g_fd, rel=0.05, abs=1e-4)

    def test_defocus_aperture(self):
        # thin-lens defocus: the aperture-disk offset is reparameterized
        # (fixed uniforms scale with the lens radius), so d(loss)/d(aperture)
        # is a smooth interior gradient. Blur preserves the image MEAN to
        # first order, so the sensitive statistic is the second moment of a
        # textured (smooth marble-noise) defocused sphere.
        from pathtrace_tpu.camera import make_camera

        key = jax.random.PRNGKey(7)
        b = SceneBuilder()
        b.sphere((0.0, 0.0, -4.0), 4.0, b.lambertian(b.noise_texture(2.0)))
        scene = b.finish()
        feats = SceneFeatures.from_scene(scene)

        def loss_of_ap(ap):
            cam = make_camera((0.0, 0.0, 3.0), (0.0, 0.0, 0.0),
                              (0.0, 1.0, 0.0), 40.0, 1.0, ap, 5.0)
            img, _ = render_frame(scene, cam, 24, 24, 4, 3, key,
                                  differentiable=True, features=feats)
            return jnp.mean(img * img)

        a0 = jnp.float32(0.4)
        g_auto = float(jax.grad(loss_of_ap)(a0))
        g_fd = float(fd_grad(loss_of_ap, a0, 1e-3))
        assert np.isfinite(g_auto)
        assert abs(g_auto) > 1e-4  # blur actually moves the second moment
        assert g_auto == pytest.approx(g_fd, rel=0.05, abs=1e-4)
