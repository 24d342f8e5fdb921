"""Silhouette (visibility) gradient tests — the BASELINE.json north star
item interior autodiff cannot cover.

Test scene design: a lambertian sphere under a constant sky is shaded
flat, so interior gradients w.r.t. its position are ~0 — ALL positional
signal lives in the silhouette. FD "sees" the edge (the sphere covers
different pixels), so FD vs (interior-AD + boundary term) is a direct
check of the edge estimator, and position recovery from such a scene is
impossible without it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.camera import make_camera
from pathtrace_tpu.models.build import SceneBuilder
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops.silhouette import project_to_film, silhouette_grads
from pathtrace_tpu.render.frame import render_frame

W, H, SPP, DEPTH = 32, 32, 8, 3
CAM = make_camera((0.0, 0.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                  45.0, 1.0, aperture=0.0, focus_dist=3.0)


def flat_sphere_scene(cx=0.0):
    b = SceneBuilder()
    b.sphere((cx, 0.0, 0.0), 0.6, b.lambertian_color((0.15, 0.15, 0.15)))
    b.sky = (0.75, 0.75, 0.75)
    return b.finish()


def set_center_x(scene, cx):
    center = jnp.asarray(scene.spheres.center).at[0, 0].set(cx)
    sph = dataclasses.replace(scene.spheres, center=center)
    return dataclasses.replace(scene, spheres=sph)


def render(scene, key, differentiable=False):
    feats = SceneFeatures.from_scene(scene)
    img, _ = render_frame(scene, CAM, W, H, SPP, DEPTH, key,
                          differentiable=differentiable, features=feats)
    return img


class TestProjection:
    def test_roundtrip_center_pixel(self):
        """A point straight ahead projects to the film center."""
        s, t, ok = project_to_film(CAM, jnp.asarray([0.0, 0.0, 0.0]))
        assert bool(ok)
        assert abs(float(s) - 0.5) < 1e-5 and abs(float(t) - 0.5) < 1e-5

    def test_ray_point_projects_back(self):
        from pathtrace_tpu.camera import get_rays

        s0, t0 = jnp.asarray([0.23]), jnp.asarray([0.71])
        ro, rd, _ = get_rays(CAM, s0, t0, jnp.full((1, 3), 0.5))
        x = ro + 2.5 * rd
        s, t, ok = project_to_film(CAM, x[0])
        assert bool(ok)
        assert abs(float(s) - 0.23) < 1e-5 and abs(float(t) - 0.71) < 1e-5


class TestEdgeGradient:
    def test_fd_vs_boundary_term_across_edge(self):
        """d(MSE)/d(center.x) at an offset position: FD of the full loss vs
        interior-AD + silhouette boundary term. Interior-AD alone is ~0 in
        this flat-shaded scene — the test fails without the edge term."""
        key = jax.random.PRNGKey(3)
        target = np.asarray(render(flat_sphere_scene(0.0), key))
        scene0 = flat_sphere_scene(0.25)
        feats = SceneFeatures.from_scene(scene0)

        def loss_of_cx(cx):
            img = render(set_center_x(scene0, cx), key, differentiable=True)
            return jnp.mean((img - target) ** 2)

        # interior autodiff (no visibility term)
        g_int = float(jax.grad(loss_of_cx)(jnp.float32(0.25)))

        # boundary term
        img0 = render(scene0, key)
        grad_img = np.asarray(2.0 * (img0 - target) / img0.size)
        d_center, d_radius = silhouette_grads(
            scene0, CAM, W, H, jnp.asarray(grad_img),
            jax.random.PRNGKey(9), max_depth=DEPTH, features=feats,
            n_samples=512,
        )
        g_edge = float(d_center[0, 0])

        # finite differences of the full loss (common random numbers);
        # h sweeps the edge across ~1 pixel
        h = 0.02
        lp = float(loss_of_cx(jnp.float32(0.25 + h)))
        lm = float(loss_of_cx(jnp.float32(0.25 - h)))
        g_fd = (lp - lm) / (2 * h)

        assert abs(g_fd) > 5 * abs(g_int), (
            f"scene not silhouette-dominated: fd={g_fd} interior={g_int}"
        )
        total = g_int + g_edge
        assert np.sign(total) == np.sign(g_fd)
        assert abs(total - g_fd) < 0.35 * abs(g_fd), (
            f"fd={g_fd} interior={g_int} edge={g_edge}"
        )

    def test_position_recovery_from_silhouette_only(self):
        """inverse rendering recovers a sphere position whose change is
        visible ONLY as a silhouette shift (VERDICT item 3 'done' bar)."""
        from pathtrace_tpu.parallel.inverse import make_inverse_renderer

        true_scene = flat_sphere_scene(0.0)
        key = jax.random.PRNGKey(1)
        target = render(true_scene, key)

        init_scene = flat_sphere_scene(0.3)
        renderer, state, names = make_inverse_renderer(
            init_scene, CAM, W, H, samples=SPP, max_depth=DEPTH,
            trainable=lambda p: p == "spheres.center",
            learning_rate=3e-2, silhouette=True, silhouette_samples=256,
        )
        assert names == ["spheres.center"]
        x0 = float(state.params[0][0, 0])
        for step in range(30):
            state, loss = renderer.train_step(
                state, target, jax.random.fold_in(key, step)
            )
        x_final = float(state.params[0][0, 0])
        assert abs(x0 - 0.3) < 1e-6
        # moved at least 60% of the way to the truth
        assert abs(x_final) < 0.12, f"center.x {x0} -> {x_final}, want ~0"

    def test_no_silhouette_grads_stall(self):
        """Control: without the boundary term the optimizer barely moves —
        proving the recovery above is the edge term's doing."""
        from pathtrace_tpu.parallel.inverse import make_inverse_renderer

        key = jax.random.PRNGKey(1)
        target = render(flat_sphere_scene(0.0), key)
        renderer, state, _ = make_inverse_renderer(
            flat_sphere_scene(0.3), CAM, W, H, samples=SPP, max_depth=DEPTH,
            trainable=lambda p: p == "spheres.center",
            learning_rate=3e-2, silhouette=False,
        )
        for step in range(10):
            state, _ = renderer.train_step(
                state, target, jax.random.fold_in(key, step)
            )
        assert abs(float(state.params[0][0, 0]) - 0.3) < 0.05
