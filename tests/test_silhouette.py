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


def _render40(scene, key):
    """Higher-res/spp renderer for the rect/box FD tests (small-h FD needs
    lower MC noise than the 32x32@8 default)."""
    feats = SceneFeatures.from_scene(scene)
    img, _ = render_frame(scene, CAM, 40, 40, 16, DEPTH, key, features=feats)
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
        d_center, _d_delta, d_radius = silhouette_grads(
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

    def test_fd_vs_edge_rect(self):
        """Rect boundary edges (cornell's geometry class): FD of the loss
        w.r.t. an in-plane translation vs the rect edge term. Geometry uses
        generic subpixel placement — with edges exactly on pixel
        boundaries, the box-filter loss is one-sided there and FD-vs-
        analytic comparison is ill-posed."""
        from pathtrace_tpu.ops.silhouette import rect_silhouette_grads

        dx0 = 0.2137

        def mk(dx):
            b = SceneBuilder()
            b.rect_xy(-0.483 + dx, 0.517 + dx, -0.483, 0.517, 0.0, False,
                      b.lambertian_color((0.15, 0.15, 0.15)))
            b.sky = (0.75, 0.75, 0.75)
            return b.finish()

        key = jax.random.PRNGKey(3)
        target = np.asarray(_render40(mk(0.0), key))
        scene0 = mk(dx0)
        feats = SceneFeatures.from_scene(scene0)
        img0 = np.asarray(_render40(scene0, key))
        grad_img = jnp.asarray(2.0 * (img0 - target) / img0.size)
        terms = rect_silhouette_grads(
            scene0, CAM, 40, 40, grad_img, jax.random.PRNGKey(9),
            max_depth=DEPTH, features=feats, n_per_edge=256,
        )
        g_edge = float(terms["rects.a0"][0] + terms["rects.a1"][0])

        def loss(dx):
            img = _render40(mk(float(dx)), key)
            return float(jnp.mean((jnp.asarray(img) - target) ** 2))

        h = 0.004
        g_fd = (loss(dx0 + h) - loss(dx0 - h)) / (2 * h)
        assert np.sign(g_edge) == np.sign(g_fd)
        assert abs(g_edge - g_fd) < 0.3 * abs(g_fd), (
            f"fd={g_fd} edge={g_edge}"
        )

    def test_fd_vs_edge_box(self):
        """Rotated-cuboid silhouette edges (cornell's boxes): FD w.r.t. the
        world translation vs the box edge term on world_from_obj's
        translation column."""
        from pathtrace_tpu.models.build import (
            affine_from_rotation_y_translation,
        )
        from pathtrace_tpu.ops.silhouette import box_silhouette_grads

        dx0 = 0.2137

        def mk(dx):
            b = SceneBuilder()
            b.box((-0.395, -0.41, -0.4), (0.405, 0.39, 0.4),
                  b.lambertian_color((0.15, 0.15, 0.15)),
                  affine_from_rotation_y_translation(25.0, (dx, 0.013, 0.0)))
            b.sky = (0.75, 0.75, 0.75)
            return b.finish()

        key = jax.random.PRNGKey(3)
        target = np.asarray(_render40(mk(0.0), key))
        scene0 = mk(dx0)
        feats = SceneFeatures.from_scene(scene0)
        img0 = np.asarray(_render40(scene0, key))
        grad_img = jnp.asarray(2.0 * (img0 - target) / img0.size)
        terms = box_silhouette_grads(
            scene0, CAM, 40, 40, grad_img, jax.random.PRNGKey(11),
            max_depth=DEPTH, features=feats, n_per_edge=256,
        )
        g_edge = float(terms["boxes.world_from_obj"][0, 0, 3])

        def loss(dx):
            img = _render40(mk(float(dx)), key)
            return float(jnp.mean((jnp.asarray(img) - target) ** 2))

        h = 0.004
        g_fd = (loss(dx0 + h) - loss(dx0 - h)) / (2 * h)
        assert np.sign(g_edge) == np.sign(g_fd)
        assert abs(g_edge - g_fd) < 0.3 * abs(g_fd), (
            f"fd={g_fd} edge={g_edge}"
        )

    def test_box_position_recovery(self):
        """Recover a cornell-style box's world translation from silhouette
        signal only (flat shading). world_from_obj and obj_from_world must
        stay consistent inverses, so the test optimizes a translation
        vector and rebuilds both — the silhouette term's world_from_obj
        gradient pulls back to d/d(translation) as its column 3."""
        from pathtrace_tpu.models.build import (
            affine_from_rotation_y_translation, invert_affine,
        )
        from pathtrace_tpu.ops.silhouette import box_silhouette_grads

        def mk(tx):
            b = SceneBuilder()
            b.box((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4),
                  b.lambertian_color((0.15, 0.15, 0.15)),
                  affine_from_rotation_y_translation(25.0, (tx, 0.0, 0.0)))
            b.sky = (0.75, 0.75, 0.75)
            return b.finish()

        key = jax.random.PRNGKey(1)
        target = jnp.asarray(render(mk(0.0), key))
        tx = 0.3
        lr = 0.8
        for step in range(30):
            scene = mk(tx)
            feats = SceneFeatures.from_scene(scene)
            img = render(scene, jax.random.fold_in(key, step))
            grad_img = 2.0 * (img - target) / img.size
            terms = box_silhouette_grads(
                scene, CAM, W, H, grad_img,
                jax.random.fold_in(jax.random.PRNGKey(7), step),
                max_depth=DEPTH, features=feats, n_per_edge=64,
            )
            g = float(terms["boxes.world_from_obj"][0, 0, 3])
            tx -= lr * g
        assert abs(tx) < 0.12, f"box tx 0.3 -> {tx}, want ~0"

    def test_aperture_lens_integration(self):
        """aperture > 0: each edge sample rides its own lens point (contour,
        projection, and pair rays share it) — the estimator matches FD
        under defocus, the VERDICT r3 item-3 aperture story."""
        cam = make_camera((0.0, 0.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                          45.0, 1.0, aperture=0.25, focus_dist=3.0)
        dx0 = 0.2137

        def sc(cx):
            return flat_sphere_scene(cx)

        def rend(scene, key):
            feats = SceneFeatures.from_scene(scene)
            img, _ = render_frame(scene, cam, 40, 40, 64, DEPTH, key,
                                  features=feats)
            return img

        key = jax.random.PRNGKey(3)
        target = np.asarray(rend(sc(0.0), key))
        scene0 = sc(dx0)
        feats = SceneFeatures.from_scene(scene0)
        img0 = np.asarray(rend(scene0, key))
        grad_img = jnp.asarray(2.0 * (img0 - target) / img0.size)
        d_center, _d_delta, _ = silhouette_grads(
            scene0, cam, 40, 40, grad_img, jax.random.PRNGKey(9),
            max_depth=DEPTH, features=feats, n_samples=2048,
        )
        g_edge = float(d_center[0, 0])

        def loss(dx):
            img = rend(sc(float(dx)), key)
            return float(jnp.mean((jnp.asarray(img) - target) ** 2))

        h = 0.01
        g_fd = (loss(dx0 + h) - loss(dx0 - h)) / (2 * h)
        assert np.sign(g_edge) == np.sign(g_fd)
        assert abs(g_edge - g_fd) < 0.3 * abs(g_fd), (
            f"fd={g_fd} edge={g_edge}"
        )

    def test_silhouette_grads_all_mixed_scene(self):
        """The dict API covers every family present in a mixed scene with
        leaf-path keys matching split_scene's names."""
        from pathtrace_tpu.models.build import (
            affine_from_rotation_y_translation,
        )
        from pathtrace_tpu.ops.silhouette import silhouette_grads_all

        b = SceneBuilder()
        b.sphere((-0.8, 0.0, 0.0), 0.4, b.lambertian_color((0.2, 0.2, 0.2)))
        b.rect_xy(-0.3, 0.3, -0.3, 0.3, -0.5, False,
                  b.lambertian_color((0.2, 0.2, 0.2)))
        b.box((0.5, -0.3, -0.3), (1.1, 0.3, 0.3),
              b.lambertian_color((0.2, 0.2, 0.2)),
              affine_from_rotation_y_translation(15.0, (0.0, 0.0, 0.0)))
        b.sky = (0.75, 0.75, 0.75)
        scene = b.finish()
        feats = SceneFeatures.from_scene(scene)
        grad_img = jnp.ones((H, W, 3)) * 1e-3
        terms = silhouette_grads_all(
            scene, CAM, W, H, grad_img, jax.random.PRNGKey(2),
            max_depth=2, features=feats, n_samples=64,
        )
        expected = {"spheres.center", "spheres.radius",
                    "rects.a0", "rects.a1", "rects.b0", "rects.b1",
                    "rects.k", "boxes.p0", "boxes.p1",
                    "boxes.world_from_obj"}
        assert expected == set(terms)
        for k, v in terms.items():
            assert np.isfinite(np.asarray(v)).all(), k

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


MCAM = make_camera((0.0, 0.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                   45.0, 1.0, aperture=0.0, focus_dist=3.0,
                   time0=0.0, time1=1.0)


def moving_flat_scene(dx):
    """Flat-shaded MOVING sphere: center sweeps (0,0,0) -> (dx,0,0) over
    the shutter. All positional signal is in the (time-averaged)
    silhouette."""
    b = SceneBuilder()
    b.moving_sphere((0.0, 0.0, 0.0), (dx, 0.0, 0.0), 0.0, 1.0, 0.6,
                    b.lambertian_color((0.15, 0.15, 0.15)))
    b.sky = (0.75, 0.75, 0.75)
    return b.finish()


def set_delta_x(scene, dx):
    delta = jnp.asarray(scene.spheres.center_delta).at[0, 0].set(dx)
    sph = dataclasses.replace(scene.spheres, center_delta=delta)
    return dataclasses.replace(scene, spheres=sph)


def render_m(scene, key, differentiable=False):
    feats = SceneFeatures.from_scene(scene)
    img, _ = render_frame(scene, MCAM, W, H, 16, DEPTH, key,
                          differentiable=differentiable, features=feats)
    return img


class TestMovingSilhouette:
    def test_fd_vs_boundary_term_center_delta(self):
        """d(MSE)/d(center_delta.x): the contour is evaluated at per-sample
        shutter times, so the boundary vjp carries the motion component
        (r4 gap: contours were time-0 only and d_delta was zero)."""
        key = jax.random.PRNGKey(4)
        target = np.asarray(render_m(moving_flat_scene(0.2), key))
        dx0 = 0.55
        scene0 = moving_flat_scene(dx0)
        feats = SceneFeatures.from_scene(scene0)
        assert feats.has_motion

        def loss_of_dx(dx):
            img = render_m(set_delta_x(scene0, dx), key, differentiable=True)
            return jnp.mean((img - target) ** 2)

        g_int = float(jax.grad(loss_of_dx)(jnp.float32(dx0)))

        img0 = render_m(scene0, key)
        grad_img = np.asarray(2.0 * (img0 - target) / img0.size)
        d_center, d_delta, _ = silhouette_grads(
            scene0, MCAM, W, H, jnp.asarray(grad_img),
            jax.random.PRNGKey(11), max_depth=DEPTH, features=feats,
            n_samples=1024,
        )
        g_edge = float(d_delta[0, 0])

        h = 0.04
        lp = float(loss_of_dx(jnp.float32(dx0 + h)))
        lm = float(loss_of_dx(jnp.float32(dx0 - h)))
        g_fd = (lp - lm) / (2 * h)

        # the FD signal is real and the interior term alone misses it
        assert abs(g_fd) > 5 * abs(g_int), (g_fd, g_int)
        g_ad = g_int + g_edge
        assert np.sign(g_ad) == np.sign(g_fd)
        assert abs(g_ad - g_fd) < 0.5 * abs(g_fd), (g_ad, g_fd, g_int, g_edge)
        # and the center term still matches the static estimator's role:
        # d_center ~ the same edge force (delta rides half the shutter on
        # average, so |d_delta| ~ E[s]·|d_center|)
        assert abs(d_center[0, 0]) > 0.0

    def test_grads_all_exposes_center_delta(self):
        from pathtrace_tpu.ops.silhouette import silhouette_grads_all

        scene = moving_flat_scene(0.4)
        feats = SceneFeatures.from_scene(scene)
        out = silhouette_grads_all(
            scene, MCAM, W, H, jnp.ones((H, W, 3)) / (W * H * 3),
            jax.random.PRNGKey(5), max_depth=DEPTH, features=feats,
            n_samples=256,
        )
        assert "spheres.center_delta" in out
        assert np.isfinite(np.asarray(out["spheres.center_delta"])).all()
        assert np.abs(np.asarray(out["spheres.center_delta"])).max() > 0.0
