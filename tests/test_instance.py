"""Generic instance transforms on spheres and rects.

The reference ``Instance`` wraps ANY hitable with an arbitrary affine and
caches the inverse (reference ``src/collision/instance.rs:16-47``). Here the
affine pair rides per-primitive on Spheres/Rects (None for plain scenes —
a static gate, so untransformed scenes compile the identical programs).
These tests pin: transformed == pre-transformed twin (sphere + rect, on the
general intersector, the BVH, and end-to-end), object-space UV semantics,
non-uniform scale (ellipsoid), and gradients through the affine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models.build import (
    SceneBuilder,
    affine_compose,
    affine_from_axis_angle,
    affine_from_rotation_y_translation,
)
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops import intersect as isect


def _rays(n=256, seed=0, origin=(0.0, 0.0, 5.0), spread=1.0):
    rng = np.random.default_rng(seed)
    ro = np.tile(np.asarray(origin, np.float32), (n, 1))
    target = rng.standard_normal((n, 3)).astype(np.float32) * spread
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd), jnp.zeros(n, jnp.float32)


def _sphere_scene(center, radius, transform=None):
    b = SceneBuilder()
    b.sphere(center, radius, b.lambertian_color((0.5, 0.5, 0.5)),
             transform=transform)
    return b.finish()


class TestInstancedSpheres:
    def test_translated_sphere_matches_direct_twin(self):
        xf = affine_from_rotation_y_translation(0.0, (1.0, -0.5, 0.25))
        s_direct = _sphere_scene((1.0, -0.5, 0.25), 0.7)
        s_inst = _sphere_scene((0.0, 0.0, 0.0), 0.7, transform=xf)
        assert s_inst.spheres.world_from_obj is not None
        ro, rd, t = _rays()
        t_d, _ = isect.sphere_nearest(s_direct.spheres, ro, rd, t)
        t_i, _ = isect.sphere_nearest(s_inst.spheres, ro, rd, t)
        np.testing.assert_allclose(np.asarray(t_d), np.asarray(t_i),
                                   rtol=1e-5, atol=1e-5)
        rec_d = isect.sphere_record(s_direct.spheres, t_d,
                                    jnp.zeros_like(t_d, jnp.int32), ro, rd, t)
        rec_i = isect.sphere_record(s_inst.spheres, t_i,
                                    jnp.zeros_like(t_i, jnp.int32), ro, rd, t)
        hit = np.asarray(rec_d.hit)
        assert hit.any()
        np.testing.assert_allclose(np.asarray(rec_d.point)[hit],
                                   np.asarray(rec_i.point)[hit], atol=1e-4)
        np.testing.assert_allclose(np.asarray(rec_d.normal)[hit],
                                   np.asarray(rec_i.normal)[hit], atol=1e-4)

    def test_rotation_about_center_preserves_geometry_rotates_uv(self):
        # rotating a sphere about its own center changes nothing
        # geometrically but spins the (object-space) UV parameterization —
        # exactly the reference's instanced-earth semantics
        deg = 90.0
        xf = affine_from_axis_angle((0.0, 1.0, 0.0), deg)
        s_plain = _sphere_scene((0.0, 0.0, 0.0), 1.0)
        s_rot = _sphere_scene((0.0, 0.0, 0.0), 1.0, transform=xf)
        ro, rd, t = _rays(seed=1)
        t_p, i_p = isect.sphere_nearest(s_plain.spheres, ro, rd, t)
        t_r, i_r = isect.sphere_nearest(s_rot.spheres, ro, rd, t)
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_r),
                                   rtol=1e-5, atol=1e-5)
        rec_p = isect.sphere_record(s_plain.spheres, t_p, i_p, ro, rd, t)
        rec_r = isect.sphere_record(s_rot.spheres, t_r, i_r, ro, rd, t)
        hit = np.asarray(rec_p.hit)
        np.testing.assert_allclose(np.asarray(rec_p.normal)[hit],
                                   np.asarray(rec_r.normal)[hit], atol=1e-4)
        # UV is object-space (the reference computes it in the wrapped
        # child before the hit is forward-transformed): recompute from the
        # back-rotated world normal with the repo's (phi=atan2(x,y),
        # theta=asin(y)) convention and compare
        rot = np.asarray(xf[:, :3])
        n_obj = np.asarray(rec_r.normal)[hit] @ rot  # R^-1 = R^T applied
        phi = np.arctan2(n_obj[:, 0], n_obj[:, 1])
        theta = np.arcsin(np.clip(n_obj[:, 1], -1, 1))
        want_u = 1.0 - (phi + np.pi) / (2 * np.pi)
        want_v = (theta + np.pi / 2) / np.pi
        np.testing.assert_allclose(np.asarray(rec_r.u)[hit], want_u, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rec_r.v)[hit], want_v, atol=1e-4)
        # and the UVs really did move vs the unrotated twin
        assert np.abs(np.asarray(rec_p.u)[hit] - np.asarray(rec_r.u)[hit]).max() > 0.1

    def test_ellipsoid_nonuniform_scale(self):
        # scale a unit sphere by (2, 1, 0.5): hits satisfy the ellipsoid
        # equation and normals align with the analytic gradient
        xf = np.array([[2.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 0.5, 0]],
                      np.float32)
        s = _sphere_scene((0.0, 0.0, 0.0), 1.0, transform=xf)
        ro, rd, t = _rays(seed=2, origin=(0.0, 0.0, 4.0), spread=0.4)
        tt, ii = isect.sphere_nearest(s.spheres, ro, rd, t)
        rec = isect.sphere_record(s.spheres, tt, ii, ro, rd, t)
        hit = np.asarray(rec.hit)
        assert hit.sum() > 50
        p = np.asarray(rec.point)[hit]
        lhs = (p[:, 0] / 2.0) ** 2 + p[:, 1] ** 2 + (p[:, 2] / 0.5) ** 2
        np.testing.assert_allclose(lhs, 1.0, atol=1e-3)
        # analytic ellipsoid normal ~ (x/a^2, y/b^2, z/c^2)
        g = np.stack([p[:, 0] / 4.0, p[:, 1], p[:, 2] / 0.25], axis=-1)
        g /= np.linalg.norm(g, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(rec.normal)[hit], g, atol=1e-3)

    def test_gradients_flow_through_affine(self):
        xf = affine_from_rotation_y_translation(30.0, (0.5, 0.0, 0.0))
        s = _sphere_scene((0.0, 0.0, 0.0), 1.0, transform=xf)
        ro, rd, t = _rays(seed=3, spread=0.3)

        def f(wfo, ofw):
            sph = s.spheres._replace if hasattr(s.spheres, "_replace") else None
            import dataclasses as dc

            sph = dc.replace(s.spheres, world_from_obj=wfo, obj_from_world=ofw)
            tt, ii = isect.sphere_nearest(sph, ro, rd, t)
            return jnp.sum(jnp.where(tt < 1e17, tt, 0.0))

        g_wfo, g_ofw = jax.grad(f, argnums=(0, 1))(
            jnp.asarray(s.spheres.world_from_obj),
            jnp.asarray(s.spheres.obj_from_world))
        # hit t depends on the inverse transform only
        assert np.isfinite(np.asarray(g_ofw)).all()
        assert np.abs(np.asarray(g_ofw)).max() > 0.0


class TestInstancedRects:
    def test_rotated_rect_matches_axis_aligned_twin(self):
        # an XY rect at z=k rotated -90 deg about Y lands on the YZ plane:
        # compare against the directly-built YZ rect
        b1 = SceneBuilder()
        b1.rect_yz(-1.0, 1.0, -2.0, 2.0, 0.5, False,
                   b1.lambertian_color((0.5, 0.5, 0.5)))
        s_direct = b1.finish()

        # object space: XY rect x in [-2,2] (maps to world z), y in [-1,1]
        # (stays y), plane z = 0.5 (maps to world x). rotate +90 about Y:
        # (x,y,z) -> (z, y, -x)
        xf = affine_from_axis_angle((0.0, 1.0, 0.0), 90.0)
        b2 = SceneBuilder()
        b2.rect_xy(-2.0, 2.0, -1.0, 1.0, 0.5, False,
                   b2.lambertian_color((0.5, 0.5, 0.5)), transform=xf)
        s_inst = b2.finish()
        assert s_inst.rects.world_from_obj is not None

        ro, rd, t = _rays(seed=4, origin=(5.0, 0.2, 0.1), spread=1.2)
        t_d, i_d = isect.rect_nearest(s_direct.rects, ro, rd)
        t_i, i_i = isect.rect_nearest(s_inst.rects, ro, rd)
        hit_d = np.asarray(t_d) < 1e17
        hit_i = np.asarray(t_i) < 1e17
        np.testing.assert_array_equal(hit_d, hit_i)
        assert hit_d.sum() > 20
        np.testing.assert_allclose(np.asarray(t_d)[hit_d],
                                   np.asarray(t_i)[hit_d], rtol=1e-4,
                                   atol=1e-4)
        rec_d = isect.rect_record(s_direct.rects, t_d, i_d, ro, rd)
        rec_i = isect.rect_record(s_inst.rects, t_i, i_i, ro, rd)
        # world normals agree up to sign conventions of the rotation
        nd = np.asarray(rec_d.normal)[hit_d]
        ni = np.asarray(rec_i.normal)[hit_d]
        np.testing.assert_allclose(np.abs(nd), np.abs(ni), atol=1e-4)
        np.testing.assert_allclose(np.asarray(rec_d.point)[hit_d],
                                   np.asarray(rec_i.point)[hit_d], atol=1e-4)


class TestInstancedSceneEndToEnd:
    def _scenes(self):
        def build(instanced):
            b = SceneBuilder()
            mat = b.lambertian_color((0.6, 0.3, 0.2))
            if instanced:
                xf = affine_compose(
                    affine_from_axis_angle((0.0, 0.0, 1.0), 45.0),
                    affine_from_rotation_y_translation(0.0, (0.0, 0.0, -1.0)),
                )
                b.sphere((0.0, 0.0, 0.0), 0.5, mat, transform=xf)
            else:
                b.sphere((0.0, 0.0, -1.0), 0.5, mat)
            b.sphere((0.0, -100.5, -1.0), 100.0,
                     b.lambertian_color((0.5, 0.5, 0.5)))
            return b.finish()

        return build(False), build(True)

    def test_render_matches_pretransformed_twin(self):
        from pathtrace_tpu.camera import make_camera
        from pathtrace_tpu.config import Params
        from pathtrace_tpu.render.progressive import render_progressive

        s_plain, s_inst = self._scenes()
        assert not np.shares_memory(np.asarray(s_plain.spheres.center),
                                    np.asarray(s_inst.spheres.center))
        cam = make_camera((0.0, 0.3, 1.0), (0.0, 0.0, -1.0), (0.0, 1.0, 0.0),
                          60.0, 1.0, 0.0, 1.0)
        params = Params(width=24, height=24, samples=4, max_depth=4)
        r_p = render_progressive(s_plain, cam, params, max_frames=1,
                                 mode="auto", log=lambda _: None)
        r_i = render_progressive(s_inst, cam, params, max_frames=1,
                                 mode="auto", log=lambda _: None)
        # the instanced scene must route off the fast path; the plain twin
        # stays on it
        assert r_p.path == "fast"
        assert r_i.path in ("general", "compacted")
        # rotating a lambertian sphere about its center is a no-op: the two
        # renders are the same estimator up to integrator-variant noise
        mae = np.abs(r_p.image - r_i.image).mean()
        assert mae < 0.03, mae
        assert np.isfinite(r_i.image).all()

    def test_bvh_matches_brute_on_instanced_scene(self):
        from pathtrace_tpu.models import bvh as pbvh

        _, s_inst = self._scenes()
        feats = SceneFeatures.from_scene(s_inst)
        flat, stats, offsets = pbvh.build_scene_bvh(s_inst, seed=0)
        ro, rd, t = _rays(seed=5, origin=(0.0, 0.5, 2.0), spread=1.0)
        med_u = jnp.ones((ro.shape[0], max(s_inst.media.count, 1)))
        t_bvh, gid = pbvh.bvh_scene_nearest(
            flat, s_inst, ro, rd, t, med_u, features=feats, offsets=offsets)
        rec = isect.intersect_scene(s_inst, ro, rd, t, med_u, features=feats)
        # near-equal rather than bit-identical: the per-ray gathered-affine
        # einsum in the BVH leaf contracts in a different order than the
        # [N,3,3] broadcast einsum in sphere_nearest
        np.testing.assert_allclose(np.asarray(t_bvh), np.asarray(rec.t),
                                   rtol=1e-4, atol=1e-4)


class TestInstancedSilhouette:
    def test_silhouette_grads_all_skips_instanced_spheres(self):
        """Instanced spheres store object-space centers; the contour math
        reads world coordinates, so the boundary term must be skipped
        (not silently wrong) for them."""
        import jax

        from pathtrace_tpu.camera import make_camera
        from pathtrace_tpu.ops.silhouette import silhouette_grads_all

        xf = affine_from_rotation_y_translation(20.0, (0.3, 0.0, -1.0))
        s = _sphere_scene((0.0, 0.0, 0.0), 0.5, transform=xf)
        feats = SceneFeatures.from_scene(s)
        cam = make_camera((0.0, 0.0, 2.0), (0.0, 0.0, -1.0), (0.0, 1.0, 0.0),
                          60.0, 1.0, 0.0, 1.0)
        out = silhouette_grads_all(
            s, cam, 16, 16, jnp.ones((16, 16, 3)) / 768.0,
            jax.random.PRNGKey(1), max_depth=2, features=feats,
            n_samples=64,
        )
        assert "spheres.center" not in out
