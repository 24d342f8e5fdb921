"""Pallas sphere kernel vs the jnp reference (interpret mode on CPU).

The reference validated its SIMD kernels by benching scalar/SSE4.1/AVX2
variants against each other (reference spheres_soa.rs:464-485); here the
Pallas kernel is checked against the jnp brute force exactly
(SURVEY.md §4: interpret-mode kernel tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models import presets
from pathtrace_tpu.ops.intersect import sphere_nearest
from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas


def random_rays(n, seed=0, spread=20.0):
    ro = jax.random.uniform(jax.random.PRNGKey(seed), (n, 3)) * spread - spread / 2
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3))
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return ro, rd


class TestStaticKernel:
    def test_matches_jnp_on_cover_scene(self):
        scene, _ = presets.random_spheres(aspect=1.0)
        ro, rd = random_rays(512)
        tm = jnp.zeros(512)
        t_ref, i_ref = sphere_nearest(scene.spheres, ro, rd, tm, has_motion=False)
        t_pal, i_pal = sphere_nearest_pallas(scene.spheres, ro, rd, tm, has_motion=False)
        t_ref, t_pal = np.asarray(t_ref), np.asarray(t_pal)
        hit = t_ref < 1e30
        np.testing.assert_array_equal(hit, np.asarray(t_pal) < 1e30)
        np.testing.assert_allclose(t_ref[hit], t_pal[hit], rtol=1e-3, atol=1e-4)
        assert (np.asarray(i_ref) == np.asarray(i_pal))[hit].mean() > 0.999

    def test_ragged_ray_count(self):
        # R not a multiple of the 256-ray tile: padding path
        scene, _ = presets.small(aspect=1.0)
        ro, rd = random_rays(100, seed=7, spread=6.0)
        tm = jnp.zeros(100)
        t_ref, _ = sphere_nearest(scene.spheres, ro, rd, tm, has_motion=False)
        t_pal, _ = sphere_nearest_pallas(scene.spheres, ro, rd, tm, has_motion=False)
        np.testing.assert_allclose(
            np.asarray(t_ref), np.asarray(t_pal), rtol=1e-3, atol=1e-4
        )


class TestMovingKernel:
    def test_matches_jnp_with_motion(self):
        scene, _ = presets.random(aspect=1.0)
        ro, rd = random_rays(256, seed=3)
        tm = jax.random.uniform(jax.random.PRNGKey(9), (256,))
        t_ref, i_ref = sphere_nearest(scene.spheres, ro, rd, tm, has_motion=True)
        t_pal, i_pal = sphere_nearest_pallas(scene.spheres, ro, rd, tm, has_motion=True)
        t_ref, t_pal = np.asarray(t_ref), np.asarray(t_pal)
        hit = t_ref < 1e30
        np.testing.assert_array_equal(hit, np.asarray(t_pal) < 1e30)
        np.testing.assert_allclose(t_ref[hit], t_pal[hit], rtol=1e-3, atol=1e-3)


class TestKernelGradients:
    def test_custom_vjp_matches_jnp_grad(self):
        scene, _ = presets.small(aspect=1.0)
        ro, rd = random_rays(64, seed=5, spread=6.0)
        tm = jnp.zeros(64)

        def loss_pal(spheres):
            t, _ = sphere_nearest_pallas(spheres, ro, rd, tm, has_motion=False)
            return jnp.sum(jnp.where(t < 1e30, t, 0.0))

        def loss_ref(spheres):
            t, _ = sphere_nearest(spheres, ro, rd, tm, has_motion=False)
            return jnp.sum(jnp.where(t < 1e30, t, 0.0))

        g_pal = jax.grad(loss_pal, allow_int=True)(scene.spheres)
        g_ref = jax.grad(loss_ref, allow_int=True)(scene.spheres)
        np.testing.assert_allclose(
            np.asarray(g_pal.center), np.asarray(g_ref.center), rtol=1e-2, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(g_pal.radius), np.asarray(g_ref.radius), rtol=1e-2, atol=1e-3
        )


class TestCulledKernel:
    """The per-tile AABB cull must be invisible: bit-identical (t, idx)."""

    def test_cull_bit_identical_scattered(self):
        from pathtrace_tpu.ops.intersect_pallas import (
            sphere_nearest_pallas_cols,
        )

        scene, _ = presets.random_spheres(aspect=1.0)
        sph = scene.spheres
        ro, rd = random_rays(2048, seed=11, spread=24.0)
        tm = jnp.zeros(2048)

        def run(cull):
            return sphere_nearest_pallas_cols(
                sph, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tm,
                has_motion=False, cull=cull,
            )

        t0, i0 = run(False)
        t1, i1 = run(True)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_cull_bit_identical_axis_parallel(self):
        # axis-parallel rays exercise the conservative slab-interval logic
        from pathtrace_tpu.ops.intersect_pallas import (
            sphere_nearest_pallas_cols,
        )

        scene, _ = presets.random_spheres(aspect=1.0)
        sph = scene.spheres
        n = 512
        ro = jax.random.uniform(jax.random.PRNGKey(3), (n, 3)) * 22 - 11
        axis = np.arange(n) % 3
        sign = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
        rd = np.zeros((n, 3), np.float32)
        rd[np.arange(n), axis] = sign
        rd = jnp.asarray(rd)
        tm = jnp.zeros(n)

        def run(cull):
            return sphere_nearest_pallas_cols(
                sph, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tm,
                has_motion=False, cull=cull,
            )

        t0, i0 = run(False)
        t1, i1 = run(True)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


class TestHierCulledKernel:
    """The 2-level supertile cull must also be invisible: bit-identical."""

    def _run_pair(self, ro, rd, s_tiles):
        from pathtrace_tpu.ops.intersect_pallas import (
            sphere_nearest_pallas_cols,
        )

        scene, _ = presets.random_spheres(aspect=1.0)
        sph = scene.spheres
        tm = jnp.zeros(ro.shape[0])

        def run(cull):
            return sphere_nearest_pallas_cols(
                sph, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tm,
                has_motion=False, cull=cull, s_tiles=s_tiles,
            )

        t0, i0 = run(False)
        t1, i1 = run("hier")
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_hier_bit_identical_scattered(self):
        ro, rd = random_rays(2048, seed=17, spread=24.0)
        self._run_pair(ro, rd, s_tiles=2)

    def test_hier_bit_identical_uneven_supertile(self):
        # 488 spheres -> 4 tiles; s_tiles=3 forces padded member tiles
        # inside a partially-empty supertile
        ro, rd = random_rays(1024, seed=19, spread=18.0)
        self._run_pair(ro, rd, s_tiles=3)

    def test_hier_bit_identical_axis_parallel(self):
        n = 512
        ro = jax.random.uniform(jax.random.PRNGKey(5), (n, 3)) * 22 - 11
        axis = np.arange(n) % 3
        sign = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
        rd = np.zeros((n, 3), np.float32)
        rd[np.arange(n), axis] = sign
        self._run_pair(ro, jnp.asarray(rd), s_tiles=2)


class TestBigSceneHierKernel:
    def test_hier_bit_identical_big_scene(self):
        """Hier cull on a synthetic 4096-sphere grid (32 tiles, 16
        supertiles at s_tiles=2) — the scale the small-preset tests
        don't reach."""
        import dataclasses

        from pathtrace_tpu.ops.intersect_pallas import (
            sphere_nearest_pallas_cols,
        )

        rng = np.random.default_rng(23)
        n = 4096
        g = np.stack(np.meshgrid(np.arange(16), np.arange(16),
                                 np.arange(16)), -1).reshape(-1, 3)[:n]
        centers = (g * 2.0 + rng.normal(0, 0.2, (n, 3))).astype(np.float32)
        scene, _ = presets.small(aspect=1.0)
        sph = dataclasses.replace(
            scene.spheres,
            center=jnp.asarray(centers),
            center_delta=jnp.zeros((n, 3), jnp.float32),
            time0=jnp.zeros(n, jnp.float32),
            inv_time_delta=jnp.zeros(n, jnp.float32),
            radius=jnp.full(n, 0.6, jnp.float32),
            mat_id=jnp.zeros(n, jnp.int32),
            mask=jnp.ones(n, bool),
        )
        ro = jnp.asarray(
            rng.uniform(-4, 36, (4096, 3)).astype(np.float32))
        rd = rng.normal(size=(4096, 3)).astype(np.float32)
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        rd = jnp.asarray(rd)
        tm = jnp.zeros(4096)

        def run(cull):
            return sphere_nearest_pallas_cols(
                sph, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tm,
                has_motion=False, cull=cull, s_tiles=2,
            )

        t0, i0 = run(False)
        t1, i1 = run("hier")
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
