"""Perlin noise and texture table tests (reference perlin.rs, texture.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models.build import SceneBuilder, make_perlin_tables
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops import perlin
from pathtrace_tpu.ops.texture import texture_value


class TestPerlin:
    def setup_method(self):
        self.tables = make_perlin_tables(np.random.default_rng(0))

    def test_tables_shapes(self):
        assert self.tables.randvec.shape == (256, 3)
        np.testing.assert_allclose(
            np.linalg.norm(self.tables.randvec, axis=-1), 1.0, atol=1e-5
        )
        for p in (self.tables.perm_x, self.tables.perm_y, self.tables.perm_z):
            assert sorted(p.tolist()) == list(range(256))

    def test_noise_range_and_continuity(self):
        p = jnp.asarray(np.random.default_rng(1).random((1000, 3)) * 20 - 10, jnp.float32)
        n = np.asarray(perlin.noise(self.tables, p))
        assert np.all(np.abs(n) <= 1.0 + 1e-5)
        # continuity: small perturbation -> small change
        n2 = np.asarray(perlin.noise(self.tables, p + 1e-4))
        assert np.abs(n - n2).max() < 1e-2

    def test_noise_zero_at_lattice_points(self):
        # gradient noise is exactly 0 at integer lattice points
        p = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [5.0, -3.0, 7.0]])
        n = np.asarray(perlin.noise(self.tables, p))
        np.testing.assert_allclose(n, 0.0, atol=1e-6)

    def test_turb_is_nonnegative(self):
        p = jnp.asarray(np.random.default_rng(2).random((100, 3)) * 10, jnp.float32)
        t = np.asarray(perlin.turb(self.tables, p))
        assert np.all(t >= 0.0)

    def test_noise_differentiable(self):
        import jax

        g = jax.grad(lambda p: perlin.noise(self.tables, p[None])[0])(
            jnp.asarray([0.37, 1.21, 2.93], jnp.float32)
        )
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.linalg.norm(np.asarray(g)) > 0.0


def _scene_with(fn):
    b = SceneBuilder()
    fn(b)
    return b.finish()


class TestTextures:
    def test_constant(self):
        def f(b):
            b.lambertian(b.constant_texture((0.2, 0.4, 0.6)))

        s = _scene_with(f)
        feats = SceneFeatures.from_scene(s)
        rgb = texture_value(
            s, jnp.asarray([0]), jnp.asarray([0.5]), jnp.asarray([0.5]),
            jnp.asarray([[0.0, 0.0, 0.0]]), features=feats,
        )
        np.testing.assert_allclose(np.asarray(rgb)[0], [0.2, 0.4, 0.6], atol=1e-6)

    def test_checker_selects_by_sines(self):
        def f(b):
            b.lambertian(
                b.checker_texture(
                    b.constant_texture((1.0, 0.0, 0.0)),  # odd (sines < 0)
                    b.constant_texture((0.0, 1.0, 0.0)),  # even
                )
            )

        s = _scene_with(f)
        feats = SceneFeatures.from_scene(s)
        # point where sin(10x)sin(10y)sin(10z) > 0: x=y=z=0.1 -> sin(1)^3 > 0
        p = jnp.asarray([[0.1, 0.1, 0.1], [-0.1, 0.1, 0.1]], jnp.float32)
        tid = jnp.asarray([2, 2])
        rgb = np.asarray(
            texture_value(s, tid, jnp.zeros(2), jnp.zeros(2), p, features=feats)
        )
        np.testing.assert_allclose(rgb[0], [0.0, 1.0, 0.0], atol=1e-6)  # even
        np.testing.assert_allclose(rgb[1], [1.0, 0.0, 0.0], atol=1e-6)  # odd

    def test_noise_marble_range(self):
        def f(b):
            b.lambertian(b.noise_texture(4.0))

        s = _scene_with(f)
        feats = SceneFeatures.from_scene(s)
        p = jnp.asarray(np.random.default_rng(0).random((200, 3)) * 10, jnp.float32)
        rgb = np.asarray(
            texture_value(s, jnp.zeros(200, jnp.int32), jnp.zeros(200),
                          jnp.zeros(200), p, features=feats)
        )
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        # all three channels identical (grayscale marble)
        np.testing.assert_allclose(rgb[:, 0], rgb[:, 1], atol=1e-6)

    def test_image_texture_lookup(self):
        img = np.zeros((2, 4, 3), np.float32)
        img[0, 0] = [1.0, 0.0, 0.0]   # top-left
        img[1, 3] = [0.0, 0.0, 1.0]   # bottom-right

        def f(b):
            b.lambertian(b.image_texture(img))

        s = _scene_with(f)
        feats = SceneFeatures.from_scene(s)
        # u=0,v=1 -> top-left; u~1,v~0 -> bottom-right
        # (v flipped per reference src/texture.rs:29)
        tid = jnp.asarray([0, 0])
        u = jnp.asarray([0.0, 0.99])
        v = jnp.asarray([0.99, 0.0])
        p = jnp.zeros((2, 3), jnp.float32)
        rgb = np.asarray(texture_value(s, tid, u, v, p, features=feats))
        np.testing.assert_allclose(rgb[0], [1.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(rgb[1], [0.0, 0.0, 1.0], atol=1e-6)


class TestCheckerNesting:
    """Checker children are full recursive textures (reference
    src/texture.rs:78-86): noise-under-checker and checker-of-checker
    resolve to features.checker_depth levels."""

    def test_features_derive_depth_and_child_kinds(self):
        def flat(b):
            b.lambertian(b.checker_texture(
                b.constant_texture((1, 0, 0)), b.constant_texture((0, 1, 0))))

        def deep(b):
            inner = b.checker_texture(
                b.constant_texture((1, 0, 0)), b.noise_texture(2.0))
            b.lambertian(b.checker_texture(inner, b.constant_texture((0, 0, 1))))

        f_flat = SceneFeatures.from_scene(_scene_with(flat))
        f_deep = SceneFeatures.from_scene(_scene_with(deep))
        assert f_flat.checker_depth == 1 and f_flat.checker_children_const
        assert f_deep.checker_depth == 2 and not f_deep.checker_children_const

    def test_checker_of_noise(self):
        ids = {}

        def f(b):
            ids["noise"] = b.noise_texture(3.0)
            ids["red"] = b.constant_texture((1.0, 0.0, 0.0))
            ids["chk"] = b.checker_texture(ids["noise"], ids["red"])
            b.lambertian(ids["chk"])

        s = _scene_with(f)
        feats = SceneFeatures.from_scene(s)
        p = jnp.asarray(np.random.default_rng(3).random((200, 3)) * 8, jnp.float32)
        n = p.shape[0]
        z = jnp.zeros(n)
        chk = np.asarray(texture_value(
            s, jnp.full(n, ids["chk"], jnp.int32), z, z, p, features=feats))
        noise = np.asarray(texture_value(
            s, jnp.full(n, ids["noise"], jnp.int32), z, z, p, features=feats))
        sines = np.sin(10 * np.asarray(p)).prod(axis=-1)
        want = np.where((sines < 0)[:, None], noise, [[1.0, 0.0, 0.0]])
        np.testing.assert_allclose(chk, want, atol=1e-6)

    def test_checker_of_checker(self):
        ids = {}

        def f(b):
            ids["r"] = b.constant_texture((1.0, 0.0, 0.0))
            ids["g"] = b.constant_texture((0.0, 1.0, 0.0))
            ids["b"] = b.constant_texture((0.0, 0.0, 1.0))
            ids["inner"] = b.checker_texture(ids["r"], ids["g"])
            ids["outer"] = b.checker_texture(ids["inner"], ids["b"])
            b.lambertian(ids["outer"])

        s = _scene_with(f)
        feats = SceneFeatures.from_scene(s)
        assert feats.checker_depth == 2
        p = jnp.asarray(np.random.default_rng(4).random((300, 3)) * 6 - 3,
                        jnp.float32)
        n = p.shape[0]
        z = jnp.zeros(n)
        out = np.asarray(texture_value(
            s, jnp.full(n, ids["outer"], jnp.int32), z, z, p, features=feats))
        sines = np.sin(10 * np.asarray(p)).prod(axis=-1)
        neg = sines < 0
        inner = np.where(neg[:, None], [[1.0, 0, 0]], [[0, 1.0, 0]])
        want = np.where(neg[:, None], inner, [[0, 0, 1.0]])
        np.testing.assert_allclose(out, want, atol=1e-6)

    def test_deep_checker_scene_routes_to_general_and_renders(self):
        from pathtrace_tpu.config import Params
        from pathtrace_tpu.ops.fastpath import fastpath_supported
        from pathtrace_tpu.render.progressive import render_progressive

        def f(b):
            chk = b.checker_texture(
                b.noise_texture(2.0), b.constant_texture((0.9, 0.1, 0.1)))
            b.sphere((0.0, 0.0, -1.0), 0.5, b.lambertian(chk))
            b.sphere((0.0, -100.5, -1.0), 100.0,
                     b.lambertian_color((0.5, 0.5, 0.5)))

        s = _scene_with(f)
        feats = SceneFeatures.from_scene(s)
        assert not fastpath_supported(feats, s)

        from pathtrace_tpu.camera import make_camera

        cam = make_camera(
            lookfrom=(0.0, 0.0, 1.0), lookat=(0.0, 0.0, -1.0),
            vup=(0.0, 1.0, 0.0), vfov_degrees=60.0, aspect=1.0,
            aperture=0.0, focus_dist=1.0,
        )
        r = render_progressive(
            s, cam, Params(width=16, height=16, samples=2, max_depth=3),
            max_frames=1, mode="auto", log=lambda _:None,
        )
        assert r.path in ("general", "compacted")
        assert np.isfinite(r.image).all() and r.image.max() > 0
