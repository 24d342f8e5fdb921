"""Preset scene construction tests (reference presets.rs:24-37)."""

import numpy as np
import pytest

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneFeatures,
)

ALL = [
    "random", "random_spheres", "small", "smallpt", "cornell",
    "cornell_smoke", "two_perlin_spheres", "simple_light", "earth", "final",
]


class TestRegistry:
    def test_all_ten_presets_exist(self):
        # the 10 reference presets, plus TPU-extension stress fixtures
        assert set(ALL) <= set(presets.names())
        assert "random_spheres_xl" in presets.names()

    def test_unknown_returns_none(self):
        assert presets.from_name("nope", 1.0) is None

    @pytest.mark.parametrize("name", ALL)
    def test_builds(self, name):
        out = presets.from_name(name, 16 / 9)
        assert out is not None
        scene, cam = out
        assert scene.spheres.center.ndim == 2

    def test_deterministic(self):
        s1, _ = presets.random_spheres(1.0, seed=0)
        s2, _ = presets.random_spheres(1.0, seed=0)
        np.testing.assert_array_equal(s1.spheres.center, s2.spheres.center)
        s3, _ = presets.random_spheres(1.0, seed=1)
        assert not np.array_equal(s1.spheres.center, s3.spheres.center)


class TestRandomSpheres:
    def test_sphere_population(self):
        scene, _ = presets.random_spheres(1.0)
        n = int(scene.spheres.mask.sum())
        # ground + 22x22 grid + 3 big = 488-ish (all grid cells emit a sphere)
        assert n == 1 + 22 * 22 + 3
        kinds = scene.materials.kind[
            scene.spheres.mat_id[np.asarray(scene.spheres.mask)]
        ]
        # roughly 80/15/5 material split
        n_lam = (kinds == MAT_LAMBERTIAN).sum()
        n_met = (kinds == MAT_METAL).sum()
        n_die = (kinds == MAT_DIELECTRIC).sum()
        assert n_lam > n_met > n_die > 0

    def test_random_has_motion_but_random_spheres_does_not(self):
        s_moving, _ = presets.random(1.0)
        s_static, _ = presets.random_spheres(1.0)
        assert SceneFeatures.from_scene(s_moving).has_motion
        assert not SceneFeatures.from_scene(s_static).has_motion

    def test_padding_aligned_to_128(self):
        scene, _ = presets.random_spheres(1.0)
        assert scene.spheres.center.shape[0] % 128 == 0


class TestCornell:
    def test_geometry(self):
        scene, _ = presets.cornell(1.0)
        f = SceneFeatures.from_scene(scene)
        assert int(scene.rects.mask.sum()) == 6
        assert int(scene.boxes.mask.sum()) == 2
        assert f.has_light and not f.has_media
        # black constant sky
        np.testing.assert_array_equal(scene.sky, 0.0)
        assert float(scene.use_gradient_sky) == 0.0

    def test_smoke_has_media(self):
        scene, _ = presets.cornell_smoke(1.0)
        f = SceneFeatures.from_scene(scene)
        assert int(scene.media.mask.sum()) == 2
        assert f.has_media and f.has_isotropic


class TestFinalFull:
    def test_every_subsystem_present(self):
        # the completed 'Next Week' final scene (reference presets.rs:40-71
        # builds its materials then returns an empty world)
        scene, _ = presets.final_full(1.0)
        f = SceneFeatures.from_scene(scene)
        assert int(scene.boxes.mask.sum()) == 20 * 20      # ground field
        assert int(scene.rects.mask.sum()) == 1            # ceiling light
        assert int(scene.media.mask.sum()) == 2            # subsurface + haze
        # 1000-cluster + moving + glass + metal + boundary + earth + perlin
        assert int(scene.spheres.mask.sum()) == 1006
        for flag in ("has_spheres", "has_motion", "has_rects", "has_boxes",
                     "has_media", "has_noise", "has_image", "has_lambertian",
                     "has_metal", "has_dielectric", "has_light",
                     "has_isotropic"):
            assert getattr(f, flag), flag
        np.testing.assert_array_equal(scene.sky, 0.0)

    def test_deterministic(self):
        s1, _ = presets.final_full(1.0, seed=0)
        s2, _ = presets.final_full(1.0, seed=0)
        np.testing.assert_array_equal(s1.spheres.center, s2.spheres.center)
        np.testing.assert_array_equal(s1.boxes.p1, s2.boxes.p1)


class TestAras:
    def test_population_and_materials(self):
        # ToyPathTracer scene (reference presets.rs:595-851, shipped
        # commented-out): 46 spheres, no other primitive kinds
        scene, _ = presets.aras(1.0)
        f = SceneFeatures.from_scene(scene)
        assert int(scene.spheres.mask.sum()) == 46
        assert int(scene.rects.mask.sum()) == 0
        assert int(scene.boxes.mask.sum()) == 0
        for flag in ("has_spheres", "has_lambertian", "has_metal",
                     "has_dielectric", "has_light"):
            assert getattr(f, flag), flag
        assert not f.has_motion and not f.has_media


class TestHollowGlass:
    def test_small_has_negative_radius(self):
        scene, _ = presets.small(1.0)
        radii = np.asarray(scene.spheres.radius)[np.asarray(scene.spheres.mask)]
        assert (radii < 0).sum() == 1


class TestEarth:
    def test_has_image_atlas(self):
        scene, _ = presets.earth(1.0)
        f = SceneFeatures.from_scene(scene)
        assert f.has_image
        assert scene.atlas.data.shape[0] >= 256

    def test_user_supplied_png(self, tmp_path):
        """A user PNG feeds the earth texture (reference runtime image load,
        src/texture.rs:14-36) via --image / from_name(image_path=...)."""
        from pathtrace_tpu.render import film

        rgb = (np.arange(16 * 32 * 3).reshape(16, 32, 3) % 256).astype(np.uint8)
        path = tmp_path / "map.png"
        film.write_png(str(path), rgb)
        scene, _ = presets.from_name("earth", 1.0, image_path=str(path))
        atlas = np.asarray(scene.atlas.data)
        h = int(np.asarray(scene.atlas.height)[0])
        w = int(np.asarray(scene.atlas.width)[0])
        assert (h, w) == (16, 32)
        np.testing.assert_allclose(
            atlas[:16, :32], rgb.astype(np.float32) / 255.0, atol=1e-6
        )


class TestSimpleLight:
    def test_lights_and_black_sky(self):
        scene, _ = presets.simple_light(1.0)
        kinds = set(np.asarray(scene.materials.kind).tolist())
        assert MAT_DIFFUSE_LIGHT in kinds
        assert float(scene.use_gradient_sky) == 0.0
