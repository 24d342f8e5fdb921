"""Golden-image regression + statistical parity tests (SURVEY.md §4).

Two layers:
1. Determinism goldens: fixed-seed renders must reproduce stored statistics
   exactly (the analog of the reference's fixed-seed reproducibility,
   reference src/params.rs:21-27).
2. Estimator-parity: independent seeds / different execution paths
   (sharded vs local, BVH vs brute force, pallas vs jnp) must agree
   statistically (the -B metamorphic test, src/params.rs:36-43).
"""

import json
import os

import jax
import numpy as np
import pytest

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render.frame import render_frame
from pathtrace_tpu.utils.compare import assert_statistical_parity, compare_images

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def render(preset, w=64, h=48, spp=8, depth=8, seed=0, **kw):
    scene, cam = presets.from_name(preset, aspect=w / h, seed=0)
    feats = SceneFeatures.from_scene(scene)
    img, rays = render_frame(
        scene, cam, w, h, spp, depth, jax.random.PRNGKey(seed), features=feats, **kw
    )
    return np.asarray(img), int(rays)


GOLDEN_PRESETS = ["small", "two_perlin_spheres", "cornell", "simple_light"]


class TestDeterminismGoldens:
    @pytest.mark.parametrize("preset", GOLDEN_PRESETS)
    def test_matches_stored_statistics(self, preset):
        """Fixed-seed render statistics are stable across refactors."""
        path = os.path.join(GOLDEN_DIR, f"{preset}.json")
        img, rays = render(preset)
        stats = {
            "mean": [round(float(x), 5) for x in img.mean(axis=(0, 1))],
            "std": round(float(img.std()), 5),
            "ray_count": rays,
        }
        if not os.path.exists(path):
            os.makedirs(GOLDEN_DIR, exist_ok=True)
            with open(path, "w") as f:
                json.dump(stats, f, indent=1)
            pytest.skip(f"wrote new golden {path}")
        with open(path) as f:
            golden = json.load(f)
        # mean within small float slack (fused ops may reorder adds across
        # backends); ray_count is integer-exact for identical RNG streams
        np.testing.assert_allclose(stats["mean"], golden["mean"], atol=2e-3)
        assert abs(stats["ray_count"] - golden["ray_count"]) <= golden["ray_count"] * 0.002

    def test_same_seed_bitwise_identical(self):
        a, _ = render("small", seed=3)
        b, _ = render("small", seed=3)
        np.testing.assert_array_equal(a, b)


class TestEstimatorParity:
    def test_independent_seeds_agree_statistically(self):
        a, _ = render("small", spp=32, seed=1)
        b, _ = render("small", spp=32, seed=2)
        rep = assert_statistical_parity(a, b, mae_tol=0.02, bias_tol=0.004)
        assert rep.psnr_db > 25

    def test_bvh_matches_brute_force_image(self):
        from pathtrace_tpu.models import bvh as pbvh

        scene, cam = presets.small(aspect=4 / 3)
        feats = SceneFeatures.from_scene(scene)
        mn, mx = pbvh.sphere_aabbs(scene.spheres)
        flat, _ = pbvh.build_flat_bvh(mn, mx, mask=scene.spheres.mask, seed=0)
        key = jax.random.PRNGKey(5)
        img_bf, rays_bf = render_frame(
            scene, cam, 48, 36, 8, 8, key, features=feats
        )
        img_bvh, rays_bvh = render_frame(
            scene, cam, 48, 36, 8, 8, key, features=feats,
            sphere_nearest_fn=pbvh.make_bvh_sphere_nearest(flat),
        )
        # identical RNG stream + equivalent intersection: images should be
        # essentially identical (tiny f32 skew can flip rare dielectric coins)
        rep = compare_images(np.asarray(img_bf), np.asarray(img_bvh))
        assert rep.mean_abs_error < 5e-3
        assert abs(rays_bf - rays_bvh) <= max(rays_bf, 1) * 0.01

    @pytest.mark.parametrize("preset", ["small", "cornell", "cornell_smoke"])
    def test_scene_bvh_matches_brute_force_image(self, preset):
        """The whole-scene BVH (every primitive kind — spheres, rects,
        boxes, media) selects the same winners as the brute-force per-kind
        argmin: the -B metamorphic test over mixed-kind scenes
        (reference src/collision/bvh.rs:37-62, src/params.rs:36-43)."""
        from pathtrace_tpu.models import bvh as pbvh

        scene, cam = presets.from_name(preset, aspect=4 / 3, seed=0)
        feats = SceneFeatures.from_scene(scene)
        flat, stats, offsets = pbvh.build_scene_bvh(scene, seed=0,
                                                    use_native=False)
        assert stats.leaf_count > 0
        key = jax.random.PRNGKey(7)
        img_bf, rays_bf = render_frame(scene, cam, 48, 36, 4, 8, key,
                                       features=feats)
        img_bvh, rays_bvh = render_frame(
            scene, cam, 48, 36, 4, 8, key, features=feats,
            intersect_fn=pbvh.make_bvh_intersect_fn(flat, offsets, feats),
        )
        rep = compare_images(np.asarray(img_bf), np.asarray(img_bvh))
        assert rep.mean_abs_error < 5e-3
        assert abs(rays_bf - rays_bvh) <= max(rays_bf, 1) * 0.01

    def test_pallas_matches_jnp_image(self):
        from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas

        scene, cam = presets.small(aspect=4 / 3)
        feats = SceneFeatures.from_scene(scene)
        key = jax.random.PRNGKey(6)
        img_jnp, _ = render_frame(scene, cam, 32, 24, 4, 6, key, features=feats)
        img_pal, _ = render_frame(
            scene, cam, 32, 24, 4, 6, key, features=feats,
            sphere_nearest_fn=sphere_nearest_pallas,
        )
        rep = compare_images(np.asarray(img_jnp), np.asarray(img_pal))
        assert rep.mean_abs_error < 5e-3
