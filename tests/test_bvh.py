"""BVH build + traversal tests.

Key property (SURVEY.md §4): BVH and brute force give identical nearest hits
— the reference's -B flag produces the same image either way
(reference src/params.rs:36-43), a free metamorphic test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models import bvh as pbvh
from pathtrace_tpu.models import presets
from pathtrace_tpu.ops import intersect as isect


@pytest.fixture(scope="module")
def sphere_scene():
    scene, _ = presets.random_spheres(aspect=1.0)
    return scene


@pytest.fixture(
    scope="module",
    params=["numpy", "native", "numpy-sah", "native-sah"],
)
def built(request, sphere_scene):
    mn, mx = pbvh.sphere_aabbs(sphere_scene.spheres)
    backend, _, strategy = request.param.partition("-")
    strategy = strategy or "median"
    if backend == "native":
        from pathtrace_tpu.utils.native import native_build_bvh

        ids = np.arange(mn.shape[0], dtype=np.int32)[
            np.asarray(sphere_scene.spheres.mask)
        ]
        out = native_build_bvh(mn, mx, ids, seed=1, strategy=strategy)
        if out is None:
            pytest.skip("native builder unavailable")
        return out
    return pbvh.build_flat_bvh(
        mn, mx, mask=sphere_scene.spheres.mask, seed=1, use_native=False,
        strategy=strategy,
    )


class TestBuild:
    def test_stats(self, built, sphere_scene):
        flat, stats = built
        n_prims = int(np.asarray(sphere_scene.spheres.mask).sum())
        assert stats.leaf_count == n_prims
        assert stats.node_count == 2 * n_prims - 1
        # median split is balanced (depth ~ log2(n) + 1); SAH may go a few
        # levels deeper where lopsided splits are cheaper, bounded by the
        # builders' depth-64 guard
        assert stats.max_depth <= 2 * int(np.ceil(np.log2(n_prims))) + 2

    def test_native_sah_matches_numpy_exactly(self, sphere_scene):
        """SAH is deterministic (no rng): the C++ builder must reproduce
        the numpy builder's tree node-for-node (same cost function, same
        stable sort keys, same first-minimum tie-breaking)."""
        from pathtrace_tpu.utils.native import native_build_bvh

        mn, mx = pbvh.sphere_aabbs(sphere_scene.spheres)
        ids = np.arange(mn.shape[0], dtype=np.int32)[
            np.asarray(sphere_scene.spheres.mask)
        ]
        nat = native_build_bvh(mn, mx, ids, seed=1, strategy="sah")
        if nat is None:
            pytest.skip("native builder unavailable")
        ref, _ = pbvh._build_numpy_sah(mn, mx, ids)
        np.testing.assert_array_equal(nat[0].prim, ref.prim)
        np.testing.assert_array_equal(nat[0].escape, ref.escape)
        np.testing.assert_array_equal(nat[0].bb_min, ref.bb_min)
        np.testing.assert_array_equal(nat[0].bb_max, ref.bb_max)

    def test_escape_indices_well_formed(self, built):
        flat, _ = built
        M = flat.n_nodes
        assert flat.escape.min() >= 1
        assert flat.escape.max() <= M
        # escape always advances
        assert np.all(flat.escape > np.arange(M))
        # leaves escape to the immediate next node
        leaves = flat.prim >= 0
        np.testing.assert_array_equal(
            flat.escape[leaves], np.arange(M)[leaves] + 1
        )

    def test_root_bbox_contains_all(self, built, sphere_scene):
        flat, _ = built
        mn, mx = pbvh.sphere_aabbs(sphere_scene.spheres)
        mask = np.asarray(sphere_scene.spheres.mask)
        assert np.all(flat.bb_min[0] <= mn[mask].min(axis=0) + 1e-5)
        assert np.all(flat.bb_max[0] >= mx[mask].max(axis=0) - 1e-5)

    def test_native_matches_numpy_shape(self, sphere_scene):
        from pathtrace_tpu.utils.native import native_build_bvh

        mn, mx = pbvh.sphere_aabbs(sphere_scene.spheres)
        ids = np.arange(mn.shape[0], dtype=np.int32)[
            np.asarray(sphere_scene.spheres.mask)
        ]
        nat = native_build_bvh(mn, mx, ids, seed=1)
        if nat is None:
            pytest.skip("native builder unavailable")
        ref, _ = pbvh.build_flat_bvh(mn, mx, mask=sphere_scene.spheres.mask,
                                     seed=1, use_native=False)
        assert nat[0].n_nodes == ref.n_nodes


class TestTraversalEquivalence:
    def test_matches_brute_force(self, built, sphere_scene):
        flat, _ = built
        R = 512
        key = jax.random.PRNGKey(0)
        ro = jax.random.uniform(key, (R, 3)) * 24 - 12
        d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
        rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tm = jnp.zeros(R)

        t_bf, i_bf = isect.sphere_nearest(
            sphere_scene.spheres, ro, rd, tm, has_motion=False
        )
        t_bvh, i_bvh = pbvh.bvh_sphere_nearest(
            flat, sphere_scene.spheres, ro, rd, tm, has_motion=False
        )
        t_bf, t_bvh = np.asarray(t_bf), np.asarray(t_bvh)
        hit_bf = t_bf < 1e30
        hit_bvh = t_bvh < 1e30
        np.testing.assert_array_equal(hit_bf, hit_bvh)
        # brute force expands the quadratic (|ro|^2 - 2 ro.c + |c|^2) while
        # the BVH leaf test uses (ro - c) directly: ~1e-3 relative f32 skew
        np.testing.assert_allclose(t_bf[hit_bf], t_bvh[hit_bvh], rtol=1e-3, atol=1e-4)
        # indices may differ only on exact ties; hit distances decide
        assert (np.asarray(i_bf)[hit_bf] == np.asarray(i_bvh)[hit_bf]).mean() > 0.999

    def test_sliced_traversal_bit_matches_plain(self):
        # R >= 32k engages the straggler-slicing phase (bulk fori +
        # unfinished-first partition + 8 slice loops); per-lane traversal is
        # order-independent, so it must be BIT-identical to the plain
        # while_loop path (engaged here by chunking the same rays below
        # the slicing threshold).
        from pathtrace_tpu.models.types import SceneFeatures

        scene, _ = presets.random_spheres(aspect=2.0)
        feats = SceneFeatures.from_scene(scene)
        flat, _, offsets = pbvh.build_scene_bvh(scene, seed=0)
        R = 1 << 15
        ro = jax.random.uniform(jax.random.PRNGKey(5), (R, 3)) * 24 - 12
        d = jax.random.normal(jax.random.PRNGKey(6), (R, 3))
        rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tm = jnp.zeros(R)

        t_sl, i_sl = pbvh.bvh_scene_nearest(
            flat, scene, ro, rd, tm, None, features=feats, offsets=offsets
        )
        C = R // 4  # 8k chunks take the plain path
        ts, is_ = [], []
        for k in range(4):
            s = slice(k * C, (k + 1) * C)
            t_c, i_c = pbvh.bvh_scene_nearest(
                flat, scene, ro[s], rd[s], tm[s], None, features=feats,
                offsets=offsets,
            )
            ts.append(np.asarray(t_c))
            is_.append(np.asarray(i_c))
        np.testing.assert_array_equal(np.concatenate(ts), np.asarray(t_sl))
        np.testing.assert_array_equal(np.concatenate(is_), np.asarray(i_sl))

    def test_moving_spheres(self):
        scene, _ = presets.random(aspect=1.0)  # motion-blurred variant
        mn, mx = pbvh.sphere_aabbs(scene.spheres)
        flat, _ = pbvh.build_flat_bvh(mn, mx, mask=scene.spheres.mask,
                                      seed=3, use_native=False)
        R = 256
        ro = jax.random.uniform(jax.random.PRNGKey(2), (R, 3)) * 24 - 12
        d = jax.random.normal(jax.random.PRNGKey(3), (R, 3))
        rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tm = jax.random.uniform(jax.random.PRNGKey(4), (R,))
        t_bf, _ = isect.sphere_nearest(scene.spheres, ro, rd, tm)
        t_bvh, _ = pbvh.bvh_sphere_nearest(flat, scene.spheres, ro, rd, tm)
        np.testing.assert_allclose(
            np.asarray(t_bf), np.asarray(t_bvh), rtol=1e-3, atol=1e-3
        )
