"""Wide-node BVH tests: traversal equivalence + the fast-path -B wiring.

The wide layout (parent-stored child boxes, multi-primitive sphere leaves)
shares the flat path's candidate math, so its winners must be BIT-identical
to ``bvh_scene_nearest`` on every scene class; and routed through the fused
fast path it must reproduce the brute fast path statistically (last-bit t
skew between the Pallas kernel's expanded quadratic and the traversal's
compact form can flip rare RNG coins, exactly like the flat-BVH-vs-brute
metamorphic test, reference src/params.rs:36-43).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models import bvh as pbvh
from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops import fastpath as fp


def _rays(R, seed=5):
    ro = np.asarray(jax.random.uniform(jax.random.PRNGKey(seed), (R, 3)))
    ro = jnp.asarray(ro * 24 - 12, jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (R, 3))
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jax.random.uniform(jax.random.PRNGKey(seed + 2), (R,))
    return ro, rd, tm


class TestWideTraversal:
    @pytest.mark.parametrize(
        "preset", ["random_spheres", "random", "cornell", "cornell_smoke",
                   "simple_light"]
    )
    def test_bit_matches_flat(self, preset):
        scene, _ = presets.from_name(preset, aspect=1.0, seed=0)
        feats = SceneFeatures.from_scene(scene)
        flat, _, offsets = pbvh.build_scene_bvh(scene, seed=0)
        wide = pbvh.widen_flat_bvh(flat, scene, offsets, features=feats)
        R = 2048
        ro, rd, tm = _rays(R)
        med_u = None
        if feats.has_media:
            med_u = jax.random.uniform(
                jax.random.PRNGKey(9), (R, scene.media.count)
            )
        t_f, i_f = pbvh.bvh_scene_nearest(
            flat, scene, ro, rd, tm, med_u, features=feats, offsets=offsets
        )
        t_w, i_w = pbvh.wide_scene_nearest(
            wide, scene, ro, rd, tm, med_u, features=feats, offsets=offsets
        )
        np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_w))
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_w))

    def test_collapses_nodes(self):
        scene, _ = presets.random_spheres(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        flat, _, offsets = pbvh.build_scene_bvh(scene, seed=0)
        wide = pbvh.widen_flat_bvh(flat, scene, offsets, features=feats)
        # all-sphere scene with leaf_m=8: ~4-8x fewer nodes than the flat tree
        assert wide.leaf_m == 8
        assert wide.n_nodes * 4 <= flat.n_nodes

    def test_sliced_bit_matches_plain(self):
        # R >= 32k engages straggler slicing in _run_traversal; per-lane
        # traversal is order-independent -> bit-identical to chunked plain
        scene, _ = presets.random_spheres(aspect=2.0)
        feats = SceneFeatures.from_scene(scene)
        wide, _, offsets = pbvh.build_scene_wide_bvh(scene, features=feats,
                                                     seed=0)
        R = 1 << 15
        ro, rd, tm = _rays(R, seed=11)
        t_sl, i_sl = pbvh.wide_scene_nearest(
            wide, scene, ro, rd, tm, None, features=feats, offsets=offsets
        )
        C = R // 4
        ts, is_ = [], []
        for k in range(4):
            s = slice(k * C, (k + 1) * C)
            t_c, i_c = pbvh.wide_scene_nearest(
                wide, scene, ro[s], rd[s], tm[s], None, features=feats,
                offsets=offsets,
            )
            ts.append(np.asarray(t_c))
            is_.append(np.asarray(i_c))
        np.testing.assert_array_equal(np.concatenate(ts), np.asarray(t_sl))
        np.testing.assert_array_equal(np.concatenate(is_), np.asarray(i_sl))


class TestFastPathBVH:
    @pytest.mark.parametrize(
        "preset", ["random_spheres", "simple_light", "cornell_smoke"]
    )
    def test_matches_brute_fast_path(self, preset):
        scene, cam = presets.from_name(preset, aspect=2.0, seed=0)
        feats = SceneFeatures.from_scene(scene)
        wide, _, offsets = pbvh.build_scene_wide_bvh(scene, features=feats,
                                                     seed=0)
        key = jax.random.PRNGKey(3)
        img_b, rays_b = fp.render_frame_fast(
            scene, cam, 64, 32, 2, 8, key, 12345, feats
        )
        img_v, rays_v = fp.render_frame_fast(
            scene, cam, 64, 32, 2, 8, key, 12345, feats,
            bvh=wide, bvh_offsets=offsets,
        )
        a, b = np.asarray(img_b), np.asarray(img_v)
        diff = np.abs(a - b)
        assert diff.mean() < 1e-3
        assert (diff < 1e-3).mean() > 0.98
        assert abs(int(rays_b) - int(rays_v)) <= max(int(rays_b), 1) * 0.01

    def test_interleaved_ladder_bit_exact_with_bvh(self, monkeypatch):
        """-B under the multi-chunk interleaved ladder (forced at test
        scale, with the bvh-mode eager-shrink knobs active) must be
        bit-identical to the uncompacted single-chunk trace."""
        scene, cam = presets.random_spheres(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        flat, _, offsets = pbvh.build_scene_bvh(scene, seed=0)
        ro, rd, tm = _rays(8192, seed=31)
        monkeypatch.setattr(fp, "INTERLEAVE_CHUNK", 2048)
        monkeypatch.setattr(fp, "BVH_COUNT_SKIP", 256)
        a, ca = fp.trace_fast(scene, ro, rd, tm, 5, 8, feats,
                              min_size=128, bvh=flat,
                              bvh_offsets=offsets)
        monkeypatch.setattr(fp, "INTERLEAVE_CHUNK", 1 << 20)
        b, cb = fp.trace_fast(scene, ro, rd, tm, 5, 8, feats,
                              compaction=False, bvh=flat,
                              bvh_offsets=offsets)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(ca) == int(cb)

    def test_compaction_bit_invariant(self):
        # compaction must not change the image on the BVH fast path either
        scene, cam = presets.random_spheres(aspect=2.0)
        feats = SceneFeatures.from_scene(scene)
        wide, _, offsets = pbvh.build_scene_wide_bvh(scene, features=feats,
                                                     seed=0)
        key = jax.random.PRNGKey(4)
        img_c, _ = fp.render_frame_fast(
            scene, cam, 64, 32, 2, 8, key, 777, feats,
            bvh=wide, bvh_offsets=offsets, min_size=128,
        )
        img_nc, _ = fp.render_frame_fast(
            scene, cam, 64, 32, 2, 8, key, 777, feats,
            bvh=wide, bvh_offsets=offsets, compaction=False,
        )
        np.testing.assert_array_equal(np.asarray(img_c), np.asarray(img_nc))

    def test_xla_shading_twin_matches_fused(self):
        # the XLA-shading bounce with bvh (image-texture scenes' -B path)
        # must agree with the fused Pallas shading bounce to ulp level:
        # identical traversal t + mirrored shading math (fusion order
        # differs, so ~1 ulp skew on a few lanes — same standard as
        # test_shade_pallas)
        scene, cam = presets.random_spheres(aspect=2.0)
        feats = SceneFeatures.from_scene(scene)
        wide, _, offsets = pbvh.build_scene_wide_bvh(scene, features=feats,
                                                     seed=0)
        R = 1024
        ro, rd, tm = _rays(R, seed=21)
        tables, sky, grad_sky = fp.prep_tables(scene, feats)
        seed_arr = jnp.asarray(99, jnp.int32)
        state = fp.FastState(
            ro=ro, rd=rd, time=tm,
            radiance=jnp.zeros((R, 3)), throughput=jnp.ones((R, 3)),
            alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
        )
        out_x = fp.fast_bounce(tables, sky, grad_sky, state, seed_arr,
                               jnp.int32(0), 8, feats, scene=scene,
                               bvh=wide, bvh_offsets=offsets)
        statep = fp.FastStateP(
            rox=ro[:, 0], roy=ro[:, 1], roz=ro[:, 2],
            rdx=rd[:, 0], rdy=rd[:, 1], rdz=rd[:, 2], time=tm,
            rad_r=jnp.zeros(R), rad_g=jnp.zeros(R), rad_b=jnp.zeros(R),
            thr_r=jnp.ones(R), thr_g=jnp.ones(R), thr_b=jnp.ones(R),
            alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
        )
        out_f = fp._fast_bounce_fused_prims(
            tables, sky, grad_sky, statep, seed_arr, jnp.int32(0), 8,
            feats, fp._scene_prims(scene, feats),
            bvh=wide, bvh_offsets=offsets,
        )
        np.testing.assert_allclose(
            np.asarray(out_x.radiance[:, 0]), np.asarray(out_f.rad_r),
            rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(out_x.ro[:, 0]), np.asarray(out_f.rox),
            rtol=1e-5, atol=1e-7,
        )
        assert (np.asarray(out_x.alive) == np.asarray(out_f.alive)).mean() \
            >= 0.999

    def test_image_scene_bvh_end_to_end(self):
        """-B on an image-texture scene (fused shading since r5): the BVH
        provider must match the brute fast path statistically end-to-end."""
        scene, cam = presets.from_name("earth", aspect=2.0, seed=0)
        feats = SceneFeatures.from_scene(scene)
        from pathtrace_tpu.ops.shade_pallas import fused_shade_supported

        assert fused_shade_supported(feats)  # image scenes go fused (r5)
        flat, _, offsets = pbvh.build_scene_bvh(scene, seed=0)
        key = jax.random.PRNGKey(8)
        img_b, rays_b = fp.render_frame_fast(
            scene, cam, 64, 32, 2, 6, key, 321, feats
        )
        img_v, rays_v = fp.render_frame_fast(
            scene, cam, 64, 32, 2, 6, key, 321, feats,
            bvh=flat, bvh_offsets=offsets,
        )
        diff = np.abs(np.asarray(img_b) - np.asarray(img_v))
        assert diff.mean() < 1e-3
        assert abs(int(rays_b) - int(rays_v)) <= max(int(rays_b), 1) * 0.01

    def test_sharded_bvh_bit_identical_to_single_device(self):
        """-B inside shard_map (trace_fast_device with the traversal as
        intersect provider): the 8-device mesh must be bit-identical to
        the 1-device mesh — lane-keyed RNG, no cross-shard state."""
        from pathtrace_tpu.parallel import mesh as pmesh

        scene, cam = presets.random_spheres(aspect=2.0)
        feats = SceneFeatures.from_scene(scene)
        flat, _, offsets = pbvh.build_scene_bvh(scene, seed=0)
        key = jax.random.PRNGKey(6)
        imgs = {}
        for n in (1, 8):
            mesh = pmesh.make_render_mesh(jax.devices()[:n])
            img, rays = pmesh.render_frame_sharded(
                scene, cam, 64, 32, 4, 6, key, mesh, features=feats,
                mode="fast", seed=42, bvh=flat, bvh_offsets=offsets,
            )
            imgs[n] = (np.asarray(img), int(rays))
        np.testing.assert_array_equal(imgs[1][0], imgs[8][0])
        assert imgs[1][1] == imgs[8][1]

    def test_progressive_routes_bvh_to_fast_path(self):
        # -B in auto mode rides the fast path now (VERDICT r3 item 1)
        from pathtrace_tpu.config import Params
        from pathtrace_tpu.render.progressive import render_progressive

        scene, cam = presets.random_spheres(aspect=2.0)
        params = Params(width=64, height=32, samples=2, max_depth=6, seed=0)
        logs = []
        res_bvh = render_progressive(
            scene, cam, params, max_frames=2, use_bvh=True,
            log=logs.append,
        )
        assert any("bvh stats" in line for line in logs)
        res_brute = render_progressive(
            scene, cam, params, max_frames=2, log=lambda s: None,
        )
        diff = np.abs(res_bvh.image - res_brute.image)
        assert diff.mean() < 1e-3
