"""Latin-hypercube in-pixel stratification (--stratify).

Beyond-reference estimator upgrade: the reference only does uniform jitter
(src/scene.rs:107-108). LHS must (a) place exactly one sample per 1/S
stratum on each axis, (b) stay unbiased (agree with the uniform estimator
statistically), (c) reduce variance on smooth integrands.
"""

import jax
import numpy as np
import pytest

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render.frame import pixel_jitter, render_frame


class TestJitter:
    def test_one_sample_per_stratum_each_axis(self):
        h, w, s = 3, 5, 8
        j = np.asarray(pixel_jitter(jax.random.PRNGKey(0), h, w, s, True))
        assert j.shape == (h, w, s, 2)
        assert (0.0 <= j).all() and (j < 1.0).all()
        strata = np.floor(j * s).astype(int)  # [h, w, s, 2]
        want = np.arange(s)
        for axis in range(2):
            occupied = np.sort(strata[..., axis], axis=-1)
            np.testing.assert_array_equal(
                occupied, np.broadcast_to(want, (h, w, s))
            )

    def test_axes_permuted_independently(self):
        j = np.asarray(pixel_jitter(jax.random.PRNGKey(1), 4, 4, 16, True))
        sx = np.floor(j[..., 0] * 16)
        sy = np.floor(j[..., 1] * 16)
        assert not np.array_equal(sx, sy)

    def test_uniform_path_unchanged(self):
        k = jax.random.PRNGKey(2)
        a = np.asarray(pixel_jitter(k, 2, 2, 4, False))
        b = np.asarray(jax.random.uniform(k, (2, 2, 4, 2)))
        np.testing.assert_array_equal(a, b)

    def test_single_sample_degenerates_to_uniform(self):
        k = jax.random.PRNGKey(3)
        a = np.asarray(pixel_jitter(k, 2, 2, 1, True))
        b = np.asarray(pixel_jitter(k, 2, 2, 1, False))
        np.testing.assert_array_equal(a, b)


def _render(stratify, seed, spp=16):
    scene, cam = presets.small(aspect=2.0)
    feats = SceneFeatures.from_scene(scene)
    img, _ = render_frame(
        scene, cam, 48, 24, spp, 6, jax.random.PRNGKey(seed),
        features=feats, stratify=stratify,
    )
    return np.asarray(img)


class TestEstimator:
    def test_unbiased_vs_uniform(self):
        a = np.mean([_render(True, s) for s in range(4)], axis=0)
        b = np.mean([_render(False, 100 + s) for s in range(4)], axis=0)
        # independent estimators of the same integral
        assert abs(a.mean() - b.mean()) < 0.01
        assert np.abs(a - b).mean() < 0.03

    def test_variance_reduction_on_smooth_footprint(self):
        """Where pixel variance is footprint-limited (pure sky gradient, no
        path-space randomness), LHS on the film axes must cut the noise
        hard — stratified 1D integration of a smooth integrand converges
        ~O(1/S^3) in variance vs Monte Carlo's O(1/S)."""
        from pathtrace_tpu.camera import make_camera
        from pathtrace_tpu.models.build import SceneBuilder

        b = SceneBuilder()
        # one sphere far behind the camera: every film ray escapes to sky
        b.sphere((0.0, 0.0, 1e6), 1.0, b.lambertian_color((0.5, 0.5, 0.5)))
        scene = b.finish()
        feats = SceneFeatures.from_scene(scene)
        cam = make_camera((0.0, 0.0, 0.0), (0.0, 0.3, -1.0),
                          (0.0, 1.0, 0.0), 60.0, 2.0,
                          aperture=0.0, focus_dist=1.0)

        def sky_render(stratify, seed):
            img, _ = render_frame(
                scene, cam, 32, 16, 8, 4, jax.random.PRNGKey(seed),
                features=feats, stratify=stratify,
            )
            return np.asarray(img)

        strat = np.stack([sky_render(True, s) for s in range(6)])
        unif = np.stack([sky_render(False, 100 + s) for s in range(6)])
        v_strat = strat.std(axis=0).mean()
        v_unif = unif.std(axis=0).mean()
        assert v_strat < 0.5 * v_unif, (v_strat, v_unif)


class TestFastPathWiring:
    def test_fast_path_accepts_stratify(self):
        from pathtrace_tpu.ops.fastpath import render_frame_fast

        scene, cam = presets.small(aspect=2.0)
        feats = SceneFeatures.from_scene(scene)
        img, _ = render_frame_fast(
            scene, cam, 48, 24, 4, 6, jax.random.PRNGKey(0), 0, feats,
            stratify=True,
        )
        img = np.asarray(img)
        assert img.shape == (24, 48, 3) and np.isfinite(img).all()
