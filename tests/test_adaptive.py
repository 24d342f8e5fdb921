"""Adaptive sampling (render/adaptive.py)."""

import jax
import numpy as np

from pathtrace_tpu.config import Params
from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render.adaptive import render_adaptive
from pathtrace_tpu.render.frame import render_frame


def _uniform(scene, cam, w, h, spp, depth, seed=0, feats=None):
    img, rays = render_frame(scene, cam, w, h, spp, depth,
                             jax.random.PRNGKey(seed), features=feats)
    return np.asarray(img), int(rays)


class TestAdaptive:
    def test_budget_and_allocation(self):
        scene, cam = presets.cornell(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        p = Params(width=32, height=32, samples=2, max_depth=6)
        img, rays, spp = render_adaptive(scene, cam, p, 12, features=feats,
                                         log=lambda _s: None)
        assert img.shape == (32, 32, 3) and np.isfinite(img).all()
        # every pixel got the warmup; the hot set got strictly more
        assert spp.min() >= 4
        assert spp.max() > spp.min()
        assert abs(spp.mean() - 12) < 3  # ~the requested average budget

    def test_matches_uniform_statistically(self):
        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        p = Params(width=32, height=32, samples=4, max_depth=8)
        img_a, _, _ = render_adaptive(scene, cam, p, 24, features=feats,
                                      log=lambda _s: None)
        img_u, _ = _uniform(scene, cam, 32, 32, 24, 8, seed=7, feats=feats)
        # two independent unbiased estimators of the same integral
        assert abs(float(img_a.mean()) - float(img_u.mean())) < 0.02
        assert np.abs(img_a - img_u).mean() < 0.05

    def test_lower_error_than_uniform_at_equal_budget(self):
        """On cornell, noise concentrates (light edge, shadows): adaptive
        must beat uniform at the same total sample budget."""
        scene, cam = presets.cornell(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        ref, _ = _uniform(scene, cam, 32, 32, 192, 6, seed=999, feats=feats)

        p = Params(width=32, height=32, samples=2, max_depth=6)
        errs_a, errs_u = [], []
        for seed in range(3):
            p2 = Params(width=32, height=32, samples=2, max_depth=6,
                        seed=seed)
            # mode="general": the uniform comparator renders on the general
            # integrator, so the allocation-beats-uniform claim must hold
            # integrator-for-integrator (the fast-path twin is covered by
            # TestAdaptiveFastPath)
            img_a, _, _ = render_adaptive(scene, cam, p2, 16, features=feats,
                                          mode="general", log=lambda _s: None)
            img_u, _ = _uniform(scene, cam, 32, 32, 16, 6, seed=100 + seed,
                                feats=feats)
            errs_a.append(((img_a - ref) ** 2).mean())
            errs_u.append(((img_u - ref) ** 2).mean())
        assert np.mean(errs_a) < np.mean(errs_u), (errs_a, errs_u)


class TestAdaptiveFastPath:
    def test_fast_matches_general_statistically(self):
        import jax

        from pathtrace_tpu.config import Params
        from pathtrace_tpu.models import presets
        from pathtrace_tpu.render.adaptive import render_adaptive

        scene, cam = presets.small(aspect=1.0)
        params = Params(width=24, height=24, samples=2, max_depth=4)
        img_f, rays_f, spp_f = render_adaptive(
            scene, cam, params, budget_spp=8, mode="auto",
            log=lambda s: None,
        )
        img_g, rays_g, spp_g = render_adaptive(
            scene, cam, params, budget_spp=8, mode="general",
            log=lambda s: None,
        )
        assert rays_f > 0 and rays_g > 0
        # same allocation budget; estimators agree in the mean
        assert abs(spp_f.mean() - spp_g.mean()) < 1e-6
        assert abs(float(img_f.mean()) - float(img_g.mean())) < 0.03
        import numpy as np

        assert np.isfinite(img_f).all()
