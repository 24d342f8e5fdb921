"""Russian-roulette path termination (--rr).

Unbiasedness is the whole contract: survival probability p = max
throughput channel, survivors divided by p; means must match the plain
estimator while deep-path ray counts drop.
"""

import jax
import numpy as np

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render.frame import render_frame


def _render(rr, seed, preset="cornell", spp=8, depth=16):
    scene, cam = presets.from_name(preset, aspect=1.0, seed=0)
    feats = SceneFeatures.from_scene(scene)
    img, rays = render_frame(
        scene, cam, 32, 32, spp, depth, jax.random.PRNGKey(seed),
        features=feats, rr_start=rr,
    )
    return np.asarray(img), int(rays)


class TestRussianRoulette:
    def test_kills_deep_paths(self):
        _, r_rr = _render(3, 0)
        _, r_plain = _render(0, 0)
        assert r_rr < 0.8 * r_plain, (r_rr, r_plain)

    def test_unbiased_same_mean(self):
        a = np.mean([_render(3, s)[0] for s in range(6)], axis=0)
        b = np.mean([_render(0, 100 + s)[0] for s in range(6)], axis=0)
        assert abs(float(a.mean()) - float(b.mean())) < 0.03, (
            a.mean(), b.mean()
        )

    def test_off_by_default_bit_identical(self):
        a, ra = _render(0, 5, preset="small", depth=8)
        scene, cam = presets.small(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        b, rb = (lambda t: (np.asarray(t[0]), int(t[1])))(render_frame(
            scene, cam, 32, 32, 8, 8, jax.random.PRNGKey(5), features=feats,
        ))
        np.testing.assert_array_equal(a, b)
        assert ra == rb

    def test_diff_path_smoke(self):
        import dataclasses

        import jax.numpy as jnp

        from pathtrace_tpu.camera import get_rays
        from pathtrace_tpu.render import integrator

        scene, cam = presets.cornell(aspect=1.0)
        feats = SceneFeatures.from_scene(scene)
        key = jax.random.PRNGKey(0)
        n = 256
        s = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
        t = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
        u = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
        ro, rd, tm = get_rays(cam, s, t, u)

        def loss(colors):
            sc = dataclasses.replace(
                scene, textures=dataclasses.replace(
                    scene.textures, color=colors))
            rad, _ = integrator.trace_diff(
                sc, ro, rd, tm, key, 8, features=feats, rr_start=2
            )
            return jnp.sum(rad) / n

        g = np.asarray(jax.grad(loss)(jnp.asarray(scene.textures.color)))
        assert np.isfinite(g).all() and np.abs(g).max() > 0
