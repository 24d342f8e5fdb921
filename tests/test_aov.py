"""First-hit AOV buffers (normals/albedo/depth) — render/aov.py."""

import jax
import numpy as np

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render.aov import render_aovs


def aovs(preset="small", w=64, h=32, samples=2):
    scene, cam = presets.from_name(preset, aspect=w / h, seed=0)
    feats = SceneFeatures.from_scene(scene)
    out = render_aovs(scene, cam, w, h, jax.random.PRNGKey(0),
                      features=feats, samples=samples)
    return {k: np.asarray(v) for k, v in out.items()}, scene


class TestAOV:
    def test_shapes_and_ranges(self):
        a, _ = aovs()
        assert a["normal"].shape == (32, 64, 3)
        assert a["albedo"].shape == (32, 64, 3)
        assert a["depth"].shape == (32, 64)
        assert a["hit"].shape == (32, 64)
        assert np.isfinite(a["normal"]).all() and np.isfinite(a["depth"]).all()
        assert (a["hit"] >= 0).all() and (a["hit"] <= 1).all()

    def test_ground_coverage_and_normals(self):
        # small's camera ((3,3,2) -> (0,0,-1), vfov 20) looks down: every
        # primary hits geometry, and the bottom rows are mostly ground
        a, _ = aovs()
        assert a["hit"].mean() > 0.95
        assert a["normal"][:4, :, 1].mean() > 0.6
        d = a["depth"][a["hit"] > 0.5]
        assert (d > 0).all() and d.max() > d.min()

    def test_albedo_is_surface_color_not_lighting(self):
        a, _ = aovs(preset="cornell", w=48, h=48)
        # mid-image left column = green wall regardless of illumination
        left = a["albedo"][20:28, 1:4]
        assert left[..., 1].mean() > 2.0 * left[..., 0].mean()

    def test_sky_albedo_where_no_hit(self):
        # aras camera pitches -33 deg with fov 60: the top rows clear the
        # ground-ball horizon and miss to the gradient sky
        a, _ = aovs(preset="aras", w=64, h=36)
        top_hit = a["hit"][-2:]
        assert (top_hit < 0.5).mean() > 0.5
        top = a["albedo"][-2:][top_hit < 0.5]
        assert top[..., 2].mean() >= top[..., 0].mean()

    def test_save_pngs(self, tmp_path):
        from pathtrace_tpu.render.aov import save_aov_pngs
        from pathtrace_tpu.render import film

        a, _ = aovs()
        prefix = str(tmp_path / "x")
        save_aov_pngs(a, prefix)
        for suffix in (".normal.png", ".albedo.png", ".depth.png"):
            img = film.read_png(prefix + suffix)
            assert img.shape == (32, 64, 3)
