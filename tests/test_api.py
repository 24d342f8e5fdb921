"""Top-level library API (pathtrace_tpu.render / SceneBuilder re-exports)."""

import numpy as np
import pytest

import pathtrace_tpu as pt


class TestRender:
    def test_preset_render(self, tmp_path):
        out = str(tmp_path / "o.png")
        img = pt.render_image(preset="small", width=64, height=32, samples=2,
                        max_depth=6, out=out)
        assert img.shape == (32, 64, 3) and np.isfinite(img).all()
        assert img.max() > 0.1  # actually rendered something
        from pathtrace_tpu.render import film

        assert film.read_png(out).shape == (32, 64, 3)

    def test_custom_scene_render(self):
        b = pt.SceneBuilder()
        b.sphere((0.0, 0.0, -1.0), 0.5, b.lambertian_color((0.4, 0.8, 0.4)))
        cam = pt.make_camera((0.0, 1.0, 3.0), (0.0, 0.0, -1.0),
                             (0.0, 1.0, 0.0), 60.0, 2.0,
                             aperture=0.0, focus_dist=3.0)
        img = pt.render_image(scene=b.finish(), camera=cam, width=64, height=32,
                        samples=2, max_depth=4)
        assert img.shape == (32, 64, 3) and np.isfinite(img).all()

    def test_matches_cli_path_bit_exact(self):
        """The facade must be the same estimator as the progressive driver."""
        from pathtrace_tpu.config import Params
        from pathtrace_tpu.models import presets
        from pathtrace_tpu.render.progressive import render_progressive

        img_api = pt.render_image(preset="small", width=64, height=32, samples=2,
                            max_depth=6, seed=0)
        scene, cam = presets.from_name("small", aspect=2.0, seed=0)
        res = render_progressive(
            scene, cam, Params(width=64, height=32, samples=2, max_depth=6),
            max_frames=1, log=lambda _s: None,
        )
        np.testing.assert_array_equal(img_api, res.image)

    def test_arg_validation(self):
        with pytest.raises(ValueError):
            pt.render_image()
        with pytest.raises(ValueError):
            pt.render_image(preset="nope", width=8, height=8)
        b = pt.SceneBuilder()
        b.sphere((0.0, 0.0, -1.0), 0.5, b.lambertian_color((1.0, 0.0, 0.0)))
        with pytest.raises(ValueError):
            pt.render_image(scene=b.finish())

    def test_preset_names(self):
        names = pt.preset_names()
        assert "small" in names and "final_full" in names and "aras" in names
