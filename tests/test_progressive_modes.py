"""Progressive loop mode selection: auto must pick the fast path where
supported and produce statistically consistent results across modes."""

import numpy as np

from pathtrace_tpu.config import Params
from pathtrace_tpu.models import presets
from pathtrace_tpu.render.progressive import render_progressive
from pathtrace_tpu.utils.compare import assert_statistical_parity


class TestModes:
    def test_fast_and_general_agree(self):
        scene, cam = presets.small(aspect=1.0)
        params = Params(width=32, height=32, samples=8, max_depth=6)
        r_fast = render_progressive(
            scene, cam, params, max_frames=2, mode="fast", log=lambda s: None
        )
        r_gen = render_progressive(
            scene, cam, params, max_frames=2, mode="general", log=lambda s: None
        )
        assert_statistical_parity(r_fast.image, r_gen.image, mae_tol=0.04, bias_tol=0.01)
        assert r_fast.total_rays > 0 and r_gen.total_rays > 0

    def test_auto_uses_fast_for_supported_scene(self):
        # deterministic check: auto must equal explicit fast bit-for-bit
        scene, cam = presets.small(aspect=1.0)
        params = Params(width=16, height=16, samples=4, max_depth=4)
        r_auto = render_progressive(
            scene, cam, params, max_frames=1, mode="auto", log=lambda s: None
        )
        r_fast = render_progressive(
            scene, cam, params, max_frames=1, mode="fast", log=lambda s: None
        )
        np.testing.assert_array_equal(r_auto.image, r_fast.image)

    def test_sharded_agrees_with_fast(self):
        # 8-device CPU mesh (conftest); fused fast shards for this scene
        scene, cam = presets.small(aspect=1.0)
        params = Params(width=32, height=32, samples=8, max_depth=6)
        r_sh = render_progressive(
            scene, cam, params, max_frames=2, mode="sharded",
            log=lambda s: None,
        )
        r_fast = render_progressive(
            scene, cam, params, max_frames=2, mode="fast", log=lambda s: None
        )
        assert_statistical_parity(
            r_sh.image, r_fast.image, mae_tol=0.04, bias_tol=0.01
        )
        assert r_sh.total_rays > 0

    def test_earth_renders_under_auto(self):
        scene, cam = presets.earth(aspect=1.0)
        params = Params(width=16, height=16, samples=2, max_depth=3)
        r = render_progressive(
            scene, cam, params, max_frames=1, mode="auto", log=lambda s: None
        )
        assert np.isfinite(r.image).all()
        assert r.image.max() > 0
