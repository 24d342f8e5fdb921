"""Flag-combination routing: which render path + intersect provider runs.

Pins the r4 verdict's routing bug (`--pallas -B` in auto mode silently
dropped the requested BVH and rendered brute general) and documents the
intended semantics of every `--pallas` x `-B` x `--mode` combination via
``ProgressiveResult.path`` / ``.intersect``.
"""

import numpy as np
import pytest

from pathtrace_tpu.config import Params
from pathtrace_tpu.models import presets
from pathtrace_tpu.render.progressive import render_progressive


def _run(mode, use_pallas=False, use_bvh=False, frames=1):
    scene, cam = presets.small(aspect=1.0)
    params = Params(width=16, height=16, samples=2, max_depth=3)
    return render_progressive(
        scene, cam, params, max_frames=frames, mode=mode,
        use_pallas=use_pallas, use_bvh=use_bvh, log=lambda s: None,
    )


CASES = [
    # (mode, use_pallas, use_bvh) -> (path, intersect)
    ("auto", False, False, "fast", "pallas-sweep"),
    ("auto", True, False, "general", "pallas-sweep"),
    ("auto", False, True, "fast", "bvh"),
    # the r4 bug case: --pallas -B must still traverse the tree
    ("auto", True, True, "compacted", "bvh"),
    ("fast", False, False, "fast", "pallas-sweep"),
    ("fast", False, True, "fast", "bvh"),
    # --pallas is redundant (not conflicting) in explicit fast mode
    ("fast", True, True, "fast", "bvh"),
    ("general", False, False, "general", "xla-sweep"),
    ("general", False, True, "general", "bvh"),
    ("sharded", False, False, "sharded", "pallas-sweep"),
    ("sharded", False, True, "sharded", "bvh"),
]


class TestRouting:
    @pytest.mark.parametrize("mode,pal,bvh,path,intersect", CASES)
    def test_route(self, mode, pal, bvh, path, intersect):
        r = _run(mode, use_pallas=pal, use_bvh=bvh)
        assert (r.path, r.intersect) == (path, intersect)
        assert np.isfinite(r.image).all() and r.total_rays > 0

    def test_pallas_bvh_matches_explicit_compacted_bvh(self):
        # the recovered `--pallas -B` route must render the same program as
        # explicitly asking for the compacted ladder with the tree
        r_a = _run("auto", use_pallas=True, use_bvh=True)
        r_c = _run("compacted", use_bvh=True)
        assert r_c.path == "compacted" and r_c.intersect == "bvh"
        np.testing.assert_array_equal(r_a.image, r_c.image)

    def test_sharded_pallas_bvh_drops_tree_with_notice(self):
        # sharded mode has no general-path BVH provider; the combination
        # must say so rather than silently pretend — routing reports the
        # provider that actually ran
        msgs = []
        scene, cam = presets.small(aspect=1.0)
        params = Params(width=16, height=16, samples=2, max_depth=3)
        r = render_progressive(
            scene, cam, params, max_frames=1, mode="sharded",
            use_pallas=True, use_bvh=True, log=msgs.append,
        )
        assert r.path == "sharded" and r.intersect == "pallas-sweep"
        assert any("WITHOUT the tree" in m for m in msgs)
