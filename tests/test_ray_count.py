"""Segment-counter overflow safety (reference's usize counter never wraps,
src/scene.rs:21; device counts here ride int32 and must be summed wider).

DeviceRayCount keeps per-chunk device int32 scalars separate and sums them
host-side in python ints, so a huge-spp offline frame (1280x720 @ 1024 spp
is ~10B segments) cannot silently wrap the way a device-side int32
accumulation across chunks would.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.ops import fastpath


class TestDeviceRayCount:
    def test_sum_past_int32(self):
        # 8 parts of 2^30 segments = 2^33 total: > int32 by 4x
        parts = [jnp.int32(2**30)] * 8
        total = fastpath.DeviceRayCount(parts)
        assert int(total) == 2**33

    def test_add_compose(self):
        a = fastpath.DeviceRayCount([jnp.int32(3)])
        b = fastpath.DeviceRayCount([jnp.int32(4)])
        assert int(a + b) == 7
        assert int(0 + a) == 3          # sum() seeding
        assert int(a + jnp.int32(5)) == 8  # scalar append
        assert int(fastpath.DeviceRayCount([])) == 0

    def test_trace_fast_rejects_wrapping_call(self):
        scene, cam = presets.from_name("small", 1.0)
        feats = SceneFeatures.from_scene(scene)
        ro = jnp.zeros((1024, 3))
        rd = jnp.zeros((1024, 3)).at[:, 2].set(1.0)
        tm = jnp.zeros(1024)
        try:
            fastpath.trace_fast(scene, ro, rd, tm, 0, 2**31, feats)
        except AssertionError as e:
            assert "int32 segment counter" in str(e)
        else:
            raise AssertionError("expected the overflow guard to fire")


class TestChunkedFrameCount:
    def test_chunked_frame_matches_unchunked(self, monkeypatch):
        """Chunking must not change the image or the total count, and the
        chunked count arrives as a DeviceRayCount."""
        scene, cam = presets.from_name("small", 2.0)
        feats = SceneFeatures.from_scene(scene)
        key = jax.random.PRNGKey(7)

        img_a, cnt_a = fastpath.render_frame_fast(
            scene, cam, 64, 32, 2, 6, key, 11, feats
        )
        monkeypatch.setattr(fastpath, "frame_chunk", lambda f: 1024)
        img_b, cnt_b = fastpath.render_frame_fast(
            scene, cam, 64, 32, 2, 6, key, 11, feats
        )
        assert isinstance(cnt_b, fastpath.DeviceRayCount)
        assert len(cnt_b.parts) == 4
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
        assert int(cnt_a) == int(cnt_b)
