"""Live preview surface (render/preview.py) — the GL-window analog."""

import json
import urllib.request

import numpy as np

from pathtrace_tpu.render import film
from pathtrace_tpu.render.preview import PreviewServer


def test_serves_page_frame_and_stats():
    srv = PreviewServer()
    try:
        img = np.random.default_rng(0).random((32, 48, 3)).astype(np.float32)
        srv.update(img, frame=3, mrays_per_s=1.25)
        html = urllib.request.urlopen(srv.url, timeout=10).read()
        png = urllib.request.urlopen(srv.url + "frame.png", timeout=10).read()
        stats = json.loads(
            urllib.request.urlopen(srv.url + "stats.json", timeout=10).read()
        )
        assert b"pathtrace_tpu" in html
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert stats == {
            "frame": 3, "mrays_per_s": 1.25, "width": 48, "height": 32,
        }
        # the served frame decodes to the sRGB-encoded, save-flipped image
        import io
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            f.write(png)
            f.flush()
            decoded = film.read_png(f.name)
        np.testing.assert_array_equal(decoded, film.to_srgb_u8(img[::-1]))
    finally:
        srv.close()


def test_progressive_loop_updates_preview(monkeypatch):
    """render_progressive pushes every frame into the preview server."""
    import jax

    from pathtrace_tpu.config import Params
    from pathtrace_tpu.models import presets
    from pathtrace_tpu.render.progressive import render_progressive

    scene, cam = presets.small(aspect=1.0)
    params = Params(width=16, height=16, samples=1, max_depth=2)
    result = render_progressive(
        scene, cam, params, max_frames=2, preview=True, log=lambda s: None
    )
    assert result.frames == 2
