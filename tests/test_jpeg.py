"""Baseline-JPEG decoder tests: cross-checked against Pillow's libjpeg
encoder (fixtures only — the decoder itself is self-contained numpy).

Parity model: for 4:4:4 the only differences vs libjpeg's decoder are
IDCT rounding (ours is exact float); subsampled modes additionally differ
in chroma upsampling (replication vs libjpeg's fancy upsampling), so the
tolerance is looser there but still tight enough to catch any real bug
(Huffman, dequant, zig-zag, color convert errors are full-plane garbage).
"""

import io
import os
import tempfile

import numpy as np
import pytest

from pathtrace_tpu.render import jpeg as pjpeg

PIL = pytest.importorskip("PIL.Image")


def _fixture(w, h, seed=0):
    rng = np.random.default_rng(seed)
    # smooth low-frequency content: JPEG round-trips it almost exactly,
    # so decoder bugs stand out instead of hiding in quantization noise
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            127 + 120 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
            127 + 120 * np.cos(xx / 31.0),
            127 + 120 * np.sin((xx + yy) / 29.0),
        ],
        axis=-1,
    )
    img += rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _encode(img, subsampling, quality=95, **kw):
    buf = io.BytesIO()
    PIL.fromarray(img).save(
        buf, "JPEG", quality=quality, subsampling=subsampling, **kw
    )
    return buf.getvalue()


class TestDecode:
    @pytest.mark.parametrize("subsampling,tol", [(0, 2.0), (1, 6.0), (2, 6.0)])
    @pytest.mark.parametrize("size", [(64, 48), (67, 35)])
    def test_matches_pillow(self, subsampling, tol, size):
        w, h = size
        img = _fixture(w, h)
        data = _encode(img, subsampling)
        ours = pjpeg.decode_jpeg(data)
        ref = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"), np.uint8)
        assert ours.shape == (h, w, 3)
        diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
        assert diff.mean() < tol, diff.mean()
        # bulk agreement, not just mean: catches localized block errors
        assert (diff > 24).mean() < 0.01

    def test_restart_intervals(self):
        img = _fixture(80, 64, seed=3)
        data = _encode(img, 0, restart_marker_blocks=2)
        if b"\xff\xdd" not in data:  # older Pillow: no DRI support
            pytest.skip("Pillow lacks restart_marker_blocks")
        ours = pjpeg.decode_jpeg(data)
        ref = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"), np.uint8)
        assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 2.0

    def test_grayscale(self):
        img = _fixture(40, 40)[:, :, 0]
        buf = io.BytesIO()
        PIL.fromarray(img, "L").save(buf, "JPEG", quality=95)
        ours = pjpeg.decode_jpeg(buf.getvalue())
        assert ours.shape == (40, 40, 3)
        ref = np.asarray(PIL.open(io.BytesIO(buf.getvalue())), np.uint8)
        assert np.abs(ours[:, :, 0].astype(int) - ref.astype(int)).mean() < 2.0

    def test_progressive_raises(self):
        img = _fixture(32, 32)
        data = _encode(img, 0, progressive=True)
        with pytest.raises(pjpeg.JpegError, match="progressive"):
            pjpeg.decode_jpeg(data)

    def test_not_a_jpeg_raises(self):
        with pytest.raises(pjpeg.JpegError):
            pjpeg.decode_jpeg(b"\x89PNG....")


class TestSceneWiring:
    def test_image_texture_from_jpeg_path(self):
        """A JPEG file path works end-to-end through SceneBuilder — the
        reference's earthmap.jpg asset class (texture.rs:14-20)."""
        from pathtrace_tpu.models.build import SceneBuilder

        img = _fixture(32, 16, seed=5)
        with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
            PIL.fromarray(img).save(f, "JPEG", quality=95, subsampling=0)
            path = f.name
        try:
            b = SceneBuilder()
            tid = b.image_texture(path)
            mid = b.lambertian(tid)
            b.sphere((0, 0, -1), 0.5, mid)
            scene = b.finish()
            assert scene.atlas.data.shape[0] >= 16
        finally:
            os.unlink(path)

    def test_read_image_sniffs_png_and_jpeg(self):
        from pathtrace_tpu.render import film

        img = _fixture(20, 12, seed=9)
        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            film.write_png(f.name, img)
            p_png = f.name
        with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
            PIL.fromarray(img).save(f, "JPEG", quality=98, subsampling=0)
            p_jpg = f.name
        try:
            a = film.read_image(p_png)
            b = film.read_image(p_jpg)
            np.testing.assert_array_equal(a, img)
            assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0
        finally:
            os.unlink(p_png)
            os.unlink(p_jpg)
