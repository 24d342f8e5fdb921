"""Per-pixel golden images for every preset, on both render paths.

The statistical goldens (test_golden.py) pin 3 numbers per preset; a
refactor could shift spatial structure while preserving means. These pin
the FULL low-res image at fixed seed: any pixel moving beyond float slack
fails. Goldens live in tests/goldens/pixels_<preset>_<path>.npz; a missing
golden is written and the test skipped (delete the file to regenerate
after an intentional estimator change).
"""

import os

import jax
import numpy as np
import pytest

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
W, H, SPP, DEPTH, SEED = 64, 48, 8, 8, 0

ALL_PRESETS = sorted(presets.names())


def render(preset: str, path: str) -> np.ndarray:
    scene, cam = presets.from_name(preset, aspect=W / H, seed=0)
    feats = SceneFeatures.from_scene(scene)
    if path == "general":
        from pathtrace_tpu.render.frame import render_frame

        img, _ = render_frame(
            scene, cam, W, H, SPP, DEPTH, jax.random.PRNGKey(SEED),
            features=feats,
        )
    else:
        from pathtrace_tpu.ops.fastpath import render_frame_fast

        img, _ = render_frame_fast(
            scene, cam, W, H, SPP, DEPTH, jax.random.PRNGKey(SEED), SEED,
            feats,
        )
    return np.asarray(img)


@pytest.mark.parametrize("path", ["general", "fast"])
@pytest.mark.parametrize("preset", ALL_PRESETS)
def test_pixels_match_golden(preset, path):
    golden_path = os.path.join(GOLDEN_DIR, f"pixels_{preset}_{path}.npz")
    img = render(preset, path)
    assert img.shape == (H, W, 3) and np.isfinite(img).all()
    if not os.path.exists(golden_path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(golden_path, img=img.astype(np.float32))
        pytest.skip(f"wrote new golden {golden_path}")
    golden = np.load(golden_path)["img"]
    # float slack only: backend fusion may reorder adds; anything visible
    # (estimator/RNG/geometry changes) is orders of magnitude larger
    np.testing.assert_allclose(img, golden, atol=2e-4, rtol=2e-4)
