"""A-trous wavelet denoiser (render/denoise.py)."""

import jax
import numpy as np

from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render.aov import render_aovs
from pathtrace_tpu.render.denoise import atrous_denoise
from pathtrace_tpu.render.frame import render_frame


def _setup(preset="cornell", w=48, h=48, spp=4, seed=0, ref_spp=96, nee=True):
    scene, cam = presets.from_name(preset, aspect=w / h, seed=0)
    feats = SceneFeatures.from_scene(scene)
    lt = None
    if nee:
        from pathtrace_tpu.ops.lights import build_light_table

        lt = build_light_table(scene)
    noisy, _ = render_frame(scene, cam, w, h, spp, 8, jax.random.PRNGKey(seed),
                            features=feats, nee_lights=lt)
    ref, _ = render_frame(scene, cam, w, h, ref_spp, 8,
                          jax.random.PRNGKey(seed + 999), features=feats,
                          nee_lights=lt)
    aovs = render_aovs(scene, cam, w, h, jax.random.PRNGKey(1),
                       features=feats, samples=2)
    return np.asarray(noisy), np.asarray(ref), {
        k: np.asarray(v) for k, v in aovs.items()}


class TestDenoise:
    def test_reduces_error_vs_reference(self):
        """Display-domain MSE (what the viewer sees): the linear domain is
        dominated by the emitter's sub-pixel coverage noise, which no
        spatial filter can legitimately remove."""
        noisy, ref, aovs = _setup()
        out = np.asarray(atrous_denoise(
            noisy, aovs["normal"], aovs["albedo"], aovs["depth"]))

        def disp(x):
            return np.clip(x, 0.0, 1.0) ** (1.0 / 2.2)

        mse_noisy = float(((disp(noisy) - disp(ref)) ** 2).mean())
        mse_out = float(((disp(out) - disp(ref)) ** 2).mean())
        assert mse_out < 0.5 * mse_noisy, (mse_out, mse_noisy)

    def test_preserves_wall_color_edges(self):
        noisy, ref, aovs = _setup()
        out = np.asarray(atrous_denoise(
            noisy, aovs["normal"], aovs["albedo"], aovs["depth"]))
        # cornell: green wall left, red wall right — denoising must not
        # bleed them toward each other
        g_left = out[16:32, 2:6, 1].mean() / max(out[16:32, 2:6, 0].mean(), 1e-6)
        r_right = out[16:32, -6:-2, 0].mean() / max(out[16:32, -6:-2, 1].mean(), 1e-6)
        assert g_left > 2.0 and r_right > 2.0

    def test_finite_and_shape(self):
        noisy, _, aovs = _setup(spp=1, ref_spp=1)
        out = np.asarray(atrous_denoise(
            noisy, aovs["normal"], aovs["albedo"], aovs["depth"]))
        assert out.shape == noisy.shape and np.isfinite(out).all()
        assert (out >= 0).all()
