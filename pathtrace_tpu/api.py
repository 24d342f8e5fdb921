"""One-call library API.

The CLI (``python -m pathtrace_tpu``) is the reference-parity surface
(reference ``src/main.rs``); this module is the Python-native one: build or
pick a scene, call :func:`render`, get a numpy image back. Everything the
drivers do (path selection, BVH, progressive accumulation, checkpointing)
is reachable through the same keywords the CLI exposes.

    import pathtrace_tpu as pt

    img = pt.render_image(preset="small", width=320, height=180, samples=16)

    b = pt.SceneBuilder()
    b.sphere((0, 0, -1), 0.5, b.lambertian_color((0.4, 0.8, 0.4)))
    cam = pt.make_camera((0, 1, 3), (0, 0, -1), (0, 1, 0), 60.0, 16 / 9,
                         aperture=0.0, focus_dist=3.0)
    img = pt.render_image(scene=b.finish(), camera=cam, width=640, height=360)

(``render_image`` is this module's :func:`render`; the package re-exports it
under the longer name because the ``render/`` subpackage owns ``pt.render``.)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pathtrace_tpu.camera import Camera
from pathtrace_tpu.config import Params
from pathtrace_tpu.models import presets as _presets
from pathtrace_tpu.models.types import Scene, SceneFeatures


def render(
    preset: Optional[str] = None,
    scene: Optional[Scene] = None,
    camera: Optional[Camera] = None,
    width: int = 1280,
    height: int = 720,
    samples: int = 4,
    max_depth: int = 10,
    frames: int = 1,
    seed: int = 0,
    mode: str = "auto",
    use_bvh: bool = False,
    group: Optional[int] = None,
    compaction: bool = True,
    stratify: bool = False,
    nee: bool = False,
    rr_start: int = 0,
    denoise: bool = False,
    out: Optional[str] = None,
    **progressive_kwargs,
) -> np.ndarray:
    """Render ``frames`` progressive frames and return the [H, W, 3] linear
    image (float32, un-gamma'd). Pass EITHER ``preset`` (a name from
    :func:`preset_names`) OR ``scene`` + ``camera`` from
    :class:`SceneBuilder` / :func:`make_camera`. ``out`` additionally writes
    a PNG (sRGB-quantized like the reference's writer, offline.rs:43-59).
    Extra keywords flow to ``render_progressive`` (``checkpoint_path``,
    ``on_frame``, ``preview`` ...).
    """
    from pathtrace_tpu.render.progressive import render_progressive

    if (preset is None) == (scene is None):
        raise ValueError("pass exactly one of preset= or scene=")
    if preset is not None:
        built = _presets.from_name(preset, aspect=width / height, seed=seed)
        if built is None:
            raise ValueError(
                f"unknown preset {preset!r}; one of {_presets.names()}"
            )
        scene, camera = built
    elif camera is None:
        raise ValueError("a custom scene= needs a camera= as well")

    params = Params(width=width, height=height, samples=samples,
                    max_depth=max_depth, seed=seed)
    result = render_progressive(
        scene, camera, params,
        max_frames=frames,
        features=SceneFeatures.from_scene(scene),
        mode=mode, use_bvh=use_bvh, group=group, compaction=compaction,
        stratify=stratify, nee=nee, rr_start=rr_start,
        log=lambda _s: None,
        **progressive_kwargs,
    )
    image = result.image
    if denoise:
        import jax
        import jax.numpy as jnp

        from pathtrace_tpu.render.aov import render_aovs
        from pathtrace_tpu.render.denoise import atrous_denoise

        aovs = render_aovs(scene, camera, width, height,
                           jax.random.PRNGKey(seed), samples=2)
        image = np.asarray(atrous_denoise(
            jnp.asarray(image), aovs["normal"], aovs["albedo"],
            aovs["depth"]))
    if out is not None:
        from pathtrace_tpu.render import film

        film.save_frame_png(out, image)
    return image


def preset_names() -> list:
    """Names accepted by ``render(preset=...)``."""
    return list(_presets.names())
