"""Earth (image-texture) throughput breakdown — same-window.

The r4 verdict: earth sustains ~10.8 Mrays/s vs 26-36 for its siblings,
with ~2x attributed-but-unproven to atlas-gather + UV cost beyond the
1.32 mean-path-depth denominator. This probe renders, in ONE window:

  1. earth            — the image-texture scene as shipped
  2. earth_const      — identical geometry/materials, image texture
                        swapped for a constant (compiles out the atlas
                        gather AND the UV transcendentals)
  3. two_perlin       — the reference's default scene, for the window's
                        scale factor

reporting per-frame wall, Mrays/s, and mean path depth (segments/rays).
earth vs earth_const isolates the image-texture machinery's true cost;
earth_const vs two_perlin (depth-corrected) shows the denominator effect.

Usage: python tools/earth_probe.py [frames]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import TEX_CONSTANT, SceneFeatures
    from pathtrace_tpu.ops import fastpath as fp

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    width, height, samples, max_depth = 1280, 720, 4, 10

    def const_earth(scene):
        tex = scene.textures
        kind = np.asarray(tex.kind).copy()
        color = np.asarray(tex.color).copy()
        color[kind == 3] = (0.4, 0.5, 0.6)
        kind[kind == 3] = TEX_CONSTANT
        tex = dataclasses.replace(tex, kind=kind, color=color)
        return dataclasses.replace(scene, textures=tex)

    earth_scene, cam = presets.earth(aspect=width / height)
    cases = [
        ("earth", earth_scene, cam),
        ("earth_const", const_earth(earth_scene), cam),
        ("two_perlin", *presets.two_perlin_spheres(aspect=width / height)),
    ]

    for tag, scene, camera in cases:
        feats = SceneFeatures.from_scene(scene)
        scene_d = jax.device_put(scene)
        # warmup/compile
        img, r = fp.render_frame_fast(
            scene_d, camera, width, height, samples, max_depth,
            jax.random.PRNGKey(0), 0, feats,
        )
        np.asarray(img)
        counts = []
        acc = None
        t0 = time.perf_counter()
        for f in range(1, n_frames + 1):
            img, r = fp.render_frame_fast(
                scene_d, camera, width, height, samples, max_depth,
                jax.random.PRNGKey(f), f, feats,
            )
            acc = img if acc is None else acc + img
            counts.append(r)
        np.asarray(acc)
        dt = time.perf_counter() - t0
        total = sum(int(c) for c in counts)
        rays0 = width * height * samples * n_frames
        print(json.dumps({
            "bench": f"earth_probe/{tag}",
            "wall_per_frame_ms": round(dt / n_frames * 1e3, 1),
            "mrays_per_s": round(total / 1e6 / dt, 2),
            "mean_depth": round(total / rays0, 3),
            "frame_mrays": round(total / n_frames / 1e6, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
