"""Fast-path NEE throughput A/B — the r4 verdict's done-criterion probe.

Same-window: cornell (the NEE showcase scene) rendered on the fast path
with and without NEE at the same film/spp, plus simple_light. Criterion:
NEE within ~1.5x of the non-NEE fast path wall (it traces ~2x the
segments at diffuse vertices, so Mrays/s is not the right lens — wall
per frame is).

Usage: python tools/nee_bench.py [frames]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.ops import fastpath as fp
    from pathtrace_tpu.ops.lights import build_light_table

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    width, height, samples, max_depth = 640, 640, 4, 10

    for preset in ("cornell", "simple_light"):
        scene, cam = presets.from_name(preset, aspect=width / height)
        feats = SceneFeatures.from_scene(scene)
        lt = build_light_table(scene)
        scene_d = jax.device_put(scene)
        for tag, nee in (("plain", None), ("nee", lt)):
            img, r = fp.render_frame_fast(
                scene_d, cam, width, height, samples, max_depth,
                jax.random.PRNGKey(0), 0, feats, nee_lights=nee,
            )
            np.asarray(img)
            counts = []
            acc = None
            t0 = time.perf_counter()
            for f in range(1, n_frames + 1):
                img, r = fp.render_frame_fast(
                    scene_d, cam, width, height, samples, max_depth,
                    jax.random.PRNGKey(f), f, feats, nee_lights=nee,
                )
                acc = img if acc is None else acc + img
                counts.append(r)
            np.asarray(acc)
            dt = time.perf_counter() - t0
            total = sum(int(c) for c in counts)
            print(json.dumps({
                "bench": f"nee/{preset}/{tag}",
                "wall_per_frame_ms": round(dt / n_frames * 1e3, 1),
                "mrays_per_s": round(total / 1e6 / dt, 2),
                "segments_per_frame_m": round(total / n_frames / 1e6, 2),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
