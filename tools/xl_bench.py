"""XL-scene scaling bench: random_spheres_xl (~4100 spheres, 33 tiles).

Sustained Mrays/s on the headline film with the primary-bounce tile cull
on (default for >= CULL_MIN_TILES static scenes) and off — the scene the
cull exists for. PERF.md discipline: vary the key per frame, time a burst
to ONE readback.

Usage: python tools/xl_bench.py [n_frames]
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

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    width, height, samples, max_depth = 1280, 720, 4, 10
    scene, camera = presets.random_spheres_xl(aspect=width / height)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)
    print(json.dumps({
        "bench": "xl/scene",
        "n_spheres": int(scene.spheres.center.shape[0]),
    }), flush=True)

    def burst(tag):
        # warmup/compile
        i, r = fp.render_frame_fast(
            scene, camera, width, height, samples, max_depth,
            jax.random.PRNGKey(0), 0, features,
        )
        np.asarray(i)
        counts = []
        acc = None
        t0 = time.perf_counter()
        for f in range(1, n_frames + 1):
            i, r = fp.render_frame_fast(
                scene, camera, width, height, samples, max_depth,
                jax.random.PRNGKey(f), f, features,
            )
            acc = i if acc is None else acc + i
            counts.append(r)   # device scalars; int() deferred — a per-
            #                    frame int() is a serializing round trip
        np.asarray(acc)
        dt = time.perf_counter() - t0
        total = sum(int(c) for c in counts)
        print(json.dumps({
            "bench": f"xl/{tag}",
            "mrays_per_s": round(total / 1e6 / dt, 2),
            "wall_s": round(dt, 2),
        }), flush=True)

    fp.CULL_ALL_DEPTHS = False
    burst("cull_primary")           # r4 behavior: depth-0 cull only
    fp.CULL_ALL_DEPTHS = True
    burst("cull_all_depths")        # the default: tile-ordered bounce
    #                                 blocks stay pixel-coherent (r5)
    fp.CULL_MIN_TILES = 10_000
    burst("no_cull")                # also disables the tile-order layout
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
