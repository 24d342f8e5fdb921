"""Sweep the bounce-group size on the headline scene.

Each jit dispatch costs ~35-45 ms of tunnel overhead here; grouping g
bounces per dispatch amortizes it but coarsens the compaction ladder
(compacts only happen at group boundaries, and the lagged alive-count
sync lags by a whole group). This sweep renders the headline frame
(random_spheres 1280x720 @ 4 spp depth 10) at several group sizes and
prints Mrays/s for each — run it to pick trace_fast's default.
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
    from pathtrace_tpu.ops import fastpath

    width, height, samples, max_depth = 1280, 720, 4, 10
    scene, camera = presets.random_spheres(aspect=width / height)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)

    def run_frame(frame, group):
        key = jax.random.PRNGKey(frame)
        ro, rd, t = fastpath._gen_rays_jit(camera, width, height, samples, key)
        R = height * width * samples
        rad, rays = fastpath.trace_fast(
            scene, ro.reshape(R, 3), rd.reshape(R, 3), t.reshape(R),
            frame, max_depth, features, group=group,
        )
        return rad, int(rays)

    groups = [int(g) for g in sys.argv[1:]] or [1, 2, 3, 4, 6]
    for group in groups:
        rad, rays = run_frame(0, group)  # warmup/compile
        np.asarray(rad)
        # sustained burst to ONE readback — frames pipeline behind each
        # other exactly as the progressive driver runs (bench.py semantics)
        burst = 4
        t0 = time.perf_counter()
        total = 0
        for f in range(1, 1 + burst):
            rad, rays = run_frame(f, group)
            total += rays
        np.asarray(rad)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "bench": f"group_sweep/g{group}",
            "mrays_per_s": round(total / 1e6 / dt, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
