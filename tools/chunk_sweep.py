"""Sweep the fast-path frame chunk size on the headline workload.

Motivation (measured, 2026-08-19 epoch): the fused bounce's per-LANE cost
is nonlinear in wavefront size — ~31 ms/1M-lane marginal at a 3.7M
wavefront vs 14.2 ms/1M at 1M (tools/ladder_trace.py vs
tools/bounce_breakdown.py) — and the two-tier ladder's row tier stops
compacting once deaths scatter (every 128-lane row keeps >=1 live lane),
so tail bounces run at multi-M sizes. Chunking the frame into ~1M-ray
sub-wavefronts keeps every dispatch on the cheap side of the curve and
lets the lane tier engage, while cross-chunk pipelining hides the extra
dispatches (~1-3.5 ms each when queued, tools/dispatch_probe.py).

Times the bench.py 6-frame sustained burst per chunk size.
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

    W, H, S, D = 1280, 720, 4, 10
    scene, cam = presets.random_spheres(aspect=W / H)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)

    # args: CHUNK or CHUNK:GROUP pairs (CHUNK = INTERLEAVE_CHUNK override)
    combos = []
    for a in sys.argv[1:]:
        if ":" in a:
            c, g = a.split(":")
            combos.append((int(c), int(g)))
        else:
            combos.append((int(a), None))
    combos = combos or [(1 << 21, None), (1 << 20, None), (1 << 19, None)]

    orig = fp.INTERLEAVE_CHUNK
    for chunk, grp in combos:
        fp.INTERLEAVE_CHUNK = chunk
        try:
            def run(f):
                return fp.render_frame_fast(
                    scene, cam, W, H, S, D, jax.random.PRNGKey(f), f,
                    features, group=grp,
                )

            # compile + reach steady state (the first post-compile burst
            # pays ~1/3 of its wall in one-time per-executable setup —
            # see bench.py; timing it would bias combos with more
            # program shapes)
            img, rays = run(0)
            np.asarray(img)
            acc = None
            for f in range(100, 106):
                img, _ = run(f)
                acc = img if acc is None else acc + img
            np.asarray(acc)
            acc = None
            total = None
            t0 = time.perf_counter()
            for f in range(1, 7):
                img, rays = run(f)
                acc = img if acc is None else acc + img
                total = rays if total is None else total + rays
            np.asarray(acc)
            dt = time.perf_counter() - t0
            mrays = int(total) / 1e6 / dt
            print(json.dumps({
                "chunk": chunk,
                "group": grp,
                "mrays_s": round(mrays, 2),
                "burst_s": round(dt, 2),
            }), flush=True)
        finally:
            fp.INTERLEAVE_CHUNK = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
