"""Trace the host ladder step by step on the headline frame: wavefront
sizes, alive counts, per-dispatch wall time, compaction wall time.

Replicates trace_fast's fused ladder with synchronous timing (readback per
step — slower than production's lagged overlap, but shows where time goes).
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
    import jax.numpy as jnp

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.ops import fastpath as fp
    from pathtrace_tpu.render.frame import generate_primary_rays

    W, H, S, DEPTH = 1280, 720, 4, 10
    scene, cam = presets.random_spheres(aspect=W / H)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)
    tables, sky, gsky = fp.prep_tables(scene, features)

    R = W * H * S
    RF = ("rad_r", "rad_g", "rad_b")

    def sync(x):
        np.asarray(x)

    def run_frame(frame):
        ro, rd, tm = generate_primary_rays(
            cam, W, H, S, jax.random.PRNGKey(frame)
        )
        ro, rd, tm = ro.reshape(R, 3), rd.reshape(R, 3), tm.reshape(R)
        state = fp.FastStateP(
            rox=ro[:, 0], roy=ro[:, 1], roz=ro[:, 2],
            rdx=rd[:, 0], rdy=rd[:, 1], rdz=rd[:, 2], time=tm,
            rad_r=jnp.zeros(R), rad_g=jnp.zeros(R), rad_b=jnp.zeros(R),
            thr_r=jnp.ones(R), thr_g=jnp.ones(R), thr_b=jnp.ones(R),
            alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
        )
        seed = jnp.int32(frame)
        out_rad = tuple(jnp.zeros(R) for _ in range(3))
        indices = jnp.arange(R, dtype=jnp.int32)
        size = R
        identity = True
        min_size = 1 << 15
        group = 2
        depth = 0
        logs = []
        total0 = time.perf_counter()
        while depth <= DEPTH:
            g = min(group, DEPTH + 1 - depth)
            t0 = time.perf_counter()
            state, segs = fp._bounce_group_fused_first(
                tables, sky, gsky, state, seed, jnp.int32(depth), DEPTH,
                features, fp._scene_prims(scene, features), group=g,
            )
            n_alive = int(jnp.sum(state.alive))
            dt_bounce = time.perf_counter() - t0
            depth += g
            rec = {"depth": depth, "size": size, "alive": n_alive,
                   "bounce_ms": round(dt_bounce * 1e3, 1), "group": g}
            if n_alive == 0:
                logs.append(rec)
                break
            next_size = fp._rung(n_alive, min_size)
            bar = size // 4 if size > (1 << 19) else int(size * 0.6)
            if next_size <= bar:
                t0 = time.perf_counter()
                out_rad, state, indices = fp._compact(
                    out_rad, state, indices, next_size,
                    radiance_fields=RF, identity=identity,
                )
                sync(state.rox[:8])
                rec["compact_to"] = next_size
                rec["compact_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
                size = next_size
                identity = False
            logs.append(rec)
        out_rad = fp._final_flush(out_rad, state, indices,
                                  radiance_fields=RF, identity=identity)
        sync(out_rad[0][:8])
        total = time.perf_counter() - total0
        return logs, total

    run_frame(1)  # warm every program shape
    logs, total = run_frame(2)
    for rec in logs:
        print(json.dumps(rec), flush=True)
    print(json.dumps({"total_s": round(total, 2),
                      "note": "sync-per-step; production overlaps"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
