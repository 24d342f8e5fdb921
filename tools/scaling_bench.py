"""Rays/s scaling across mesh sizes (1/2/4/8 devices).

BASELINE.json asks for rays/s scaling measured at 1 chip / 1 host /
multi-host. Only ONE real TPU chip is reachable in this environment, so
this harness runs the sharded fast path over a virtual CPU device mesh
(the same `shard_map` program that runs on a pod slice) and reports
throughput per mesh size.

CAVEAT (printed with the results): virtual CPU devices share the host's
cores, so absolute numbers and parallel efficiency here measure host
contention, NOT ICI scaling — the harness demonstrates the measurement
and the program; real scaling numbers require real chips. The sharded
program has no cross-device communication during tracing (rays never
exchange data; see SURVEY.md §5), so on real hardware the expected
scaling is linear minus the final psum of the sample mean.

Usage: python tools/scaling_bench.py [--width 320] [--height 180] [--spp 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--preset", default="random_spheres")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.parallel import mesh as pmesh

    devices = jax.devices()
    print(json.dumps({"bench": "scaling/devices", "count": len(devices),
                      "kind": devices[0].platform,
                      "caveat": "virtual CPU devices share host cores; "
                                "this demonstrates the harness, not ICI "
                                "scaling"}), flush=True)

    scene, cam = presets.from_name(
        args.preset, aspect=args.width / args.height, seed=0
    )
    feats = SceneFeatures.from_scene(scene)

    n = 1
    results = []
    while n <= len(devices):
        render_mesh = pmesh.make_render_mesh(devices[:n])
        key = jax.random.PRNGKey(0)

        def frame(i):
            img, rays = pmesh.render_frame_sharded(
                scene, cam, args.width, args.height, args.spp, args.depth,
                jax.random.fold_in(key, i), render_mesh, features=feats,
                mode="fast", seed=i + 1,
            )
            return np.asarray(img), int(rays)

        frame(0)  # compile
        best = float("inf")
        rays = 0
        for i in range(1, args.repeats + 1):
            t0 = time.perf_counter()
            _, rays = frame(i)
            best = min(best, time.perf_counter() - t0)
        rec = {"bench": "scaling/render", "devices": n, "rays": rays,
               "secs": round(best, 3),
               "mrays_per_s": round(rays / best / 1e6, 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        n *= 2

    base = results[0]["mrays_per_s"]
    for r in results[1:]:
        eff = r["mrays_per_s"] / (base * r["devices"])
        print(json.dumps({"bench": "scaling/efficiency",
                          "devices": r["devices"],
                          "vs_linear": round(eff, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
