"""Microbenchmarks — the analog of the reference's nightly ``#[bench]`` suite
(reference bvh.rs:361-379, hitable_list.rs:68-76, spheres_soa.rs:464-485).

Where the reference times ONE ray against the `random_spheres` fixture per
kernel variant (BVH / flat list / SoA scalar / SSE4.1 / AVX2), the TPU
analog times a BATCH of rays per kernel variant (XLA brute force / Pallas
kernel / BVH wavefront traversal) and reports ns per ray — the same fixture
scene, the same comparison intent.

Usage: python tools/microbench.py [--rays 262144] [--repeats 5]
Prints one JSON line per benchmark.

Timing discipline for this platform: vary an input every call (identical
calls are elided) and time to host readback (block_until_ready is a no-op
under the axon tunnel).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()
    import jax.numpy as jnp

    from pathtrace_tpu.models import bvh as pbvh
    from pathtrace_tpu.models import presets
    from pathtrace_tpu.ops import intersect as isect
    from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas

    R = args.rays
    scene, cam = presets.random_spheres(aspect=1.0)  # the bench fixture scene
    scene = jax.device_put(scene)
    key = jax.random.PRNGKey(0)
    ro = jax.random.uniform(key, (R, 3)) * 24 - 12
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jnp.zeros(R)

    from pathtrace_tpu.models.types import SceneFeatures

    feats = SceneFeatures.from_scene(jax.device_get(scene))
    mn, mx = pbvh.sphere_aabbs(scene.spheres)
    flat, stats = pbvh.build_flat_bvh(mn, mx, mask=scene.spheres.mask, seed=0)
    flat = jax.device_put(flat)
    sflat, _, offsets = pbvh.build_scene_bvh(jax.device_get(scene), seed=0)
    sflat = jax.device_put(sflat)

    variants = {
        "xla_brute_force": jax.jit(
            lambda e: isect.sphere_nearest(
                scene.spheres, ro + e, rd, tm, has_motion=False
            )
        ),
        "pallas_kernel": jax.jit(
            lambda e: sphere_nearest_pallas(
                scene.spheres, ro + e, rd, tm, has_motion=False
            )
        ),
        # the production -B traversal (packed node rows + straggler slicing)
        "bvh_wavefront": jax.jit(
            lambda e: pbvh.bvh_scene_nearest(
                sflat, scene, ro + e, rd, tm, None, features=feats,
                offsets=offsets,
            )
        ),
        # the unpacked reference traversal, kept for comparison
        "bvh_wavefront_unpacked": jax.jit(
            lambda e: pbvh.bvh_sphere_nearest(
                flat, scene.spheres, ro + e, rd, tm, has_motion=False
            )
        ),
    }

    for name, fn in variants.items():
        out = fn(jnp.float32(0.0))
        np.asarray(out[0])  # true completion
        best = float("inf")
        for i in range(1, args.repeats + 1):
            t0 = time.perf_counter()
            out = fn(jnp.float32(i * 1e-6))
            np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "bench": f"nearest_hit/{name}",
                    "scene": "random_spheres",
                    "rays": R,
                    "ns_per_ray": round(best / R * 1e9, 2),
                    "mrays_per_s": round(R / best / 1e6, 2),
                }
            )
        )
    print(
        json.dumps(
            {
                "bench": "bvh_build",
                "nodes": stats.node_count,
                "max_depth": stats.max_depth,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
