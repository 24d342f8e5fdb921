"""Brute-force vs BVH crossover at scene scale.

The reference keeps its BVH optional because the flat list is competitive
at ~500 spheres (reference ``src/main.rs:63-66``); the BVH exists for
bigger scenes. This tool measures WHERE the crossover sits on this device:
per-bounce nearest-hit throughput of

  * the Pallas brute-force sweep (the fast path's kernel),
  * the same kernel with the in-kernel per-tile AABB cull, and
  * the sliced wavefront BVH traversal (``models/bvh.py``),

on the cover-scene geometry scaled to N spheres via its grid half-extent.
Rays are camera-origin with random directions (the coherent/incoherent mix
a real bounce sweep sees is in between; see PERF.md cull notes).

Usage: python tools/crossover_bench.py [--rays 1048576]
       [--extents 11,32,64,91]
Prints one JSON line per (N, variant).
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
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--extents", default="11,32,64",
                    help="grid half-extents; N ~ (2k)^2 spheres")
    ap.add_argument("--s-tiles", type=int, default=16,
                    help="supertile size for the hierarchical cull variant")
    ap.add_argument("--no-bvh", action="store_true",
                    help="skip the BVH variant (slow at large N)")
    ap.add_argument("--no-brute", action="store_true",
                    help="skip the uncull brute variant")
    ap.add_argument("--scatter", action="store_true",
                    help="random origins inside the scene bounds (bounce-"
                         "like incoherence) instead of camera origins")
    ap.add_argument("--tile-order", action="store_true",
                    help="with --raster: permute rays into 64x64 pixel "
                         "tiles so kernel blocks are compact frusta")
    ap.add_argument("--raster", action="store_true",
                    help="raster-coherent camera directions (adjacent "
                         "lanes = adjacent pixels, like a real primary "
                         "wavefront) instead of random directions")
    args = ap.parse_args()

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pathtrace_tpu.models import bvh as pbvh
    from pathtrace_tpu.models.presets import _random_impl
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.ops.intersect_pallas import (
        sphere_nearest_pallas,
        sphere_nearest_pallas_cols,
    )

    R = args.rays
    rng = np.random.default_rng(0)
    if args.raster:
        # raster-coherent directions: lane i -> pixel (i % W, i // W) of a
        # 60-deg-fov looking-down-at-the-field camera; adjacent lanes are
        # adjacent pixels, exactly like a real primary wavefront
        W = 1024
        H = (R + W - 1) // W
        i = np.arange(R)
        px = (i % W).astype(np.float32) / W - 0.5
        py = (i // W).astype(np.float32) / H - 0.5
        look = np.asarray([0.0, -0.35, -1.0], np.float32)
        look /= np.linalg.norm(look)
        right = np.asarray([1.0, 0.0, 0.0], np.float32)
        up = np.cross(right, look)
        d = (look[None] + 1.15 * px[:, None] * right[None]
             + 1.15 * (H / W) * py[:, None] * up[None]).astype(np.float32)
        if args.tile_order:
            x = i % W
            y = i // W
            key = ((y // 64) * (W // 64) + (x // 64)) * (1 << 20) \
                + (y % 64) * 64 + (x % 64)
            d = d[np.argsort(key, kind="stable")]
    else:
        d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rd = jnp.asarray(d)
    tm = jnp.zeros(R, jnp.float32)

    def bench(fn, label, n_spheres):
        out = fn(jnp.float32(0.0))
        np.asarray(out[0])
        best = float("inf")
        for i in range(1, args.repeats + 1):
            t0 = time.perf_counter()
            out = fn(jnp.float32(i * 1e-6))
            np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "bench": f"crossover/{label}", "spheres": n_spheres, "rays": R,
            "ms": round(best * 1e3, 1),
            "mrays_per_s": round(R / best / 1e6, 2),
        }), flush=True)

    for ext in [int(x) for x in args.extents.split(",")]:
        scene, cam = _random_impl(2.0, only_spheres=True, seed=0,
                                  half_extent=ext)
        n = int(np.asarray(scene.spheres.mask).sum())
        feats = SceneFeatures.from_scene(scene)
        flat = offsets = None
        if not args.no_bvh:
            flat, stats, offsets = pbvh.build_scene_bvh(scene, seed=0)
            flat = jax.device_put(flat)
            print(json.dumps({"bench": "crossover/build", "spheres": n,
                              "nodes": stats.node_count,
                              "max_depth": stats.max_depth}), flush=True)
        scene = jax.device_put(scene)

        if args.scatter:
            # bounds over the small-sphere field only: live rows, excluding
            # the r=1000 ground sphere (and the mask=False padding rows,
            # whose zero centers would skew the box)
            centers = np.asarray(scene.spheres.center)
            small = (np.asarray(scene.spheres.mask)
                     & (np.abs(np.asarray(scene.spheres.radius)) < 10.0))
            lo = centers[small].min(axis=0)
            hi = centers[small].max(axis=0)
            ro0 = (rng.random((R, 3)).astype(np.float32) * (hi - lo) + lo)
        else:
            ro0 = np.broadcast_to(np.asarray(cam.origin, np.float32), (R, 3))
        ro = jnp.asarray(ro0.copy())
        rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
        rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]

        if not args.no_brute:
            bench(jax.jit(lambda e, s=scene: sphere_nearest_pallas(
                s.spheres, ro + e, rd, tm, has_motion=False)),
                "pallas_brute", n)
        bench(jax.jit(lambda e, s=scene: sphere_nearest_pallas_cols(
            s.spheres, rox + e, roy, roz, rdx, rdy, rdz, tm,
            has_motion=False, cull="flat")),
            "pallas_tile_cull", n)
        bench(jax.jit(lambda e, s=scene: sphere_nearest_pallas_cols(
            s.spheres, rox + e, roy, roz, rdx, rdy, rdz, tm,
            has_motion=False, cull="hier", s_tiles=args.s_tiles)),
            f"pallas_hier_cull_s{args.s_tiles}", n)
        if not args.no_bvh:
            bench(jax.jit(lambda e, s=scene, f=flat, ft=feats, of=offsets:
                  pbvh.bvh_scene_nearest(f, s, ro + e, rd, tm, None,
                                         features=ft, offsets=of)),
                  "bvh_sliced", n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
