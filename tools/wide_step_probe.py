"""Traversal cost probe: flat vs wide BVH layouts, on device.

Rays are generated ON DEVICE from a scalar seed (a [1M,3] host upload is
~340 ms of tunnel time and was polluting earlier numbers — the r3 bvh_probe
figures include it). Honest timing per PERF.md: varied scalar input, time
to a host scalar readback.

Measures: raw [1M, W] row-gather cost vs width, and full traversal wall
for the flat layout and wide layouts across leaf_m x bulk_it.

Usage: python tools/wide_step_probe.py [--rays 1048576]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--preset", default="random_spheres")
    ap.add_argument("--gathers", action="store_true",
                    help="include the raw row-gather width sweep")
    ap.add_argument("--leaf-ms", default="2,4,8")
    ap.add_argument("--bulks", default="8,16,24")
    args = ap.parse_args()

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtrace_tpu.models import bvh as pbvh
    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures

    scene, camera = presets.from_name(args.preset, aspect=2.0, seed=0)
    features = SceneFeatures.from_scene(scene)
    flat, stats, offsets = pbvh.build_scene_bvh(scene, seed=0)

    R = args.rays
    ro0 = jnp.asarray(np.asarray(camera.origin, np.float32))
    tmv = jnp.zeros(R, jnp.float32)

    def dev_rays(seed):
        # deterministic per-seed rays, built on device — no host upload
        key = jax.random.PRNGKey(seed)
        d = jax.random.normal(key, (R, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        o = jnp.broadcast_to(ro0, (R, 3)) + 0.001 * seed
        return o, d

    def bench(fn, label):
        out = fn(jnp.int32(0))
        _ = float(out)
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            _ = float(fn(jnp.int32(i + 1)))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{label}: best {best*1e3:.1f} ms  "
              f"all={['%.0f' % (x*1e3) for x in ts]}", flush=True)
        return best

    rng = np.random.default_rng(0)
    if args.gathers:
        for W in (17, 26, 42, 82):
            pack = jnp.asarray(rng.normal(size=(1024, W)).astype(np.float32))

            @jax.jit
            def g(seed, pack=pack):
                ro, rd = dev_rays(seed)
                idx = (jnp.abs(ro[:, 0] * 1000 + rd[:, 0] * 999)
                       .astype(jnp.int32)) % 1024
                return pack[idx].sum()

            bench(g, f"row gather [1M,{W}]")

    @jax.jit
    def f(seed):
        ro, rd = dev_rays(seed)
        t, gid = pbvh.bvh_scene_nearest(
            flat, scene, ro, rd, tmv, None, features=features,
            offsets=offsets,
        )
        return t.sum()

    bench(f, f"flat traversal (nodes={flat.n_nodes}, bulk={pbvh._BULK_IT})")

    for leaf_m in (int(x) for x in args.leaf_ms.split(",")):
        wide = pbvh.widen_flat_bvh(flat, scene, offsets, features=features,
                                   leaf_m=leaf_m)
        for bulk in (int(x) for x in args.bulks.split(",")):
            pbvh._WIDE_BULK_IT = bulk

            @jax.jit
            def w(seed, wide=wide):
                ro, rd = dev_rays(seed)
                t, gid = pbvh.wide_scene_nearest(
                    wide, scene, ro, rd, tmv, None, features=features,
                    offsets=offsets,
                )
                return t.sum()

            bench(w, f"wide leaf_m={leaf_m} W={wide.pack.shape[1]} "
                     f"nodes={wide.n_nodes} bulk={bulk}")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
