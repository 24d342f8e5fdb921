"""Isolate traversal per-step marginal cost: fori_loop of exactly K steps.

Separates the fixed gather/latency component from the per-step VPU work by
differencing K and 2K fixed-step runs of the flat and wide traversal
bodies at a 1M wavefront, plus raygen-only and chained-gather baselines.

Usage: python tools/step_cost_probe.py
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
    args = ap.parse_args()

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtrace_tpu.models import bvh as pbvh
    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures

    scene, camera = presets.from_name("random_spheres", aspect=2.0, seed=0)
    features = SceneFeatures.from_scene(scene)
    flat, stats, offsets = pbvh.build_scene_bvh(scene, seed=0)

    R = args.rays
    ro0 = jnp.asarray(np.asarray(camera.origin, np.float32))
    tmv = jnp.zeros(R, jnp.float32)

    def dev_rays(seed):
        key = jax.random.PRNGKey(seed)
        d = jax.random.normal(key, (R, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        o = jnp.broadcast_to(ro0, (R, 3)) + 0.001 * seed
        return o, d

    def bench(fn, label):
        _ = float(fn(jnp.int32(0)))
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            _ = float(fn(jnp.int32(i + 1)))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{label}: best {best*1e3:.1f} ms", flush=True)
        return best

    @jax.jit
    def raygen_only(seed):
        ro, rd = dev_rays(seed)
        return ro.sum() + rd.sum()

    base = bench(raygen_only, "raygen only")

    rng = np.random.default_rng(0)
    pack17 = jnp.asarray(rng.normal(size=(1024, 17)).astype(np.float32))

    def chain_gather(n):
        @jax.jit
        def g(seed):
            ro, rd = dev_rays(seed)
            idx = (jnp.abs(ro[:, 0] * 1000).astype(jnp.int32)) % 1024
            acc = jnp.zeros(R)
            for _ in range(n):
                row = pack17[idx]
                acc = acc + row.sum(axis=1)
                idx = (idx + row[:, 0].astype(jnp.int32)) % 1024  # dependent
            return acc.sum()
        return g

    g1 = bench(chain_gather(1), "raygen + 1 gather [1M,17]")
    g4 = bench(chain_gather(4), "raygen + 4 chained gathers")
    print(f"  -> marginal gather: {(g4-g1)/3*1e3:.1f} ms", flush=True)

    # per-step cost via full-traversal bulk sweep: the bulk=K vs bulk=2K
    # difference / K is the marginal full-wavefront step cost (the sliced
    # tail absorbs the remainder either way)
    import pathtrace_tpu.models.bvh as B

    for K in (16, 32):
        B._BULK_IT = K

        @jax.jit
        def f(seed):
            ro, rd = dev_rays(seed)
            t, gid = pbvh.bvh_scene_nearest(
                flat, scene, ro, rd, tmv, None, features=features,
                offsets=offsets,
            )
            return t.sum()

        bench(f, f"flat traversal bulk={K}")

    wide2 = pbvh.widen_flat_bvh(flat, scene, offsets, features=features,
                                leaf_m=2)
    for K in (16, 32):
        B._WIDE_BULK_IT = K

        @jax.jit
        def w(seed):
            ro, rd = dev_rays(seed)
            t, gid = pbvh.wide_scene_nearest(
                wide2, scene, ro, rd, tmv, None, features=features,
                offsets=offsets,
            )
            return t.sum()

        bench(w, f"wide2 traversal bulk={K}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
