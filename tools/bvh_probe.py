"""Time one whole-scene-BVH traversal wavefront on the device.

Measures ``bvh_scene_nearest`` (the ``-B`` hot loop) at the
BASELINE config-4 wavefront size (200x100 @ 8 spp = 160k rays), honest
timing per PERF.md: varied input each call, time to host readback.

Usage: python tools/bvh_probe.py [--rays 160000] [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=160_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--preset", default="random_spheres")
    ap.add_argument("--bulk", type=int, default=None,
                    help="override _BULK_IT (slicing sweep)")
    ap.add_argument("--slices", type=int, default=None,
                    help="override _SLICE_N (slicing sweep)")
    ap.add_argument("--wide", action="store_true",
                    help="measure the wide-node traversal (r4 layout)")
    ap.add_argument("--leaf-m", type=int, default=None,
                    help="wide-leaf slot count override")
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
    if args.bulk is not None:
        pbvh._BULK_IT = args.bulk
        pbvh._WIDE_BULK_IT = args.bulk
    if args.slices is not None:
        pbvh._SLICE_N = args.slices
        pbvh._WIDE_SLICE_N = args.slices
    flat, stats, offsets = pbvh.build_scene_bvh(scene, seed=0)
    if args.wide:
        wide = pbvh.widen_flat_bvh(flat, scene, offsets, features=features,
                                   leaf_m=args.leaf_m)
        print(f"wide: nodes={wide.n_nodes} leaf_m={wide.leaf_m} "
              f"W={wide.pack.shape[1]}", file=sys.stderr)
    print(f"scene={args.preset} nodes={stats.node_count} "
          f"depth={stats.max_depth} rays={args.rays}", file=sys.stderr)

    R = args.rays
    rng = np.random.default_rng(0)
    # camera-ish rays: origin near the preset camera, directions over the
    # hemisphere toward the scene so traversal does real work
    ro0 = np.asarray(camera.origin, np.float32)

    def make_rays(i):
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(ro0, (R, 3)).astype(np.float32) + 0.001 * i
        return jnp.asarray(o), jnp.asarray(d)

    tmv = jnp.zeros(R, jnp.float32)

    @jax.jit
    def run(ro, rd):
        if args.wide:
            t, gid = pbvh.wide_scene_nearest(
                wide, scene, ro, rd, tmv, None, features=features,
                offsets=offsets,
            )
        else:
            t, gid = pbvh.bvh_scene_nearest(
                flat, scene, ro, rd, tmv, None, features=features,
                offsets=offsets,
            )
        return t.sum(), (t < 1e8).sum()

    # warmup/compile
    ro, rd = make_rays(0)
    s, h = run(ro, rd)
    print(f"warmup: hits={int(h)}/{R}", file=sys.stderr)

    ts = []
    for i in range(args.iters):
        ro, rd = make_rays(i + 1)
        t0 = time.perf_counter()
        s, h = run(ro, rd)
        s = float(s)  # host readback
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"traversal: best {best*1e3:.1f} ms / {R} rays "
          f"({R/best/1e6:.3f} Mrays/s per bounce), all={['%.0f' % (x*1e3) for x in ts]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
