"""In-situ -B fast-path cost: trace_fast with the BVH provider on real
camera wavefronts, wall per segment, compaction on/off, group sweep.

Usage: python tools/bvh_ladder_probe.py [--rays 1048576] [--groups 4]
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
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--groups", default="4")
    ap.add_argument("--no-compaction", action="store_true")
    ap.add_argument("--brute", action="store_true")
    ap.add_argument("--bulk", type=int, default=None)
    ap.add_argument("--slices", type=int, default=None)
    args = ap.parse_args()

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtrace_tpu.models import bvh as pbvh
    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.ops import fastpath as fp
    from pathtrace_tpu.render.frame import generate_primary_rays

    scene, camera = presets.from_name("random_spheres", aspect=2.0, seed=0)
    features = SceneFeatures.from_scene(scene)
    if args.bulk is not None:
        pbvh._BULK_IT = args.bulk
    if args.slices is not None:
        pbvh._SLICE_N = args.slices
    bvh = offsets = None
    if not args.brute:
        bvh, stats, offsets = pbvh.build_scene_bvh(scene, seed=0)
        bvh = jax.device_put(bvh)
    scene = jax.device_put(scene)

    R = args.rays
    # real camera rays at a film whose R matches, with spp making up the rest
    W, Hh = 1024, 512
    spp = max(R // (W * Hh), 1)

    def make_rays(i):
        ro, rd, tm = generate_primary_rays(
            camera, W, Hh, spp, jax.random.PRNGKey(i)
        )
        n = W * Hh * spp
        return ro.reshape(n, 3)[:R], rd.reshape(n, 3)[:R], tm.reshape(n)[:R]

    for g in (int(x) for x in args.groups.split(",")):
        def run(i):
            ro, rd, tm = make_rays(i)
            rad, segs = fp.trace_fast(
                scene, ro, rd, tm, 1234 + i, args.depth, features,
                compaction=not args.no_compaction, group=g,
                bvh=bvh, bvh_offsets=offsets,
            )
            return float(jnp.sum(rad)), int(segs)

        run(0)
        ts, ss = [], []
        for i in range(args.iters):
            t0 = time.perf_counter()
            _, segs = run(i + 1)
            ts.append(time.perf_counter() - t0)
            ss.append(segs)
        best = min(ts)
        segs = ss[ts.index(best)]
        print(f"group={g} comp={not args.no_compaction} "
              f"bvh={bvh is not None}: best {best*1e3:.0f} ms, {segs} segs, "
              f"{segs/best/1e6:.2f} Msegs/s, all={['%.0f' % (x*1e3) for x in ts]}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
