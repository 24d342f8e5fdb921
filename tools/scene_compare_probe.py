"""Why is simple_light slower than its siblings? Per-bounce-group trace.

Renders one frame of each preset through trace_fast with SYNCHRONOUS
per-round readbacks (slower than production, but attributes the wall):
prints each round's wavefront size, alive count after, and wall. Then a
sustained multi-frame wall for the production comparison.

Usage: python tools/scene_compare_probe.py [--presets two_perlin_spheres,simple_light]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default="two_perlin_spheres,simple_light")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args()

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.ops import fastpath as fp
    from pathtrace_tpu.render.frame import generate_primary_rays

    for name in args.presets.split(","):
        scene, camera = presets.from_name(
            name, aspect=args.width / args.height, seed=0
        )
        features = SceneFeatures.from_scene(scene)
        scene = jax.device_put(scene)

        # --- synchronous per-group trace of ONE chunk (2M lanes) ---
        ro, rd, tm = generate_primary_rays(
            camera, args.width, args.height, args.spp, jax.random.PRNGKey(7)
        )
        R = min(args.width * args.height * args.spp, fp.INTERLEAVE_CHUNK)
        ro = ro.reshape(-1, 3)[:R]
        rd = rd.reshape(-1, 3)[:R]
        tm = tm.reshape(-1)[:R]
        tables, sky, grad_sky = fp.prep_tables(scene, features)
        prims = fp._scene_prims(scene, features)
        seed_arr = jnp.asarray(99, jnp.int32)
        state = fp.FastStateP(
            rox=ro[:, 0], roy=ro[:, 1], roz=ro[:, 2],
            rdx=rd[:, 0], rdy=rd[:, 1], rdz=rd[:, 2], time=tm,
            rad_r=jnp.zeros(R), rad_g=jnp.zeros(R), rad_b=jnp.zeros(R),
            thr_r=jnp.ones(R), thr_g=jnp.ones(R), thr_b=jnp.ones(R),
            alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
        )
        g = fp.DEFAULT_GROUP
        # warm compile
        st, _ = fp._bounce_group_fused_first(
            tables, sky, grad_sky, state, seed_arr, jnp.int32(0),
            args.depth, features, prims, group=g,
        )
        int(jnp.sum(st.alive))
        rows = []
        st = state
        depth = 0
        t_total = 0.0
        while depth <= args.depth:
            gg = min(g, args.depth + 1 - depth)
            t0 = time.perf_counter()
            st, segs = fp._bounce_group_fused_first(
                tables, sky, grad_sky, st, seed_arr, jnp.int32(depth),
                args.depth, features, prims, group=gg,
            )
            alive = int(jnp.sum(st.alive))   # sync barrier
            dt = time.perf_counter() - t0
            t_total += dt
            rows.append((depth, gg, R, alive, dt))
            depth += gg
        print(f"--- {name}: sync per-group trace (R={R}) ---", flush=True)
        for depth, gg, size, alive, dt in rows:
            print(f"  depth {depth:2d} x{gg}: size {size} -> alive {alive:8d}"
                  f"  {dt*1e3:7.1f} ms")
        print(f"  sync total: {t_total*1e3:.0f} ms")

        # --- sustained production frames ---
        def run(f):
            return fp.render_frame_fast(
                scene, camera, args.width, args.height, args.spp,
                args.depth, jax.random.PRNGKey(f), f, features,
            )

        img, _ = run(0)
        np.asarray(img)
        acc = None
        for f in range(50, 53):
            img, _ = run(f)
            acc = img if acc is None else acc + img
        np.asarray(acc)
        acc = None
        total = None
        t0 = time.perf_counter()
        for f in range(1, args.frames + 1):
            img, rays = run(f)
            acc = img if acc is None else acc + img
            total = rays if total is None else total + rays
        np.asarray(acc)
        dt = time.perf_counter() - t0
        segs = int(total)
        print(f"  sustained: {dt:.2f} s, {segs} segs, "
              f"{segs/dt/1e6:.1f} Mrays/s, "
              f"{segs/(args.frames*args.width*args.height*args.spp):.2f} avg depth",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
