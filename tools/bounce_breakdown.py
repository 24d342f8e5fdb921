"""Per-phase breakdown of one fast-path bounce on the real device.

Times, per 1M rays (the headline wavefront scale):

  dispatch_floor    an (almost) empty jit call — tunnel/dispatch overhead
  hit_kernel        Pallas closest-hit sweep alone
  hit_gather        + the winner row gather (nearest_hit_attrs)
  full_bounce       the shipping fast_bounce (hit + gather + XLA shading)
  ew_vec3_chain     10-op elementwise chain on [R,3] arrays (padded-lane cost)
  ew_plane_chain    the same chain on 3 separate [R] planes (packed cost)
  gather_split      row gather + split into 24 [R] planes (kernel-feed cost)

Methodology per PERF.md: vary an input every call (identical calls get
elided), time to host readback (block_until_ready is a no-op here), take
best-of-N. Every variant returns a small reduction so XLA cannot dead-code
the work, and the readback payload is tiny.

Usage: python tools/bounce_breakdown.py [--rays 1048576] [--repeats 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, repeats):
    out = fn(0)
    np.asarray(out)
    best = float("inf")
    for i in range(1, repeats + 1):
        t0 = time.perf_counter()
        out = fn(i)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.ops import fastpath as fp
    from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas

    R = args.rays
    scene, cam = presets.random_spheres(aspect=1.0)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)
    tables, sky, gsky = fp.prep_tables(scene, features)

    key = jax.random.PRNGKey(0)
    ro = jax.random.uniform(key, (R, 3)) * 24 - 12
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jnp.zeros(R)

    state = fp.FastState(
        ro=ro, rd=rd, time=tm,
        radiance=jnp.zeros((R, 3)), throughput=jnp.ones((R, 3)),
        alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
    )
    seed = jnp.int32(7)

    results = {}

    @jax.jit
    def f_floor(e):
        return jnp.float32(e) + 1.0

    results["dispatch_floor"] = timed(lambda i: f_floor(jnp.float32(i)), args.repeats)

    @jax.jit
    def f_hit(e):
        t, idx = sphere_nearest_pallas(
            scene.spheres, ro + e, rd, tm, has_motion=bool(features.has_motion)
        )
        return jnp.sum(t) + jnp.sum(idx)

    results["hit_kernel"] = timed(lambda i: f_hit(jnp.float32(i * 1e-6)), args.repeats)

    @jax.jit
    def f_hitgather(e):
        t, attrs = fp.nearest_hit_attrs(tables, ro + e, rd, tm, features, scene)
        return jnp.sum(t) + jnp.sum(attrs[:, 0]) + jnp.sum(attrs)

    results["hit_gather"] = timed(
        lambda i: f_hitgather(jnp.float32(i * 1e-6)), args.repeats
    )

    @jax.jit
    def f_bounce(e):
        st = state._replace(ro=state.ro + e)
        st = fp.fast_bounce(
            tables, sky, gsky, st, seed, jnp.int32(0), 10, features, scene=scene
        )
        return jnp.sum(st.radiance) + jnp.sum(st.rd) + jnp.sum(st.throughput)

    results["full_bounce"] = timed(
        lambda i: f_bounce(jnp.float32(i * 1e-6)), args.repeats
    )

    def chain(x):
        for _ in range(10):
            x = x * 1.0001 + 0.1
        return x

    @jax.jit
    def f_vec3(e):
        a = ro + e
        b = chain(a)
        c = chain(b * a)
        return jnp.sum(c)

    results["ew_vec3_chain"] = timed(
        lambda i: f_vec3(jnp.float32(i * 1e-6)), args.repeats
    )

    px, py, pz = ro[:, 0], ro[:, 1], ro[:, 2]

    @jax.jit
    def f_plane(e):
        tot = jnp.float32(0.0)
        for p in (px, py, pz):
            a = p + e
            b = chain(a)
            c = chain(b * a)
            tot = tot + jnp.sum(c)
        return tot

    results["ew_plane_chain"] = timed(
        lambda i: f_plane(jnp.float32(i * 1e-6)), args.repeats
    )

    # ---- fused-path phases ----
    stateP = fp.FastStateP(
        rox=ro[:, 0], roy=ro[:, 1], roz=ro[:, 2],
        rdx=rd[:, 0], rdy=rd[:, 1], rdz=rd[:, 2], time=tm,
        rad_r=jnp.zeros(R), rad_g=jnp.zeros(R), rad_b=jnp.zeros(R),
        thr_r=jnp.ones(R), thr_g=jnp.ones(R), thr_b=jnp.ones(R),
        alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
    )

    @jax.jit
    def f_fused(e):
        st = stateP._replace(rox=stateP.rox + e)
        st = fp.fast_bounce_fused(
            tables, sky, gsky, st, seed, jnp.int32(0), 10, features,
            scene=scene,
        )
        return jnp.sum(st.rad_r) + jnp.sum(st.rdx) + jnp.sum(st.thr_g)

    results["fused_bounce"] = timed(
        lambda i: f_fused(jnp.float32(i * 1e-6)), args.repeats
    )

    @jax.jit
    def f_fused2(e):
        st = stateP._replace(rox=stateP.rox + e)
        for d in range(2):
            st = fp.fast_bounce_fused(
                tables, sky, gsky, st, seed, jnp.int32(d), 10, features,
                scene=scene,
            )
        return jnp.sum(st.rad_r) + jnp.sum(st.rdx) + jnp.sum(st.thr_g)

    results["fused_bounce_x2"] = timed(
        lambda i: f_fused2(jnp.float32(i * 1e-6)), args.repeats
    )

    from pathtrace_tpu.ops.shade_pallas import shade_bounce_planes

    t0p, attrs0 = fp.nearest_hit_attrs(tables, ro, rd, tm, features, scene)
    Rk, Kk = attrs0.shape
    attrs3 = jax.device_put(
        attrs0.reshape(Rk // 128, 128, Kk).transpose(0, 2, 1)
    )
    t0p = jax.device_put(t0p)
    spl = {
        "rox": stateP.rox, "roy": stateP.roy, "roz": stateP.roz,
        "rdx": stateP.rdx, "rdy": stateP.rdy, "rdz": stateP.rdz,
        "time": stateP.time,
        "thr_r": stateP.thr_r, "thr_g": stateP.thr_g, "thr_b": stateP.thr_b,
        "rad_r": stateP.rad_r, "rad_g": stateP.rad_g, "rad_b": stateP.rad_b,
        "alive": stateP.alive.astype(jnp.float32),
        "lane": stateP.lane.astype(jnp.int32),
    }

    @jax.jit
    def f_shade(e):
        sp = dict(spl)
        sp["rox"] = sp["rox"] + e
        outs = shade_bounce_planes(
            t0p, attrs3, sp, jnp.int32(7), jnp.int32(0), sky, gsky,
            features, 10,
        )
        return jnp.sum(outs[0]) + jnp.sum(outs[6])

    results["fused_shade_only"] = timed(
        lambda i: f_shade(jnp.float32(i * 1e-6)), args.repeats
    )

    @jax.jit
    def f_gsplit(e):
        t, attrs = fp.nearest_hit_attrs(tables, ro + e, rd, tm, features, scene)
        planes = [attrs[:, k] for k in range(attrs.shape[1])]
        tot = jnp.sum(t)
        for p in planes:
            tot = tot + jnp.sum(p)
        return tot

    results["gather_split"] = timed(
        lambda i: f_gsplit(jnp.float32(i * 1e-6)), args.repeats
    )

    @jax.jit
    def f_gtrans(e):
        t, attrs = fp.nearest_hit_attrs(tables, ro + e, rd, tm, features, scene)
        Rg, Kg = attrs.shape
        a3 = attrs.reshape(Rg // 128, 128, Kg).transpose(0, 2, 1)
        return jnp.sum(t) + jnp.sum(a3)

    results["gather_transpose"] = timed(
        lambda i: f_gtrans(jnp.float32(i * 1e-6)), args.repeats
    )

    floor = results["dispatch_floor"]
    for name, secs in results.items():
        print(
            json.dumps(
                {
                    "bench": f"bounce_breakdown/{name}",
                    "rays": R,
                    "ms": round(secs * 1e3, 2),
                    "ms_minus_floor": round((secs - floor) * 1e3, 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
