"""Frame-level breakdown at headline scale (3.7M rays): where does the
whole-frame time go beyond the per-bounce cost?

Phases timed independently with host readbacks (PERF.md discipline:
vary inputs, time to np.asarray):

  raygen          generate_primary_rays + reshape
  bounce_3p7M     one fused bounce group (g=1) at full wavefront
  alive_count     jnp.sum(alive) device->host readback
  compact_sort    the shipping cumsum-partition lane compaction 3.7M -> 2M
  final_mean      radiance reshape + sample mean
  whole_frame     render_frame_fast end-to-end (reference point)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, repeats=3):
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
    import jax
    import jax.numpy as jnp

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.ops import fastpath as fp
    from pathtrace_tpu.render.compact_util import compact as cu_compact

    W, H, S = 1280, 720, 4
    R = W * H * S
    scene, cam = presets.random_spheres(aspect=W / H)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)
    tables, sky, gsky = fp.prep_tables(scene, features)

    results = {}

    @jax.jit
    def raygen(f):
        key = jax.random.PRNGKey(f)
        from pathtrace_tpu.render.frame import generate_primary_rays

        ro, rd, t = generate_primary_rays(cam, W, H, S, key)
        return jnp.sum(ro) + jnp.sum(rd)

    results["raygen"] = timed(lambda i: raygen(i))

    key = jax.random.PRNGKey(0)
    ro = jax.random.uniform(key, (R, 3)) * 24 - 12
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jnp.zeros(R)
    state = fp.FastStateP(
        rox=ro[:, 0], roy=ro[:, 1], roz=ro[:, 2],
        rdx=rd[:, 0], rdy=rd[:, 1], rdz=rd[:, 2], time=tm,
        rad_r=jnp.zeros(R), rad_g=jnp.zeros(R), rad_b=jnp.zeros(R),
        thr_r=jnp.ones(R), thr_g=jnp.ones(R), thr_b=jnp.ones(R),
        alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
    )
    seed = jnp.int32(7)

    @jax.jit
    def bounce(st, e):
        st = st._replace(rox=st.rox + e)
        st, segs = fp._bounce_group_fused_first(
            tables, sky, gsky, st, seed, jnp.int32(0), 10, features,
            fp._scene_prims(scene, features), group=1,
        )
        return jnp.sum(st.rad_r) + jnp.sum(st.rdx)

    results["bounce_3p7M"] = timed(
        lambda i: bounce(state, jnp.float32(i * 1e-6))
    )

    @jax.jit
    def alive_count(st, e):
        return jnp.sum(st.alive & (st.rox + e > -100))

    results["alive_count"] = timed(
        lambda i: alive_count(state, jnp.float32(i * 1e-6))
    )

    out_rad = jnp.zeros((R, 3))
    indices = jnp.arange(R, dtype=jnp.int32)
    half_alive = state._replace(alive=jnp.arange(R) % 2 == 0)
    next_size = 1 << 21

    def compact_run(i):
        st = half_alive._replace(rox=half_alive.rox + i * 1e-6)
        # 3-plane radiance form takes a TUPLE of [R] planes (compact_util
        # _flush zips them); a [R,3] array here would zip its first 3 rows
        # and skip the real scatter-flush cost
        o, s2, idx2 = cu_compact(
            (jnp.zeros(R), jnp.zeros(R), jnp.zeros(R)), st, indices,
            next_size, radiance_fields=("rad_r", "rad_g", "rad_b"),
        )
        return np.asarray(s2.rox[:8])

    compact_run(0)
    best = float("inf")
    for i in range(1, 4):
        t0 = time.perf_counter()
        compact_run(i)
        best = min(best, time.perf_counter() - t0)
    results["compact_sort"] = best

    @jax.jit
    def final_mean(e):
        img = (out_rad + e).reshape(H, W, S, 3).mean(axis=2)
        return jnp.sum(img)

    results["final_mean"] = timed(lambda i: final_mean(jnp.float32(i * 1e-6)))

    from pathtrace_tpu.ops.fastpath import render_frame_fast

    def whole(i):
        img, rays = render_frame_fast(
            scene, cam, W, H, S, 10, jax.random.PRNGKey(i), i, features,
        )
        return np.asarray(img)

    whole(0)
    best = float("inf")
    for i in range(1, 4):
        t0 = time.perf_counter()
        whole(i)
        best = min(best, time.perf_counter() - t0)
    results["whole_frame"] = best

    for name, secs in results.items():
        print(json.dumps({
            "bench": f"frame_breakdown/{name}",
            "ms": round(secs * 1e3, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
