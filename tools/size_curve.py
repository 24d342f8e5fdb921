"""Per-phase cost of the FUSED bounce vs wavefront size.

The fused bounce's per-lane cost is ~2x higher at 3.7M lanes than at 1M
(tools/ladder_trace.py) — this probe finds WHICH phase bends: the Pallas
closest-hit sweep, the winner row gather, the (rows, K, 128) minor
transpose, or the fused shade kernel. ms are normalized per 1M lanes so a
flat curve = linear scaling.

Usage: python tools/size_curve.py [sizes...]  (default 512k 1M 2M 4M)
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
    from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas_cols
    from pathtrace_tpu.ops.shade_pallas import shade_bounce_planes

    sizes = [int(a) for a in sys.argv[1:]] or [
        1 << 19, 1 << 20, 1 << 21, 1 << 22,
    ]
    scene, cam = presets.random_spheres(aspect=16 / 9)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)
    tables, sky, gsky = fp.prep_tables(scene, features)
    prims = fp._scene_prims(scene, features)
    K = fp.attr_width(features)
    table = jnp.concatenate([tables[0], tables[1]], axis=0)
    NT = table.shape[0]

    for R in sizes:
        key = jax.random.PRNGKey(0)
        ro = jax.random.uniform(key, (R, 3)) * 24 - 12
        d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
        rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        state = fp.FastStateP(
            rox=ro[:, 0], roy=ro[:, 1], roz=ro[:, 2],
            rdx=rd[:, 0], rdy=rd[:, 1], rdz=rd[:, 2],
            time=jnp.zeros(R),
            rad_r=jnp.zeros(R), rad_g=jnp.zeros(R), rad_b=jnp.zeros(R),
            thr_r=jnp.ones(R), thr_g=jnp.ones(R), thr_b=jnp.ones(R),
            alive=jnp.ones(R, bool), lane=jnp.arange(R, dtype=jnp.uint32),
        )
        idx0 = jax.random.randint(jax.random.PRNGKey(2), (R,), 0, NT)
        t0 = jax.random.uniform(jax.random.PRNGKey(3), (R,)) * 20
        attrs3_0 = jnp.zeros((R // 128, K, 128))
        seed = jnp.int32(7)
        planes = {
            "rox": state.rox, "roy": state.roy, "roz": state.roz,
            "rdx": state.rdx, "rdy": state.rdy, "rdz": state.rdz,
            "time": state.time,
            "thr_r": state.thr_r, "thr_g": state.thr_g,
            "thr_b": state.thr_b,
            "rad_r": state.rad_r, "rad_g": state.rad_g,
            "rad_b": state.rad_b,
            "alive": state.alive.astype(jnp.float32),
            "lane": state.lane.astype(jnp.int32),
        }

        @jax.jit
        def hit_only(st, e):
            t, idx = sphere_nearest_pallas_cols(
                prims[0], st.rox + e, st.roy, st.roz,
                st.rdx, st.rdy, st.rdz, st.time,
                fp.MIN_T, fp.MAX_T, has_motion=False,
            )
            return t[:4] + idx[:4].astype(jnp.float32)

        @jax.jit
        def gather_only(idx, e):
            rows = table[(idx + jnp.int32(e)) % NT]
            return rows[:2, :2]

        @jax.jit
        def transpose_only(attrs, e):
            a = (attrs.reshape(-1, K) + e)
            a3 = a.reshape(R // 128, 128, K).transpose(0, 2, 1)
            return a3[:1, :1, :2]

        @jax.jit
        def shade_only(t, attrs3, pl, e):
            outs = shade_bounce_planes(
                t + e, attrs3, pl, seed, jnp.int32(1), sky, gsky,
                features, 10,
            )
            return outs[0][:4]

        @jax.jit
        def full_bounce(st, e):
            st = st._replace(rox=st.rox + e)
            st, segs = fp._bounce_group_fused_first(
                tables, sky, gsky, st, seed, jnp.int32(1), 10, features,
                prims, group=1,
            )
            return st.rad_r[:4] + st.rdx[:4]

        scale = 1e3 / (R / (1 << 20))
        rec = {"R": R}
        rec["hit"] = round(timed(
            lambda i: hit_only(state, jnp.float32(i * 1e-6))) * scale, 1)
        rec["gather"] = round(timed(
            lambda i: gather_only(idx0, i)) * scale, 1)
        attrs_flat = table[idx0]
        rec["transpose"] = round(timed(
            lambda i: transpose_only(attrs_flat, jnp.float32(i * 1e-6))
        ) * scale, 1)
        rec["shade"] = round(timed(
            lambda i: shade_only(t0, attrs3_0, planes, jnp.float32(i * 1e-6))
        ) * scale, 1)
        rec["full_bounce"] = round(timed(
            lambda i: full_bounce(state, jnp.float32(i * 1e-6))) * scale, 1)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
