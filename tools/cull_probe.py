"""Probe: in-kernel per-tile AABB culling vs plain brute sweep on TPU.

Times sphere_nearest_pallas_cols cull=False/True on the headline scene
(random_spheres, 512 padded spheres = 4 tiles) at 1M rays for two ray
populations:

  primary    coherent camera rays (pixel-ordered 512-ray blocks — tight
             frusta, should skip far tiles)
  scattered  uniform random origins/directions in the scene bounds
             (worst case — blocks want most tiles)

PERF.md discipline: vary an input per iteration, time to np.asarray.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, repeats=4):
    np.asarray(fn(0))
    best = float("inf")
    for i in range(1, repeats + 1):
        t0 = time.perf_counter()
        np.asarray(fn(i))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas_cols
    from pathtrace_tpu.render.frame import generate_primary_rays

    preset = sys.argv[1] if len(sys.argv) > 1 else "random_spheres"
    W, H, S = 512, 512, 4
    R = W * H * S  # 1M rays
    scene, cam = getattr(presets, preset)(aspect=W / H)
    sph = jax.device_put(scene.spheres)
    print(json.dumps({"bench": f"cull_probe/preset", "name": preset,
                      "n_spheres": int(scene.spheres.center.shape[0])}),
          flush=True)

    ro, rd, _t = generate_primary_rays(cam, W, H, S, jax.random.PRNGKey(0))
    ro = ro.reshape(R, 3)
    rd = rd.reshape(R, 3)

    rng = np.random.default_rng(0)
    c = np.asarray(scene.spheres.center)
    c = c[np.asarray(scene.spheres.mask) & (np.abs(c).max(axis=1) < 1e3)]
    lo, hi = c.min(axis=0) - 1.0, c.max(axis=0) + 1.0
    sro = jnp.asarray(rng.uniform(lo, hi, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    srd = jnp.asarray(d, jnp.float32)
    tm = jnp.zeros(R)

    results = {}
    for name, (o, dd) in (("primary", (ro, rd)), ("scattered", (sro, srd))):
        for cull in (False, True):
            def run(i, o=o, dd=dd, cull=cull):
                t, idx = sphere_nearest_pallas_cols(
                    sph, o[:, 0] + i * 1e-6, o[:, 1], o[:, 2],
                    dd[:, 0], dd[:, 1], dd[:, 2], tm,
                    has_motion=False, cull=cull,
                )
                return t[:8]

            results[f"{name}/cull={cull}"] = timed(run)

    # parity spot check on device
    t0, i0 = sphere_nearest_pallas_cols(
        sph, ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
        tm, has_motion=False, cull=False)
    t1, i1 = sphere_nearest_pallas_cols(
        sph, ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
        tm, has_motion=False, cull=True)
    ok = bool(np.array_equal(np.asarray(t0), np.asarray(t1))
              and np.array_equal(np.asarray(i0), np.asarray(i1)))

    for k, v in results.items():
        print(json.dumps({"bench": f"cull_probe/{k}", "ms": round(v * 1e3, 1)}),
              flush=True)
    print(json.dumps({"bench": "cull_probe/parity", "ok": ok}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
