"""Sub-op costs of the stream-compaction step at headline scale
(3.7M -> 2M): cumsum+scatter permutation build vs the plane gathers vs
the dense flush, plus the shipping compact for reference.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, repeats=3):
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

    R = 1280 * 720 * 4
    NEXT = 1 << 21
    key = jax.random.PRNGKey(0)
    alive = jax.random.uniform(key, (R,)) < 0.34
    planes = [jax.random.uniform(jax.random.fold_in(key, i), (R,))
              for i in range(3)]
    perm = jax.random.randint(jax.random.fold_in(key, 9), (NEXT,), 0, R)
    results = {}

    @jax.jit
    def floor_fn(e):
        return e + 1.0

    results["floor"] = timed(lambda i: floor_fn(jnp.float32(i)))

    @jax.jit
    def perm_build(e):
        a = alive ^ (e > 10)
        ai = a.astype(jnp.int32)
        pre = jnp.cumsum(ai)
        pos = jnp.where(a, pre - 1, pre[-1] + jnp.cumsum(1 - ai) - 1)
        order = jnp.zeros(R, jnp.int32).at[pos].set(
            jnp.arange(R, dtype=jnp.int32)
        )
        return order[NEXT - 1]

    results["perm_build_cumsum_scatter"] = timed(
        lambda i: perm_build(jnp.int32(i))
    )

    @jax.jit
    def gathers12(e):
        p = (perm + e) % R
        tot = jnp.float32(0.0)
        for k in range(12):
            tot = tot + jnp.sum(planes[k % 3][p])
        return tot

    results["gathers_12_planes"] = timed(lambda i: gathers12(jnp.int32(i)))

    from pathtrace_tpu.ops import fastpath as fp
    from pathtrace_tpu.render.compact_util import compact

    state = fp.FastStateP(
        rox=planes[0], roy=planes[1], roz=planes[2],
        rdx=planes[0], rdy=planes[1], rdz=planes[2], time=planes[0],
        rad_r=planes[0], rad_g=planes[1], rad_b=planes[2],
        thr_r=planes[0], thr_g=planes[1], thr_b=planes[2],
        alive=alive, lane=jnp.arange(R, dtype=jnp.uint32),
    )
    indices = jnp.arange(R, dtype=jnp.int32)

    def full(i):
        st = state._replace(rox=state.rox + i * 1e-6)
        o, s2, idx2 = compact(
            tuple(jnp.zeros(R) for _ in range(3)), st, indices, NEXT,
            radiance_fields=("rad_r", "rad_g", "rad_b"), identity=True,
        )
        return s2.rox[:8]

    results["full_compact"] = timed(full)

    floor = results["floor"]
    for name, secs in results.items():
        print(json.dumps({
            "bench": f"compact_probe/{name}",
            "ms": round(secs * 1e3, 2),
            "ms_minus_floor": round((secs - floor) * 1e3, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
