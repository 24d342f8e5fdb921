"""Probe attr-delivery layouts for the fused shade kernel.

The shipping path gathers winner rows (``table[idx]`` -> [R, K]) and then
splits 24-48 columns into packed (rows, 128) planes — measured ~13 ms per
1M rays (PERF.md). Variants that might kill the split cost:

  split        gather -> K column slices -> K (rows,128) planes  [shipping]
  minor_t      gather -> reshape (rows,128,K) -> transpose -> (rows,K,128),
               kernel slices middle dim (sublane-strided reads)
  major_t      gather -> transpose (K,R) -> reshape (K,rows,128),
               kernel indexes dim 0 (contiguous tile reads)

Each variant feeds a tiny pallas kernel that touches every attr plane the
way the shade kernel does (sum of all K planes), so kernel-side access
cost is included. Host-readback timing, varied input per iteration.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, repeats=4):
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    R, N, K = 1 << 20, 640, 24
    rows = R // 128
    bs = 64
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (N, K))
    idx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, N)
    interp = jax.default_backend() != "tpu"

    results = {}

    @jax.jit
    def floor_fn(e):
        return e + 1.0

    results["floor"] = timed(lambda i: floor_fn(jnp.float32(i)))

    # --- variant: split (shipping) -------------------------------------
    def k_split(*refs):
        acc = refs[0][...]
        for r in refs[1:-1]:
            acc = acc + r[...]
        refs[-1][...] = acc

    pspec = pl.BlockSpec((bs, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def split(e):
        attrs = table[(idx + e) % N]
        planes = [attrs[:, k].reshape(rows, 128) for k in range(K)]
        out = pl.pallas_call(
            k_split,
            grid=(rows // bs,),
            in_specs=[pspec] * K,
            out_specs=pspec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            interpret=interp,
        )(*planes)
        return jnp.sum(out)

    results["split"] = timed(lambda i: split(jnp.int32(i)))

    # --- variant: minor transpose, (rows, K, 128) ----------------------
    def k_minor(a_ref, o_ref):
        acc = a_ref[:, 0, :]
        for k in range(1, K):
            acc = acc + a_ref[:, k, :]
        o_ref[...] = acc

    aspec_minor = pl.BlockSpec(
        (bs, K, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def minor_t(e):
        attrs = table[(idx + e) % N]
        a3 = attrs.reshape(rows, 128, K).transpose(0, 2, 1)
        out = pl.pallas_call(
            k_minor,
            grid=(rows // bs,),
            in_specs=[aspec_minor],
            out_specs=pspec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            interpret=interp,
        )(a3)
        return jnp.sum(out)

    results["minor_t"] = timed(lambda i: minor_t(jnp.int32(i)))

    # --- variant: major transpose, (K, rows, 128) ----------------------
    def k_major(a_ref, o_ref):
        acc = a_ref[0]
        for k in range(1, K):
            acc = acc + a_ref[k]
        o_ref[...] = acc

    aspec_major = pl.BlockSpec(
        (K, bs, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def major_t(e):
        attrs = table[(idx + e) % N]
        a3 = attrs.T.reshape(K, rows, 128)
        out = pl.pallas_call(
            k_major,
            grid=(rows // bs,),
            in_specs=[aspec_major],
            out_specs=pspec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            interpret=interp,
        )(a3)
        return jnp.sum(out)

    results["major_t"] = timed(lambda i: major_t(jnp.int32(i)))

    floor = results["floor"]
    for name, secs in results.items():
        print(json.dumps({
            "bench": f"split_probe/{name}",
            "ms": round(secs * 1e3, 2),
            "ms_minus_floor": round((secs - floor) * 1e3, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
