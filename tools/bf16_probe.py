"""Probe: does a bf16 sphere sweep beat the f32 one on this device's VPU?

Times the closest-hit sweep (same tiling as ops/intersect_pallas.py) in
f32 vs bf16 arithmetic. bf16 doubles MXU flops on real TPUs; on the VPU
the win (if any) comes from halved VMEM traffic/register pressure —
measure before building the f32-refinement machinery around it.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    TILE_R, TILE_N = 512, 128
    R, N = 1 << 20, 640
    n_tiles = N // TILE_N

    def make_kernel(dtype):
        def kernel(rox, roy, roz, rdx, rdy, rdz, cx, cy, cz, c2, t_out):
            ro_x = rox[:].astype(dtype)
            ro_y = roy[:].astype(dtype)
            ro_z = roz[:].astype(dtype)
            rd_x = rdx[:].astype(dtype)
            rd_y = rdy[:].astype(dtype)
            rd_z = rdz[:].astype(dtype)
            ro_d = ro_x * rd_x + ro_y * rd_y + ro_z * rd_z
            ro_ro = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z

            def tile_step(k, best):
                sl = pl.ds(k * TILE_N, TILE_N)
                scx = cx[0:1, sl].astype(dtype)
                scy = cy[0:1, sl].astype(dtype)
                scz = cz[0:1, sl].astype(dtype)
                sc2 = c2[0:1, sl].astype(dtype)
                b = ro_d - (scx * rd_x + scy * rd_y + scz * rd_z)
                c = ro_ro - 2.0 * (scx * ro_x + scy * ro_y + scz * ro_z) + sc2
                disc = b * b - c
                sq = jnp.sqrt(jnp.maximum(disc, 0).astype(jnp.float32))
                t = jnp.where(disc > 0, (-b).astype(jnp.float32) - sq, 1e30)
                return jnp.minimum(best, jnp.min(t, axis=1, keepdims=True))

            t_out[:] = jax.lax.fori_loop(
                0, n_tiles, tile_step,
                jnp.full((TILE_R, 1), 1e30, jnp.float32),
            )

        return kernel

    key = jax.random.PRNGKey(0)
    cols = [jax.random.uniform(jax.random.fold_in(key, i), (R, 1))
            for i in range(6)]
    rows = [jax.random.uniform(jax.random.fold_in(key, 9 + i), (1, N)) * 20
            for i in range(4)]

    ray_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((1, N), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def build(dtype):
        @jax.jit
        def run(e):
            out = pl.pallas_call(
                make_kernel(dtype),
                grid=(R // TILE_R,),
                in_specs=[ray_spec] * 6 + [sph_spec] * 4,
                out_specs=pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )(cols[0] + e, *cols[1:], *rows)
            return jnp.sum(out)

        return run

    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fn = build(dtype)
        out = fn(jnp.float32(0.0))
        np.asarray(out)
        best = float("inf")
        for i in range(1, 5):
            t0 = time.perf_counter()
            np.asarray(fn(jnp.float32(i * 1e-6)))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"bench": f"bf16_probe/{name}",
                          "ms": round(best * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
