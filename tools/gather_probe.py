"""Probe winner-attr fetch variants: which way of producing 24 packed [R]
planes from table[idx] is cheapest on this device?

  split24      table[idx] -> 24 column slices (the shipping approach)
  transpose    table[idx] -> one jnp.transpose -> [24, R]
  take_axis1   jnp.take(table.T, idx, axis=1) -> [24, R] directly
"""

from __future__ import annotations

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

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    R, N, K = 1 << 20, 640, 24
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (N, K))
    table_t = jnp.asarray(np.asarray(table).T.copy())
    idx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, N)

    results = {}

    @jax.jit
    def floor_fn(e):
        return e + 1.0

    results["floor"] = timed(lambda i: floor_fn(jnp.float32(i)))

    @jax.jit
    def split24(e):
        attrs = table[(idx + e) % N]
        tot = jnp.float32(0.0)
        for k in range(K):
            tot = tot + jnp.sum(attrs[:, k])
        return tot

    results["split24"] = timed(lambda i: split24(jnp.int32(i)))

    @jax.jit
    def transpose(e):
        attrs = table[(idx + e) % N].T  # [K, R]
        return sum(jnp.sum(attrs[k]) for k in range(K))

    results["transpose"] = timed(lambda i: transpose(jnp.int32(i)))

    @jax.jit
    def take_axis1(e):
        at = jnp.take(table_t, (idx + e) % N, axis=1)  # [K, R]
        return sum(jnp.sum(at[k]) for k in range(K))

    results["take_axis1"] = timed(lambda i: take_axis1(jnp.int32(i)))

    floor = results["floor"]
    for name, secs in results.items():
        print(json.dumps({
            "bench": f"gather_probe/{name}",
            "ms": round(secs * 1e3, 2),
            "ms_minus_floor": round((secs - floor) * 1e3, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
