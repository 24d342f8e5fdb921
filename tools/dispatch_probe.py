"""Measure per-dispatch overhead in PIPELINED mode on this platform.

PERF.md records ~40-50 ms per jit call measured WITH a readback. What
matters for the frame ladder is the *sustained* cost of a dispatch when
many are queued back-to-back and only the last result is read: if
submission is asynchronous the per-call cost collapses to ~0 and fusing
dispatches is pointless; if submission itself serializes on the tunnel,
every dispatch in the frame loop pays it and dispatch-count reduction is
the main perf lever.

Probes (all timed to ONE final np.asarray, inputs varied per call):
  chain_trivial_N   N chained adds on a [1M] plane (device work ~0.25 ms)
  chain_2prog_N     alternate two distinct programs (rules out same-exe
                    fast paths)
  single_trivial    1 call + readback (the PERF.md number, for reference)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    x = jnp.arange(1 << 20, dtype=jnp.float32)

    @jax.jit
    def f(x, e):
        return x * 1.0000001 + e

    @jax.jit
    def g(x, e):
        return x * 0.9999999 - e

    # warm
    np.asarray(f(x, 0.1)[:4])
    np.asarray(g(x, 0.1)[:4])

    def chain(n, alternate, i0):
        y = x
        t0 = time.perf_counter()
        for i in range(n):
            e = jnp.float32((i0 + i) * 1e-7)
            y = g(y, e) if (alternate and i % 2) else f(y, e)
        np.asarray(y[:4])
        return time.perf_counter() - t0

    results = {}
    # single call + readback
    best = min(chain(1, False, 100 + k) for k in range(3))
    results["single_trivial_ms"] = round(best * 1e3, 1)
    for n in (8, 32):
        best = min(chain(n, False, 1000 * n + k * 100) for k in range(3))
        results[f"chain_trivial_{n}_ms_per_call"] = round(best * 1e3 / n, 1)
        best = min(chain(n, True, 5000 * n + k * 100) for k in range(3))
        results[f"chain_2prog_{n}_ms_per_call"] = round(best * 1e3 / n, 1)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
