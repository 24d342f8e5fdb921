"""Inverse-rendering train-step wall: fast-diff forward vs general.

Times `InverseRenderer.train_step` (differentiable forward + backward +
adam) with the sharded fast path (trace_fast_diff under shard_map) vs the
general integrator, same film/spp/mesh. Honest timing: varied step key,
time to a host readback of the loss.

Usage: python tools/train_bench.py [--width 256] [--spp 4] [--steps 4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--preset", default="small")
    args = ap.parse_args()

    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.parallel import mesh as pmesh
    from pathtrace_tpu.parallel.inverse import make_inverse_renderer

    scene, cam = presets.from_name(
        args.preset, aspect=args.width / args.height, seed=0
    )
    mesh = pmesh.make_render_mesh(jax.devices())
    key = jax.random.PRNGKey(0)

    for label, fast in (("general", False), ("fast-diff", True)):
        renderer, state, names = make_inverse_renderer(
            scene, cam, args.width, args.height, samples=args.spp,
            max_depth=args.depth, mesh=mesh, use_fast_path=fast,
            trainable=lambda p: p == "spheres.center",
        )
        target = jnp.zeros((args.height, args.width, 3), jnp.float32)
        # compile + warm
        try:
            state, loss = renderer.train_step(state, target, key)
            float(loss)
        except Exception as e:  # noqa: BLE001 — OOM on the general path
            msg = str(e).splitlines()[0][:160]
            print(f"{label}: FAILED ({msg})", flush=True)
            continue
        ts = []
        for i in range(args.steps):
            t0 = time.perf_counter()
            state, loss = renderer.train_step(
                state, target, jax.random.fold_in(key, i + 1)
            )
            float(loss)  # host readback barrier
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        rays = args.width * args.height * args.spp
        print(f"{label}: best {best*1e3:.0f} ms/step "
              f"({rays/1e6:.2f}M primary rays fwd+bwd), "
              f"all={['%.0f' % (x*1e3) for x in ts]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
