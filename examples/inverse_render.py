"""Inverse rendering demo — BASELINE.json config 5.

Optimizes sphere positions and albedos to match a target image rendered
from a perturbed scene, with the forward render data-parallel over all
available devices and parameter gradients all-reduced across the mesh.

Run on any backend:
    python examples/inverse_render.py --steps 40 --size 32
On CPU with a virtual 8-device mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/inverse_render.py
(under this image's sitecustomize, the env var alone is overridden; the
script re-asserts it like tests/conftest.py does.)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--out", default="inverse_result.png")
    ap.add_argument(
        "--checkpoint", default=None,
        help="TrainState checkpoint path (.npz): resume from it if present, "
             "save every --checkpoint-every steps and at exit. Resume is "
             "bit-exact (params, optimizer state, step, RNG key).",
    )
    ap.add_argument("--checkpoint-every", type=int, default=10)
    ap.add_argument(
        "--geometry", action="store_true",
        help="Also optimize sphere centers (enables silhouette edge "
             "sampling: interior autodiff alone sees zero gradient from "
             "pure occlusion changes — ops/silhouette.py adds the boundary "
             "term, BASELINE.json north star).",
    )
    args = ap.parse_args()

    if "cpu" in os.environ.get("JAX_PLATFORMS", "") and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.parallel import mesh as pmesh
    from pathtrace_tpu.parallel.inverse import make_inverse_renderer
    from pathtrace_tpu.render import film

    mesh = pmesh.make_render_mesh()
    print(f"mesh: {mesh.devices.size} device(s) [{jax.default_backend()}]")

    scene, cam = presets.small(aspect=1.0)
    if args.geometry:
        trainable = lambda p: ("textures.color" in p) or (p == "spheres.center")
    else:
        trainable = lambda p: "textures.color" in p
    renderer, state, names = make_inverse_renderer(
        scene, cam, args.size, args.size, samples=args.samples,
        max_depth=args.depth, mesh=mesh, learning_rate=args.lr,
        trainable=trainable, silhouette=args.geometry,
    )
    print(f"trainable parameters: {names}")

    key = jax.random.PRNGKey(0)
    target = renderer.render(state.params, key)

    # perturb the albedos (and optionally geometry)
    perturbed = list(state.params)
    for i, name in enumerate(names):
        if name == "spheres.center":
            perturbed[i] = perturbed[i] + jnp.asarray([0.05, 0.0, 0.0])
        if name == "textures.color":
            perturbed[i] = jnp.clip(perturbed[i] + 0.2, 0.0, 1.0)
    state = renderer.init(perturbed)

    from pathtrace_tpu.utils import checkpoint as ckpt

    start_step = 0
    if args.checkpoint:
        resumed = ckpt.try_load_train(args.checkpoint, state)
        if resumed is not None:
            state, saved_key = resumed
            start_step = int(state.step)
            if saved_key is not None:
                key = jnp.asarray(saved_key)
            print(f"resumed from {args.checkpoint} at step {start_step}")

    loss0 = None
    for step in range(start_step, args.steps):
        state, loss = renderer.train_step(state, target, key)
        loss = float(loss)
        loss0 = loss0 or loss
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:4d}  loss {loss:.6f}")
        if args.checkpoint and (step + 1) % args.checkpoint_every == 0:
            ckpt.save_train(args.checkpoint, state, key)
    if args.checkpoint:
        ckpt.save_train(args.checkpoint, state, key)

    if loss0 is not None:
        print(f"loss: {loss0:.6f} -> {loss:.6f} ({loss0 / max(loss, 1e-12):.1f}x reduction)")
    img = renderer.render(state.params, key)
    side_by_side = np.concatenate([np.asarray(target), np.asarray(img)], axis=1)
    film.save_frame_png(args.out, side_by_side)
    print(f"wrote {args.out} (target | optimized)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
