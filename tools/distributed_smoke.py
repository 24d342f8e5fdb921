"""Two-process ``jax.distributed`` validation on CPU devices.

SURVEY.md §4 calls for multi-host tests without TPU pods: this script runs
the SAME code path the CLI's ``--distributed`` flag uses
(``jax.distributed.initialize`` -> global mesh -> sharded differentiable
render -> parameter gradient all-reduce) across two OS processes with 4
virtual CPU devices each, then checks that

1. both processes agree bitwise on the replicated (psum'd) loss/gradients;
2. the 2-process result matches a single-process 8-device run of the same
   computation (the gradient all-reduce rides the cross-process channel —
   DCN on a real pod — instead of intra-process "ICI", and must not change
   the math).

Usage:
  python tools/distributed_smoke.py            # orchestrate everything
  python tools/distributed_smoke.py --worker I --num-processes N \
      --coordinator HOST:PORT --out OUT.npz    # internal: one process
Prints one JSON line; exit 0 on pass, 1 on fail, 3 on skip (platform
cannot run multi-process CPU collectives).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

R = 1024
DEPTH = 4
LOCAL_DEVICES = 4


def _compute(out_path: str) -> None:
    """Sharded differentiable render + scene-parameter grad (any #procs)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.parallel.mesh import RAY_AXIS, make_render_mesh, trace_sharded

    scene, cam = presets.small(aspect=1.0)
    feats = SceneFeatures.from_scene(scene)
    mesh = make_render_mesh()

    # deterministic rays, identical on every process
    key = jax.random.PRNGKey(0)
    s = jax.random.uniform(jax.random.fold_in(key, 0), (R,))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (R,))
    u = jax.random.uniform(jax.random.fold_in(key, 2), (R, 3))
    from pathtrace_tpu.camera import get_rays

    ro, rd, tm = get_rays(cam, s, t, u)
    ro, rd, tm = np.asarray(ro), np.asarray(rd), np.asarray(tm)

    ray_sh = NamedSharding(mesh, P(RAY_AXIS))
    rep_sh = NamedSharding(mesh, P())

    def globalize(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    ro_g = globalize(ro, ray_sh)
    rd_g = globalize(rd, ray_sh)
    tm_g = globalize(tm, ray_sh)
    scene_g = jax.tree_util.tree_map(lambda x: globalize(x, rep_sh), scene)
    tkey = jax.random.PRNGKey(7)

    @jax.jit
    def loss_and_grad(sc, ro_, rd_, tm_):
        def loss_fn(color):
            sc2 = sc.replace_textures_color(color) if hasattr(
                sc, "replace_textures_color") else None
            # swap the differentiable leaf into the pytree
            import dataclasses

            tex = dataclasses.replace(sc.textures, color=color)
            sc2 = dataclasses.replace(sc, textures=tex)
            rad, cnt = trace_sharded(
                sc2, ro_, rd_, tm_, tkey, DEPTH, mesh,
                features=feats, differentiable=True,
            )
            return jnp.mean(rad), cnt

        (loss, cnt), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            sc.textures.color
        )
        return loss, cnt, grad

    loss, cnt, grad = loss_and_grad(scene_g, ro_g, rd_g, tm_g)
    np.savez(
        out_path,
        loss=np.asarray(loss),
        ray_count=np.asarray(cnt),
        grad=np.asarray(grad),
        n_devices=jax.device_count(),
        n_processes=jax.process_count(),
    )


def worker(args) -> int:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES} "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.worker,
    )
    assert jax.device_count() == LOCAL_DEVICES * args.num_processes
    _compute(args.out)
    return 0


def single(args) -> int:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES * 2} "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    _compute(args.out)
    return 0


def orchestrate() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    tmp = tempfile.mkdtemp(prefix="ptpu_dist_")
    outs = [os.path.join(tmp, f"p{i}.npz") for i in range(2)]
    ref_out = os.path.join(tmp, "single.npz")

    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i),
             "--num-processes", "2", "--coordinator", f"localhost:{port}",
             "--out", outs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors="replace"))
    if any(p.returncode != 0 for p in procs):
        blob = "\n".join(logs)
        if ("collectives" in blob or "gloo" in blob.lower()
                or "Unimplemented" in blob or "initialize" in blob):
            print(json.dumps({"bench": "distributed_smoke", "skipped": True,
                              "reason": blob[-400:]}))
            return 3
        print(json.dumps({"bench": "distributed_smoke", "pass": False,
                          "reason": blob[-800:]}))
        return 1

    ref = subprocess.run(
        [sys.executable, __file__, "--single", "--out", ref_out],
        capture_output=True, timeout=600,
    )
    if ref.returncode != 0:
        print(json.dumps({"bench": "distributed_smoke", "pass": False,
                          "reason": ref.stdout.decode()[-800:]}))
        return 1

    a, b = np.load(outs[0]), np.load(outs[1])
    r = np.load(ref_out)
    ok = True
    checks = {}
    # both processes hold the identical replicated results
    checks["procs_bitwise_equal"] = bool(
        np.array_equal(a["loss"], b["loss"])
        and np.array_equal(a["grad"], b["grad"])
        and a["ray_count"] == b["ray_count"]
    )
    # 2-process == 1-process (cross-process all-reduce changes nothing)
    checks["loss_matches_single"] = bool(
        np.allclose(a["loss"], r["loss"], rtol=1e-5, atol=1e-6)
    )
    checks["grad_matches_single"] = bool(
        np.allclose(a["grad"], r["grad"], rtol=1e-4, atol=1e-6)
    )
    checks["ray_count_matches"] = bool(a["ray_count"] == r["ray_count"])
    checks["saw_8_devices"] = int(a["n_devices"]) == 8
    checks["saw_2_processes"] = int(a["n_processes"]) == 2
    ok = all(checks.values())
    print(json.dumps({"bench": "distributed_smoke", "pass": ok, **checks}))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.worker is not None:
        return worker(args)
    if args.single:
        return single(args)
    return orchestrate()


if __name__ == "__main__":
    raise SystemExit(main())
