"""Single-ray debug tracing — the ``--print`` analog.

The reference's ``-X`` mode shoots the camera-center ray and prints every
BVH node visit (reference ``src/offline.rs:5-14``,
``src/collision/bvh.rs:96-224``). The wavefront analog traces one ray and
prints, per bounce: each primitive kind's nearest candidate, the winning
hit (t/point/normal/material), and the scatter decision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.camera import Camera, get_rays
from pathtrace_tpu.config import MAX_T
from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.ops import bsdf
from pathtrace_tpu.ops import intersect as isect


def print_bvh_ray_trace(scene: Scene, camera: Camera, seed: int = 0,
                        log=print) -> None:
    """Print the whole-scene BVH descent of the camera-center ray.

    Structural analog of the reference's ``print_ray_hit`` recursion
    (reference ``src/collision/bvh.rs:96-224``): every node visited is
    logged Miss/Hit with its id (leaves also test their primitive), and a
    visit census follows (the ``BVHStats`` analog, ``bvh.rs:226-265``).
    """
    import jax.numpy as jnp

    from pathtrace_tpu.models.bvh import _leaf_candidate, build_scene_bvh

    features = SceneFeatures.from_scene(scene)
    flat, stats, offsets = build_scene_bvh(scene, seed=seed)
    log(f"bvh stats: {stats}")

    u = jax.random.uniform(jax.random.PRNGKey(seed), (1, 3))
    ro, rd, time = get_rays(camera, jnp.asarray([0.5]), jnp.asarray([0.5]), u)
    ro_np = np.asarray(ro)[0]
    rd_np = np.asarray(rd)[0]
    log(f"bvh trace: center ray origin={ro_np} dir={rd_np}")

    rcp = 1.0 / np.where(np.abs(rd_np) < 1e-12, 1e-12, rd_np)
    med_u = jnp.full((1, scene.media.count), 0.5)
    census = {"visited": 0, "miss": 0, "leaf_tests": 0, "leaf_hits": 0}

    def node_hit(i: int) -> bool:
        d0 = (flat.bb_min[i] - ro_np) * rcp
        d1 = (flat.bb_max[i] - ro_np) * rcp
        tn = np.minimum(d0, d1).max()
        tf = np.maximum(d0, d1).min()
        return bool(tf > max(tn, 1e-3))

    def walk(i: int, depth: int) -> None:
        census["visited"] += 1
        prim = int(flat.prim[i])
        tag = f"leaf(prim {prim})" if prim >= 0 else "inner"
        indent = "  " * depth
        if not node_hit(i):
            census["miss"] += 1
            log(f"{indent}node {i} {tag}: Miss")
            return
        if prim < 0:
            log(f"{indent}node {i} {tag}: Hit")
            left = i + 1
            walk(left, depth + 1)
            walk(int(flat.escape[left]), depth + 1)
            return
        census["leaf_tests"] += 1
        cand = _leaf_candidate(
            jax.tree_util.tree_map(jnp.asarray, scene),
            jnp.asarray([prim], jnp.int32), offsets, features,
            ro, rd, time, med_u,
            jnp.asarray([MAX_T], jnp.float32), 1e-3,
        )
        t = float(np.asarray(cand)[0])
        if t < MAX_T:
            census["leaf_hits"] += 1
            log(f"{indent}node {i} {tag}: Hit t={t:.6f}")
        else:
            log(f"{indent}node {i} {tag}: prim Miss")

    walk(0, 0)
    log(
        f"bvh visit census: visited={census['visited']}"
        f" aabb_miss={census['miss']} leaf_tests={census['leaf_tests']}"
        f" leaf_hits={census['leaf_hits']}"
    )


def print_ray_trace(
    scene: Scene,
    camera: Camera,
    max_depth: int,
    seed: int = 0,
    use_bvh: bool = False,
    log=print,
) -> None:
    """Trace the camera-center ray, logging every bounce.

    Runs on the CPU backend: this is one ray of eager per-op dispatch —
    diagnostics, not throughput — and per-op tunnel round-trips to the
    remote TPU would take minutes for zero benefit.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # camera/scene leaves may already live on the accelerator; pull
        # them over so eager ops don't mix committed devices
        scene = jax.device_put(scene, cpu)
        camera = jax.device_put(camera, cpu)
        _print_ray_trace_impl(scene, camera, max_depth, seed, use_bvh, log)


def _print_ray_trace_impl(scene, camera, max_depth, seed, use_bvh, log):
    if use_bvh:
        # -X -B: descend the BVH first (reference offline.rs:5-14 routes
        # --print through BVHNode::print_ray_hit for BVH scenes)
        print_bvh_ray_trace(scene, camera, seed=seed, log=log)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(jax.random.fold_in(key, 0), (1, 3))
    ro, rd, time = get_rays(camera, jnp.asarray([0.5]), jnp.asarray([0.5]), u)

    log(f"center ray: origin={np.asarray(ro)[0]} dir={np.asarray(rd)[0]}")
    for depth in range(max_depth + 1):
        kb = jax.random.fold_in(key, depth)
        med_u = jax.random.uniform(
            jax.random.fold_in(kb, 0), (1, scene.media.count)
        )
        scat_u = jax.random.uniform(jax.random.fold_in(kb, 1), (1, 4))

        candidates = {}
        if features.has_spheres:
            t, i = isect.sphere_nearest(scene.spheres, ro, rd, time)
            candidates["sphere"] = (float(t[0]), int(i[0]))
        if features.has_rects:
            t, i = isect.rect_nearest(scene.rects, ro, rd)
            candidates["rect"] = (float(t[0]), int(i[0]))
        if features.has_boxes:
            t, i = isect.box_nearest(scene.boxes, ro, rd)
            candidates["box"] = (float(t[0]), int(i[0]))
        if features.has_media:
            t, i = isect.media_nearest(scene.media, ro, rd, med_u)
            candidates["media"] = (float(t[0]), int(i[0]))

        for kind, (t, i) in candidates.items():
            status = f"Hit t={t:.6f} idx={i}" if t < MAX_T else "Miss"
            log(f"  depth {depth}: {kind:7s} {status}")

        rec = isect.intersect_scene(
            scene, ro, rd, time, med_u, features=features
        )
        if not bool(rec.hit[0]):
            log(f"  depth {depth}: escaped to sky")
            break
        sc = bsdf.scatter(scene, rec, rd, scat_u, features=features)
        log(
            f"  depth {depth}: HIT t={float(rec.t[0]):.6f}"
            f" p={np.asarray(rec.point)[0]} n={np.asarray(rec.normal)[0]}"
            f" mat={int(rec.mat_id[0])}"
            f" scatter={'yes' if bool(sc.ok[0]) else 'absorbed'}"
        )
        if not bool(sc.ok[0]):
            break
        ro = rec.point
        rd = sc.direction
