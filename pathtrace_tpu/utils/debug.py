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


def print_ray_trace(
    scene: Scene,
    camera: Camera,
    max_depth: int,
    seed: int = 0,
    log=print,
) -> None:
    """Trace the camera-center ray, logging every bounce."""
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
