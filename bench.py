"""Headline benchmark: Mrays/s on the Shirley cover scene.

Workload: `random_spheres` (~488 spheres — reference bench fixture scene,
reference src/bench.rs:17-26) at the reference's default film
1280x720 @ 4 spp, depth 10 (reference src/main.rs:79-87), full wavefront
render including BSDF + bounce sweep, steady state after jit warmup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), and the
Rust toolchain is unavailable in this image, so the baseline is a nominal
estimate of the reference's throughput on a modern many-core CPU
(~150 Mrays/s: rayon over ~32 cores with SSE4.1/AVX2 SoA kernels, extrapolated
from the ToyPathTracer family of implementations this repo mirrors).
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_MRAYS = 150.0  # nominal reference-on-CPU estimate (see docstring)


def main() -> int:
    import jax

    # persistent compile cache (compiles are minutes on this TPU)
    from pathtrace_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from pathtrace_tpu.models import presets
    from pathtrace_tpu.models.types import SceneFeatures
    from pathtrace_tpu.render.frame import render_frame_jit

    width, height, samples, max_depth = 1280, 720, 4, 10
    scene, camera = presets.random_spheres(aspect=width / height)
    features = SceneFeatures.from_scene(scene)
    scene = jax.device_put(scene)

    use_pallas = jax.default_backend() == "tpu"
    try:
        if use_pallas:
            from pathtrace_tpu.ops import intersect_pallas  # noqa: F401
    except Exception:
        use_pallas = False

    # fixed-size chunked launches keep the compiled program independent of
    # film size (compile once, render any resolution) and let finished
    # chunks early-exit the bounce sweep independently
    ray_chunk = 1 << 19

    def run(frame):
        key = jax.random.PRNGKey(frame)
        img, rays = render_frame_jit(
            scene, camera, width, height, samples, max_depth, key,
            use_pallas=use_pallas, features=features, ray_chunk=ray_chunk,
        )
        return img, rays

    # warmup/compile
    img, rays = run(0)
    img.block_until_ready()

    # steady state: a few frames, best-of to shed scheduling noise
    n_frames = 4
    best = 0.0
    total_rays = 0
    for f in range(1, n_frames + 1):
        t0 = time.perf_counter()
        img, rays = run(f)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        r = int(rays)
        total_rays += r
        best = max(best, r / 1e6 / dt)

    print(
        json.dumps(
            {
                "metric": "render_throughput_random_spheres_1280x720x4spp_d10",
                "value": round(best, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(best / BASELINE_MRAYS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
