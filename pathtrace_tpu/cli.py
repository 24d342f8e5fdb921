"""Command-line interface, mirroring the reference CLI surface.

Same flags as reference ``src/main.rs:29-87``:
``-W/--width -H/--height -S/--samples -D/--depth -R/--random -P/--preset
-F/--frames -B/--bvh -O/--offline -X/--print``, same defaults
(1280x720, 4 spp, depth 10, preset ``two_perlin_spheres``), plus
TPU-specific flags (``--pallas``, ``--checkpoint``, ``--out``).
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Optional, Sequence

import numpy as np

from pathtrace_tpu.config import Params
from pathtrace_tpu.models import presets
from pathtrace_tpu.models.types import SceneFeatures
from pathtrace_tpu.render import film
from pathtrace_tpu.render.progressive import render_progressive
from pathtrace_tpu.utils.debug import print_ray_trace


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pathtrace_tpu", description="TPU-native toy path tracer"
    )
    p.add_argument("-W", "--width", type=int, default=1280, help="Image width")
    p.add_argument("-H", "--height", type=int, default=720, help="Image height")
    p.add_argument("-S", "--samples", type=int, default=4, help="Samples per pixel")
    p.add_argument("-D", "--depth", type=int, default=10, help="Max bounces per ray")
    p.add_argument("-R", "--random", action="store_true", help="Use a random seed")
    p.add_argument(
        "-P", "--preset", default="two_perlin_spheres",
        help=f"Scene preset ({', '.join(presets.names())})",
    )
    p.add_argument(
        "-F", "--frames", type=int, default=None,
        help="Process a fixed number of frames and exit",
    )
    p.add_argument(
        "-B", "--bvh", action="store_true",
        help="Use bounding volume hierarchy instead of brute force",
    )
    p.add_argument(
        "-O", "--offline", action="store_true",
        help="Single-frame offline render (no progressive loop)",
    )
    p.add_argument(
        "-X", "--print", dest="print_trace", action="store_true",
        help="Debug print a single-ray trace and exit",
    )
    # TPU-specific
    p.add_argument("--pallas", action="store_true", help="Use the Pallas sphere kernel")
    p.add_argument(
        "--mode", default="auto",
        choices=["auto", "fast", "general", "compacted", "sharded"],
        help="Render path: fast (pallas + compaction) when supported, the "
             "general wavefront integrator, the general integrator under "
             "the host-driven compaction ladder, or sharded (data-parallel "
             "frames over every visible device via the mesh layer — fused "
             "fast shards when the scene class supports them)",
    )
    p.add_argument("--seed", type=int, default=0, help="Base RNG seed")
    p.add_argument(
        "--image", default=None, metavar="PNG",
        help="Image-texture file for presets that use one (e.g. the earth "
             "map — analog of the reference's media/earthmap.jpg load)",
    )
    p.add_argument("--out", default="output.png", help="Output PNG path")
    p.add_argument("--checkpoint", default=None, help="Checkpoint .npz path (resume if exists)")
    p.add_argument("--snapshot-every", type=int, default=0, help="Write PNG every N frames")
    p.add_argument(
        "--no-preview", action="store_true",
        help="Disable the live HTTP preview in interactive (non-offline) mode",
    )
    p.add_argument(
        "--preview-port", type=int, default=0,
        help="Port for the live preview server (0 = ephemeral)",
    )
    p.add_argument(
        "--profile-dir", default=None,
        help="Capture a jax.profiler trace of the render into this directory",
    )
    p.add_argument(
        "--distributed", action="store_true",
        help="Initialize jax.distributed for multi-host execution "
             "(reads JAX coordinator env vars)",
    )
    p.add_argument(
        "--group", type=int, default=None, metavar="N",
        help="Bounces per dispatch on the fast path (default: auto). "
             "Fewer groups = fewer distinct jit programs to compile",
    )
    p.add_argument(
        "--no-compaction", action="store_true",
        help="Disable the stream-compaction ladder on the fast path. "
             "Slower at steady state, but the render compiles O(1) program "
             "shapes instead of one per ladder rung — the right trade on a "
             "cold compile cache or a slow remote-compile service",
    )
    p.add_argument(
        "--nee", action="store_true",
        help="Next-event estimation: sample lights directly with shadow "
             "rays (unbiased; dramatically less noise on light-driven "
             "scenes like cornell). Rides the fast path",
    )
    p.add_argument(
        "--aovs", action="store_true",
        help="Also write first-hit AOV buffers (<out>.normal/.albedo/"
             ".depth.png) — denoiser/compositing guides",
    )
    p.add_argument(
        "--adaptive", type=int, default=0, metavar="SPP",
        help="Adaptive sampling to an average budget of SPP samples/pixel: "
             "after a uniform warmup, each round refines only the "
             "highest-variance quarter of the pixels (-S sets the "
             "samples-per-pixel-per-round). Implies a single offline frame",
    )
    p.add_argument(
        "--denoise", action="store_true",
        help="Edge-avoiding a-trous wavelet filter on the final image, "
             "guided by first-hit AOVs (albedo-demodulated; keeps texture "
             "and geometric edges)",
    )
    p.add_argument(
        "--rr", type=int, default=0, metavar="DEPTH",
        help="Russian-roulette path termination from this bounce depth "
             "(0 = off). Unbiased; kills deep low-energy paths early. "
             "General integrator only",
    )
    p.add_argument(
        "--stratify", action="store_true",
        help="Latin-hypercube in-pixel sample stratification (lower "
             "variance per sample than the reference's uniform jitter; "
             "unbiased for any spp)",
    )
    p.add_argument(
        "--platform", default=None, metavar="NAME",
        help="Force a JAX backend (e.g. cpu). Overrides the environment's "
             "default device selection in-process, which is necessary where "
             "site hooks ignore JAX_PLATFORMS",
    )
    return p


def _machine_fingerprint() -> str:
    """Hash of the host CPU identity (model/family/stepping/microcode/flags).

    XLA:CPU AOT executables are machine-specific but JAX's cache key does
    not fully capture host CPU features; on infrastructure where the host
    behind the container rotates, loading another machine's cached CPU
    executable can SIGILL/segfault (observed). CPU cache entries therefore
    live in a per-machine subdir. The flags line ALONE is not enough — two
    host epochs with identical flags still produced a cache entry that
    segfaulted the test suite inside ``backend_compile_and_load``
    (observed 2026-08-19) — so every identity line of the first processor
    block goes into the hash.
    """
    import hashlib

    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "microcode", "cache size", "flags")
    try:
        lines = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # first processor block only
                if line.split(":")[0].strip() in keys:
                    lines.append(line)
        if lines:
            return hashlib.sha1("".join(lines).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (compiles are 60s+ on TPU).

    TPU executables are host-independent and share the base dir (they are
    the expensive ones — minutes each on the remote-compile service); CPU
    executables go to a per-machine subdir (see _machine_fingerprint).
    """
    import os

    import jax

    if os.environ.get("PATHTRACE_DISABLE_JAX_CACHE", "").lower() not in (
        "", "0", "false", "no",
    ):
        return
    cache_dir = os.environ.get(
        "PATHTRACE_JAX_CACHE", os.path.expanduser("~/.cache/pathtrace_tpu_jax")
    )
    # config (not jax.devices()) — initializing the backend here would
    # block for minutes when the TPU tunnel is down. Every CPU path sets
    # jax_platforms explicitly (conftest, --platform) before this runs.
    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms == "cpu":
        cache_dir = os.path.join(cache_dir, f"cpu-{_machine_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv: Optional[Sequence[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        # must land before any jit/device touch; config (unlike the
        # JAX_PLATFORMS env var) cannot be overridden by site hooks
        import jax

        jax.config.update("jax_platforms", args.platform)
    _enable_compilation_cache()

    if args.distributed:
        # multi-host: same program on every host; JAX wires the pod together
        # (SURVEY.md §5 distributed design)
        import jax

        jax.distributed.initialize()

    if args.profile_dir:
        import jax

        with jax.profiler.trace(args.profile_dir):
            rc = _run(args)
        print(f"profiler trace written to {args.profile_dir}")
        return rc
    return _run(args)


def _denoise(args, scene, camera, params, features, image):
    import jax
    import numpy as np

    from pathtrace_tpu.render.aov import render_aovs
    from pathtrace_tpu.render.denoise import atrous_denoise

    aovs = render_aovs(scene, camera, params.width, params.height,
                       jax.random.PRNGKey(params.resolve_seed()),
                       features=features, samples=2)
    return np.asarray(atrous_denoise(
        jax.numpy.asarray(image), aovs["normal"], aovs["albedo"],
        aovs["depth"],
    ))


def _run(args) -> int:
    params = Params(
        width=args.width,
        height=args.height,
        samples=args.samples,
        max_depth=args.depth,
        random_seed=args.random,
        use_bvh=args.bvh,
        seed=args.seed,
    )

    print(
        f"generating '{args.preset}' preset at {params.width}x{params.height}"
        f" with {params.samples} samples per pixel"
    )
    result = presets.from_name(args.preset, params.aspect, seed=params.seed,
                               image_path=args.image)
    if result is None:
        print(f"unrecognised preset '{args.preset}'", file=sys.stderr)
        return 2
    scene, camera = result
    features = SceneFeatures.from_scene(scene)
    print(f"scene features: {features}")

    if args.print_trace:
        print_ray_trace(scene, camera, params.max_depth, seed=params.seed,
                        use_bvh=args.bvh)
        return 0

    if args.aovs:
        import jax

        from pathtrace_tpu.render.aov import render_aovs, save_aov_pngs

        aovs = render_aovs(scene, camera, params.width, params.height,
                           jax.random.PRNGKey(params.resolve_seed()),
                           features=features)
        prefix = args.out[:-4] if args.out.endswith(".png") else args.out
        save_aov_pngs(aovs, prefix)
        print(f"wrote {prefix}.normal/.albedo/.depth.png")

    if args.adaptive:
        from pathtrace_tpu.render.adaptive import render_adaptive

        nee_lights = None
        if args.nee:
            from pathtrace_tpu.ops.lights import build_light_table

            nee_lights = build_light_table(scene)
        start = time.monotonic()
        image, total_rays, _ = render_adaptive(
            scene, camera, params, args.adaptive, features=features,
            nee_lights=nee_lights,
        )
        elapsed = time.monotonic() - start
        print(
            f"{elapsed:.2f}secs {total_rays}rays "
            f"{total_rays / 1e6 / elapsed:.2f}Mrays/s"
        )
        if args.denoise:
            image = _denoise(args, scene, camera, params, features, image)
        film.save_frame_png(args.out, image)
        print(f"wrote {args.out}")
        return 0

    if args.offline:
        start = time.monotonic()
        result = render_progressive(
            scene, camera, params, max_frames=1, features=features,
            use_pallas=args.pallas, use_bvh=args.bvh, mode=args.mode,
            group=args.group, compaction=not args.no_compaction,
            stratify=args.stratify, nee=args.nee, rr_start=args.rr,
        )
        elapsed = time.monotonic() - start
        # same offline report shape as reference src/offline.rs:36-41
        print(
            f"{elapsed:.2f}secs {result.total_rays}rays "
            f"{result.total_rays / 1e6 / elapsed:.2f}Mrays/s"
        )
        image = result.image
        if args.denoise:
            image = _denoise(args, scene, camera, params, features, image)
        film.save_frame_png(args.out, image)
        print(f"wrote {args.out}")
        return 0

    # progressive-refinement loop (window analog); the live preview IS the
    # default display surface, like the reference's GL window (main.rs:95)
    result = render_progressive(
        scene, camera, params,
        max_frames=args.frames,
        features=features,
        use_pallas=args.pallas,
        use_bvh=args.bvh,
        mode=args.mode,
        group=args.group,
        compaction=not args.no_compaction,
        stratify=args.stratify,
        nee=args.nee,
        rr_start=args.rr,
        checkpoint_path=args.checkpoint,
        snapshot_path=args.out,
        snapshot_every=args.snapshot_every,
        preview=not args.no_preview,
        preview_port=args.preview_port,
    )
    image = result.image
    if args.denoise:
        image = _denoise(args, scene, camera, params, features, image)
    film.save_frame_png(args.out, image)
    print(f"wrote {args.out} after {result.frames} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
