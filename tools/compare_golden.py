"""Cross-implementation image parity vs an external reference PNG.

Bitwise parity with another renderer is impossible (different RNG streams —
SURVEY.md §7f), so this checks *statistical* parity: a noise-averaging
downsample followed by MAE/bias/PSNR thresholds (utils/compare.py). Use it
to compare a render from this framework against a PNG produced by the Rust
reference (``cargo run --release -- -O``) — or any two PNGs.

Usage:
  # compare two PNGs
  python tools/compare_golden.py ref.png --png test.png

  # render a preset here and compare against the reference's output
  python tools/compare_golden.py ref.png --preset small -W 200 -H 100 -S 64

Exit code 0 when within tolerance, 1 otherwise; prints one JSON report line.
Comparison happens in sRGB space (what both implementations write to PNG).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("reference", help="Reference PNG (external ground truth)")
    ap.add_argument("--png", default=None, help="Test PNG to compare")
    ap.add_argument("--preset", default=None, help="Render this preset instead")
    ap.add_argument("-W", "--width", type=int, default=200)
    ap.add_argument("-H", "--height", type=int, default=100)
    ap.add_argument("-S", "--samples", type=int, default=64)
    ap.add_argument("-D", "--depth", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mae-tol", type=float, default=0.02)
    ap.add_argument("--bias-tol", type=float, default=0.008)
    ap.add_argument("--downsample", type=int, default=4)
    args = ap.parse_args()
    if (args.png is None) == (args.preset is None):
        ap.error("provide exactly one of --png or --preset")

    from pathtrace_tpu.render import film
    from pathtrace_tpu.utils.compare import compare_images, downsample

    ref = film.read_png(args.reference).astype(np.float64) / 255.0

    if args.png:
        test = film.read_png(args.png).astype(np.float64) / 255.0
    else:
        import jax

        from pathtrace_tpu.cli import _enable_compilation_cache
        from pathtrace_tpu.models import presets
        from pathtrace_tpu.models.types import SceneFeatures
        from pathtrace_tpu.render.frame import render_frame

        _enable_compilation_cache()
        scene, cam = presets.from_name(
            args.preset, aspect=args.width / args.height, seed=args.seed
        )
        if scene is None:
            print(f"unknown preset {args.preset}", file=sys.stderr)
            return 2
        feats = SceneFeatures.from_scene(scene)
        img, _ = render_frame(
            scene, cam, args.width, args.height, args.samples, args.depth,
            jax.random.PRNGKey(args.seed), features=feats,
        )
        # PNG space: sRGB + the save-time vertical flip (film.save_frame_png)
        test = film.to_srgb_u8(np.asarray(img)[::-1]).astype(np.float64) / 255.0

    if ref.shape != test.shape:
        print(
            json.dumps({"error": "shape mismatch",
                        "ref": list(ref.shape), "test": list(test.shape)})
        )
        return 1

    f = max(args.downsample, 1)
    rep = compare_images(downsample(ref, f), downsample(test, f))
    ok = rep.mean_abs_error < args.mae_tol and abs(rep.mean_signed_error) < args.bias_tol
    print(
        json.dumps(
            {
                "bench": "compare_golden",
                "reference": args.reference,
                "mae": round(rep.mean_abs_error, 6),
                "bias": round(rep.mean_signed_error, 6),
                "p99": round(rep.p99_abs_error, 6),
                "psnr_db": round(rep.psnr_db, 2),
                "pass": bool(ok),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
