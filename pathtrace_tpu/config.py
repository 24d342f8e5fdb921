"""Render configuration.

TPU-native analog of the reference's ``Params`` struct
(reference ``src/params.rs:10-18``) plus TPU-specific knobs. All fields are
static Python values so that a ``Params`` fully determines the jit-compiled
program (static shapes, unrolled kinds, kernel selection).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Params:
    """Static render parameters.

    Mirrors the reference CLI surface (reference ``src/main.rs:29-87``):
    width/height/samples/max_depth/random_seed/use_bvh, with TPU additions.
    """

    width: int = 1280
    height: int = 720
    samples: int = 4          # samples per pixel per frame
    max_depth: int = 10       # maximum bounces per ray
    random_seed: bool = False  # if True, seed from entropy; else seed 0
    use_bvh: bool = False     # optional BVH traversal (reference -B flag)

    # --- TPU-specific ---
    seed: int = 0             # base RNG seed when random_seed is False
    ray_chunk: int = 0        # 0 = whole frame in one wavefront; else rays/launch
    use_pallas: Optional[bool] = None  # None = auto (pallas on TPU, jnp elsewhere)
    dtype: str = "float32"    # compute dtype for the wavefront

    @property
    def n_pixels(self) -> int:
        return self.width * self.height

    @property
    def n_rays(self) -> int:
        """Primary rays per frame."""
        return self.width * self.height * self.samples

    @property
    def aspect(self) -> float:
        return self.width / self.height

    def resolve_seed(self) -> int:
        """Seed-0 determinism unless random_seed (reference src/params.rs:21-27)."""
        if self.random_seed:
            import secrets

            return secrets.randbits(32)
        return self.seed


# Ray-march epsilon bounds (reference src/scene.rs:15-16).
MIN_T: float = 0.001
MAX_T: float = 3.402823466e38  # f32::MAX
