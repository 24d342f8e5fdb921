"""Scene representation: flat, typed device arrays (a JAX pytree).

This replaces the reference's arena-allocated ``&'a`` object graph
(reference ``src/storage.rs:12-25``) and its enum dynamic dispatch
(``src/collision/hitable.rs:12-65``, ``src/material.rs:13-19``,
``src/texture.rs:40-56``) with integer-tagged tables:

* primitives are grouped **by kind** into SoA arrays (spheres, rects, boxes,
  constant-density media) so each kind is intersected by one vectorized
  program — the TPU analog of the reference's ``SpheresSoA``
  (``src/collision/spheres_soa.rs:12-23``), generalized to every kind;
* materials and textures are tables indexed by id, evaluated branch-free
  with masked selects instead of enum matches;
* ``Instance`` transforms (``src/collision/instance.rs:16-22``) become
  per-box 3x4 affine pairs (world_from_obj / obj_from_world);
* ``Cuboid`` (6 rects, ``src/collision/cuboid.rs:13-20``) becomes a direct
  slab-test box — fewer ops and no per-face dispatch;
* ``ConstantMedium`` (``src/collision/constant_medium.rs``) becomes a
  "media" kind whose boundary is a transformed box or a sphere.

Every per-kind array is padded to a static size with ``mask`` marking live
entries, so scene edits never retrigger compilation for same-capacity scenes.
All leaf arrays are differentiable scene parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

# Material kinds (reference src/material.rs:13-19).
MAT_LAMBERTIAN = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_DIFFUSE_LIGHT = 3
MAT_ISOTROPIC = 4

# Texture kinds (reference src/texture.rs:40-56).
TEX_CONSTANT = 0
TEX_CHECKER = 1
TEX_NOISE = 2
TEX_IMAGE = 3

# Media boundary kinds.
MEDIUM_BOX = 0
MEDIUM_SPHERE = 1


def _pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree with named (keyed) children."""
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten_with_keys(obj):
        return (
            tuple(
                (jax.tree_util.GetAttrKey(name), getattr(obj, name))
                for name in fields
            ),
            None,
        )

    def flatten(obj):
        return tuple(getattr(obj, name) for name in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)
    return cls


@_pytree_dataclass
class Spheres:
    """SoA sphere array, covering static and moving spheres.

    Static spheres have ``center_delta == 0``; moving spheres interpolate
    ``center = center0 + (time - time0) * inv_time_delta * center_delta``
    (reference ``src/collision/moving_sphere.rs:28-30``). ``radius`` is
    signed — negative radius flips the normal (hollow dielectric shells,
    reference ``src/presets.rs:265``).
    """

    center: Any        # [N, 3] f32 — center at time0 (object space if instanced)
    center_delta: Any  # [N, 3] f32
    time0: Any         # [N] f32
    inv_time_delta: Any  # [N] f32 (0 for static)
    radius: Any        # [N] f32, signed
    mat_id: Any        # [N] i32
    mask: Any          # [N] bool
    # generic Instance support (reference src/collision/instance.rs:16-47
    # wraps ANY hitable in an arbitrary affine): None for plain scenes —
    # a static gate, so untransformed scenes compile the identical
    # program — or [N, 3, 4] affine pairs; rays transform into object
    # space per primitive, hits (normal/UV) transform back
    world_from_obj: Any = None  # [N, 3, 4] f32 or None
    obj_from_world: Any = None  # [N, 3, 4] f32 or None

    @property
    def count(self) -> int:
        return self.center.shape[0]

    @property
    def instanced(self) -> bool:
        return self.world_from_obj is not None


@_pytree_dataclass
class Rects:
    """Axis-aligned rectangles (reference ``src/collision/rect.rs``).

    ``axis`` is the normal axis (0=YZ-rect, 1=XZ, 2=XY); ``(a, b)`` are the
    two in-plane axes in ascending order (YZ: a=y b=z; XZ: a=x b=z;
    XY: a=x b=y), matching the reference's u/v parameterization
    (``src/collision/rect.rs:93-160``). ``flip`` is the normal sign
    (+1/-1, the reference's FLIP_SIGN lut at ``src/collision/rect.rs:33``).
    """

    axis: Any   # [N] i32 in {0,1,2}
    a0: Any     # [N] f32
    a1: Any     # [N] f32
    b0: Any     # [N] f32
    b1: Any     # [N] f32
    k: Any      # [N] f32 — plane offset along `axis` (object space if instanced)
    flip: Any   # [N] f32 — +1.0 or -1.0
    mat_id: Any  # [N] i32
    mask: Any   # [N] bool
    # generic Instance support (see Spheres): None, or [N, 3, 4] affine pairs
    world_from_obj: Any = None
    obj_from_world: Any = None

    @property
    def count(self) -> int:
        return self.axis.shape[0]

    @property
    def instanced(self) -> bool:
        return self.world_from_obj is not None


@_pytree_dataclass
class Boxes:
    """Transformed axis-aligned boxes (Cuboid + Instance fused).

    An object-space AABB ``[p0, p1]`` with a rigid/affine transform pair.
    The reference models this as an ``Instance`` wrapping a ``Cuboid`` of six
    ``Rect`` faces (``src/collision/cuboid.rs:13-20``,
    ``src/collision/instance.rs:32-47``); here the hit test is a slab test in
    object space with the entry/exit face normal reconstructed from the
    dominant slab — one vector program instead of six plane tests.
    """

    p0: Any              # [N, 3] f32 — object-space min corner
    p1: Any              # [N, 3] f32 — object-space max corner
    world_from_obj: Any  # [N, 3, 4] f32 affine
    obj_from_world: Any  # [N, 3, 4] f32 affine (cached inverse)
    mat_id: Any          # [N] i32
    mask: Any            # [N] bool

    @property
    def count(self) -> int:
        return self.p0.shape[0]


@_pytree_dataclass
class Media:
    """Constant-density participating media (reference ``constant_medium.rs``).

    The boundary is either a transformed box or a sphere (``kind``). Free
    flight is sampled as ``-ln(U)/density`` inside the boundary interval;
    the phase function is the isotropic material ``mat_id``.
    """

    kind: Any            # [N] i32 — MEDIUM_BOX | MEDIUM_SPHERE
    p0: Any              # [N, 3] f32 — box min (or sphere center)
    p1: Any              # [N, 3] f32 — box max (unused for spheres)
    radius: Any          # [N] f32 — sphere radius (unused for boxes)
    world_from_obj: Any  # [N, 3, 4] f32
    obj_from_world: Any  # [N, 3, 4] f32
    density: Any         # [N] f32
    mat_id: Any          # [N] i32 (isotropic phase function)
    mask: Any            # [N] bool

    @property
    def count(self) -> int:
        return self.kind.shape[0]


@_pytree_dataclass
class Materials:
    """Material table (reference ``src/material.rs:13-19``).

    ``kind`` selects the lobe; ``tex_id`` is the albedo/emission texture
    (metal albedo is stored as a constant texture); ``fuzz`` and ``ref_idx``
    are the metal/dielectric parameters.
    """

    kind: Any     # [M] i32
    tex_id: Any   # [M] i32
    fuzz: Any     # [M] f32
    ref_idx: Any  # [M] f32

    @property
    def count(self) -> int:
        return self.kind.shape[0]


@_pytree_dataclass
class Textures:
    """Texture table (reference ``src/texture.rs:40-56``).

    Checker children (``odd_id``/``even_id``) are evaluated one level deep —
    the reference's recursive checker is only ever instantiated with
    non-checker children (``src/presets.rs:129-139``).
    """

    kind: Any      # [T] i32
    color: Any     # [T, 3] f32 — constant color
    odd_id: Any    # [T] i32
    even_id: Any   # [T] i32
    scale: Any     # [T] f32 — noise scale
    image_id: Any  # [T] i32

    @property
    def count(self) -> int:
        return self.kind.shape[0]


@_pytree_dataclass
class PerlinTables:
    """Perlin gradient/permutation tables (reference ``src/perlin.rs:14-51``).

    256 random unit gradients and three independent 256-permutations, hashed
    by xor (``src/perlin.rs:103-106``). Device arrays so noise evaluation is
    pure gathers; ``randvec`` is a differentiable texture parameter.
    """

    randvec: Any  # [256, 3] f32 unit vectors
    perm_x: Any   # [256] i32
    perm_y: Any   # [256] i32
    perm_z: Any   # [256] i32


@_pytree_dataclass
class ImageAtlas:
    """All image textures packed into one array (reference ``RgbImage``).

    Images are stacked into a single [H, W, 3] atlas (top-aligned), with
    per-image (y_offset, height, width) so lookup is a clamped gather —
    the analog of the reference's nearest-neighbor fetch with v-flip
    (``src/texture.rs:28-36``).
    """

    data: Any     # [H_atlas, W_atlas, 3] f32
    y_offset: Any  # [I] i32
    height: Any   # [I] i32
    width: Any    # [I] i32
    # plane-form twin [3, H*W] built once at scene build: the [H, W, 3]
    # form's minor dim of 3 pads 128x in device tiling, so the fast path's
    # per-frame texel gathers ride this one instead (fastpath._atlas_planes)
    data_planes: Any = None


class SceneFeatures:
    """Static (hashable) scene capabilities, derived host-side.

    Lets jit specialize the wavefront program: primitive kinds with no live
    entries and texture/material lobes that never occur are compiled out
    entirely. This is the TPU analog of the reference's compile-time enum
    monomorphization — but driven by the actual scene content.
    """

    __slots__ = (
        "has_spheres", "has_motion", "has_rects", "has_boxes", "has_media",
        "has_noise", "has_checker", "has_image",
        "has_lambertian", "has_metal", "has_dielectric", "has_light",
        "has_isotropic",
        # checker texture graph shape (reference src/texture.rs:78-86 allows
        # full recursion): number of checker-resolve levels to unroll
        # (static; any depth >= the scene's true nesting gives identical
        # results), and whether every checker child is a plain constant
        # (the fast path's attr table bakes only constant children — deeper
        # graphs route to the general integrator)
        "checker_depth", "checker_children_const",
    )

    def __init__(self, **kw):
        for k in self.__slots__:
            if k == "checker_depth":
                setattr(self, k, int(kw.get(k, 4)))
            else:
                setattr(self, k, bool(kw.get(k, True)))

    def _key(self):
        return tuple(getattr(self, k) for k in self.__slots__)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, SceneFeatures) and self._key() == other._key()

    def __repr__(self):
        on = [k for k in self.__slots__ if getattr(self, k)]
        return f"SceneFeatures({', '.join(on)})"

    @staticmethod
    def all_on() -> "SceneFeatures":
        return SceneFeatures()

    @staticmethod
    def from_scene(scene: "Scene") -> "SceneFeatures":
        """Derive features from a host-side (numpy) Scene."""
        import numpy as _np

        tex_kinds = set(_np.asarray(scene.textures.kind).tolist())
        mat_kinds = set(_np.asarray(scene.materials.kind).tolist())

        # checker graph shape: walk odd/even links host-side (cycle-guarded)
        kinds = _np.asarray(scene.textures.kind)
        odd = _np.asarray(scene.textures.odd_id)
        even = _np.asarray(scene.textures.even_id)

        def _chk_depth(i, seen):
            if kinds[i] != TEX_CHECKER or i in seen:
                return 0
            seen = seen | {i}
            return 1 + max(_chk_depth(odd[i], seen), _chk_depth(even[i], seen))

        checker_ids = _np.nonzero(kinds == TEX_CHECKER)[0]
        checker_depth = max(
            (_chk_depth(int(i), frozenset()) for i in checker_ids), default=1
        )
        children_const = all(
            kinds[odd[i]] == TEX_CONSTANT and kinds[even[i]] == TEX_CONSTANT
            for i in checker_ids
        )
        return SceneFeatures(
            checker_depth=max(checker_depth, 1),
            checker_children_const=children_const,
            has_spheres=bool(_np.any(scene.spheres.mask)),
            has_motion=bool(_np.any(_np.asarray(scene.spheres.inv_time_delta) != 0.0)),
            has_rects=bool(_np.any(scene.rects.mask)),
            has_boxes=bool(_np.any(scene.boxes.mask)),
            has_media=bool(_np.any(scene.media.mask)),
            has_noise=TEX_NOISE in tex_kinds,
            has_checker=TEX_CHECKER in tex_kinds,
            has_image=TEX_IMAGE in tex_kinds,
            has_lambertian=MAT_LAMBERTIAN in mat_kinds,
            has_metal=MAT_METAL in mat_kinds,
            has_dielectric=MAT_DIELECTRIC in mat_kinds,
            has_light=MAT_DIFFUSE_LIGHT in mat_kinds,
            has_isotropic=MAT_ISOTROPIC in mat_kinds,
        )


@_pytree_dataclass
class Scene:
    """The full scene pytree: every per-kind table plus global settings.

    ``sky`` is the constant sky color, used when ``use_gradient_sky`` is 0;
    otherwise the reference's gradient sky is used
    (``src/scene.rs:40-47``). ``use_gradient_sky`` is a f32 0/1 scalar kept
    in the pytree so both sky modes stay jit-static-free.
    """

    spheres: Spheres
    rects: Rects
    boxes: Boxes
    media: Media
    materials: Materials
    textures: Textures
    perlin: PerlinTables
    atlas: ImageAtlas
    sky: Any               # [3] f32 constant sky color
    use_gradient_sky: Any  # [] f32 — 1.0 => gradient sky, 0.0 => constant

    def device_put(self) -> "Scene":
        return jax.device_put(self)

    def astype_np(self) -> "Scene":
        return jax.tree_util.tree_map(np.asarray, self)
