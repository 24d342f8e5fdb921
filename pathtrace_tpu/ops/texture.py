"""Branch-free texture table evaluation.

TPU-native analog of the reference's recursive enum match
(reference ``src/texture.rs:74-91``): all texture kinds are computed for the
batch and combined with masked selects. Checker children are full recursive
textures like the reference's (``src/texture.rs:78-86``): the recursion is
statically unrolled to ``SceneFeatures.checker_depth`` levels (derived from
the actual texture graph host-side, so a scene with flat constant-children
checkers — every reference preset, ``src/presets.rs:129-139`` — compiles
the same single-extra-gather program as before, while checker-of-noise /
checker-of-checker resolve exactly as deep as they need).
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtrace_tpu.models.types import (
    ImageAtlas,
    PerlinTables,
    Scene,
    SceneFeatures,
    TEX_CHECKER,
    TEX_CONSTANT,
    TEX_IMAGE,
    TEX_NOISE,
    Textures,
)
from pathtrace_tpu.ops import perlin


def _image_value(atlas: ImageAtlas, image_id, u, v):
    """Nearest-neighbor image fetch with v-flip (reference src/texture.rs:28-36)."""
    w = atlas.width[image_id].astype(jnp.float32)
    h = atlas.height[image_id].astype(jnp.float32)
    i = (u * w).astype(jnp.int32)
    j = ((1.0 - v) * h - 0.001).astype(jnp.int32)
    i = jnp.clip(i, 0, atlas.width[image_id] - 1)
    j = jnp.clip(j, 0, atlas.height[image_id] - 1)
    return atlas.data[atlas.y_offset[image_id] + j, i]  # [..., 3]


def _base_value(tex: Textures, perlin_tables: PerlinTables, atlas: ImageAtlas,
                tex_id, u, v, p, turb_val, f: SceneFeatures):
    """Evaluate non-checker kinds for a batch of texture ids.

    ``turb_val`` is the (shared) Perlin turbulence at p, computed once by
    the caller — it depends only on p, so base/odd/even evaluations reuse it.
    """
    kind = tex.kind[tex_id]
    out = tex.color[tex_id]

    if f.has_noise:
        # noise: marble pattern 0.5*(1 + sin(scale*z + 10*turb(p)))
        # (reference src/texture.rs:87-89)
        scale = tex.scale[tex_id]
        noise_val = 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turb_val))
        noise_rgb = jnp.broadcast_to(noise_val[..., None], noise_val.shape + (3,))
        out = jnp.where((kind == TEX_NOISE)[..., None], noise_rgb, out)
    if f.has_image:
        img_rgb = _image_value(atlas, tex.image_id[tex_id], u, v)
        out = jnp.where((kind == TEX_IMAGE)[..., None], img_rgb, out)
    return out


def _value_rec(tex: Textures, perlin_tables, atlas, tex_id, u, v, p,
               turb_val, sines_neg, f: SceneFeatures, depth: int):
    """Statically-unrolled recursive texture evaluation.

    ``depth`` is the number of remaining checker-resolve levels; at 0 the
    node evaluates as its base kind only (constants/noise/image). The
    checker sines depend only on p, so ``sines_neg`` is shared by every
    level of the recursion.
    """
    base = _base_value(tex, perlin_tables, atlas, tex_id, u, v, p, turb_val, f)
    if not f.has_checker or depth <= 0:
        return base

    odd = _value_rec(tex, perlin_tables, atlas, tex.odd_id[tex_id], u, v, p,
                     turb_val, sines_neg, f, depth - 1)
    even = _value_rec(tex, perlin_tables, atlas, tex.even_id[tex_id], u, v, p,
                      turb_val, sines_neg, f, depth - 1)
    checker = jnp.where(sines_neg[..., None], odd, even)

    is_checker = (tex.kind[tex_id] == TEX_CHECKER)[..., None]
    return jnp.where(is_checker, checker, base)


def texture_value(scene: Scene, tex_id, u, v, p, features: SceneFeatures = None):
    """Evaluate texture ``tex_id`` at (u, v, p) for a batch.

    ``tex_id``: int array ``[...]``; ``u``/``v``: ``[...]``; ``p``: ``[..., 3]``.
    Returns RGB ``[..., 3]``. ``features`` (static) compiles out absent kinds.
    """
    f = features or SceneFeatures.all_on()
    tex = scene.textures
    turb_val = perlin.turb(scene.perlin, p) if f.has_noise else None
    if not f.has_checker:
        return _base_value(tex, scene.perlin, scene.atlas, tex_id, u, v, p,
                           turb_val, f)

    # checker select: sines of the 10x-scaled point pick the odd/even child
    # (reference src/texture.rs:78-86); computed once for all levels
    s = 10.0 * p
    sines_neg = (jnp.sin(s[..., 0]) * jnp.sin(s[..., 1]) * jnp.sin(s[..., 2])
                 < 0.0)
    return _value_rec(tex, scene.perlin, scene.atlas, tex_id, u, v, p,
                      turb_val, sines_neg, f, f.checker_depth)
