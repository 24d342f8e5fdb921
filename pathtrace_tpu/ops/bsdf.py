"""Branch-free material scatter for the ray wavefront.

TPU re-design of the reference's enum-dispatched ``Material::scatter``
(reference ``src/material.rs:138-159``): all four scattering lobes are
evaluated for every lane and combined with masked selects on the material
kind — divergence costs one select instead of a branch, which is exactly how
the VPU wants it.

One texture evaluation serves every lobe: Lambertian/isotropic albedo,
metal albedo (stored as a constant texture), dielectric white, and
DiffuseLight emission (returned separately, reference
``src/material.rs:161-167``).

Differentiability: the dielectric reflect/refract coin flip and the fresnel
probability are ``stop_gradient``-ed (detached sampling), so pixel gradients
flow through the *chosen* branch's direction and through albedos/fuzz/IOR
without bias from the discrete decision.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pathtrace_tpu.models.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    Scene,
    SceneFeatures,
)
from pathtrace_tpu.ops import math as pmath
from pathtrace_tpu.ops.intersect import HitRecord
from pathtrace_tpu.ops.texture import texture_value


class ScatterResult(NamedTuple):
    attenuation: jnp.ndarray  # [R, 3]
    direction: jnp.ndarray    # [R, 3] normalized
    ok: jnp.ndarray           # [R] bool — False = absorbed / light
    emitted: jnp.ndarray      # [R, 3]


def scatter(scene: Scene, rec: HitRecord, ray_dir, uniforms,
            features: SceneFeatures = None) -> ScatterResult:
    """Scatter the wavefront at its hit points.

    Args:
      rec: hit record from ``intersect_scene``.
      ray_dir: [R, 3] incoming directions (normalized).
      uniforms: [R, 4] uniforms — 3 for direction sampling, 1 for the
        dielectric reflect/refract choice.

    Returns attenuation/direction/ok plus the emission term so the
    integrator can accumulate ``emitted + attenuation * L(scattered)``
    (reference src/scene.rs:58-66).
    """
    f = features or SceneFeatures.all_on()
    mats = scene.materials
    kind = mats.kind[rec.mat_id]                        # [R]
    fuzz = mats.fuzz[rec.mat_id]
    ref_idx = mats.ref_idx[rec.mat_id]
    tex_id = mats.tex_id[rec.mat_id]

    tex_rgb = texture_value(scene, tex_id, rec.u, rec.v, rec.point, features=f)

    u1, u2, u3, u_choice = (uniforms[..., i] for i in range(4))
    n = rec.normal
    d = ray_dir

    unit_vec = pmath.random_unit_vector(u1, u2)

    # --- combine by material kind (absent lobes compile out via features)
    is_lam = kind == MAT_LAMBERTIAN
    is_metal = kind == MAT_METAL
    is_diel = kind == MAT_DIELECTRIC
    is_light = kind == MAT_DIFFUSE_LIGHT

    # isotropic phase function is the default lobe: uniform direction
    # (reference src/material.rs:126-136; normalized here — statistically
    # identical, keeps |d| == 1 wavefront-wide)
    direction = unit_vec
    ok = jnp.ones(kind.shape, bool)

    if f.has_dielectric:
        # --- Dielectric (reference src/material.rs:91-124); |d| == 1
        rdotn = pmath.dot(d, n, keepdims=False)
        exiting = rdotn > 0.0
        outward_n = jnp.where(exiting[..., None], -n, n)
        ni_over_nt = jnp.where(exiting, ref_idx, 1.0 / ref_idx)
        cos_in = jnp.where(exiting, rdotn, -rdotn)
        # the reference's exit-side cosine folds the IOR in
        # (src/material.rs:100-103)
        cos_exit_sq = 1.0 - ref_idx * ref_idx * (1.0 - cos_in * cos_in)
        safe_sq = jnp.where(cos_exit_sq > 0.0, cos_exit_sq, 1.0)  # NaN-free AD
        cosine = jnp.where(exiting, jnp.sqrt(safe_sq), cos_in)
        refr, refr_ok = pmath.refract(d, outward_n, ni_over_nt)
        reflect_prob = jnp.where(refr_ok, pmath.schlick(cosine, ref_idx), 1.0)
        take_refract = u_choice > jax.lax.stop_gradient(reflect_prob)
        diel_dir = jnp.where(take_refract[..., None], refr, pmath.reflect(d, n))
        direction = jnp.where(is_diel[..., None], diel_dir, direction)

    if f.has_metal:
        # --- Metal: reflect + fuzz * in_unit_sphere; absorbed below horizon
        # (reference src/material.rs:69-89 — the horizon test uses the
        # *unfuzzed* reflection)
        reflected = pmath.reflect(d, n)
        metal_ok = pmath.dot(reflected, n, keepdims=False) > 0.0
        metal_dir = reflected + fuzz[..., None] * pmath.random_in_unit_sphere(u1, u2, u3)
        direction = jnp.where(is_metal[..., None], metal_dir, direction)
        ok = jnp.where(is_metal, metal_ok, ok)

    if f.has_lambertian:
        # --- Lambertian: normalize(normal + random_unit_vector)
        # (reference src/material.rs:52-67)
        direction = jnp.where(is_lam[..., None], n + unit_vec, direction)

    # single normalize after the lobe select (each branch produced an
    # unnormalized direction; normalize(select(...)) == select(normalize(...)))
    direction = pmath.normalize(direction)

    white = jnp.ones_like(tex_rgb)
    attenuation = jnp.where(is_diel[..., None], white, tex_rgb) if f.has_dielectric else tex_rgb
    if f.has_light:
        ok = jnp.where(is_light, False, ok)
        emitted = jnp.where(is_light[..., None], tex_rgb, jnp.zeros_like(tex_rgb))
    else:
        emitted = jnp.zeros_like(tex_rgb)
    return ScatterResult(attenuation=attenuation, direction=direction, ok=ok, emitted=emitted)
