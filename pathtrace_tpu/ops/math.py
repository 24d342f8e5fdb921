"""Core math and sampling primitives, batched and branch-free.

TPU-native replacements for the reference's scalar helpers
(reference ``src/math.rs``). Rejection-sampling loops
(``src/math.rs:6-26``) become closed-form transforms so shapes stay
static under jit; everything works on ``[..., 3]`` batches.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.283185307179586


def dot(a, b, keepdims: bool = True):
    """Batched 3-vector dot product along the last axis."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def normalize(v, eps: float = 1e-38):
    """Normalize along the last axis (guarded against zero vectors)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, eps))


def length(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def reflect(v, n):
    """Mirror reflection (reference src/math.rs:61-63)."""
    return v - 2.0 * dot(v, n) * n


def refract(v, n, ni_over_nt):
    """Snell refraction with total-internal-reflection mask.

    Branch-free analog of reference ``src/math.rs:65-73``: returns
    ``(refracted, ok)`` where ``ok`` is False on TIR (discriminant <= 0);
    ``refracted`` is garbage-but-finite when ``ok`` is False.
    """
    ni_over_nt = jnp.asarray(ni_over_nt)
    if ni_over_nt.ndim < v.ndim:
        ni_over_nt = ni_over_nt[..., None]
    dt = dot(v, n)
    disc = 1.0 - (ni_over_nt * ni_over_nt) * (1.0 - dt * dt)
    ok = (disc > 0.0)[..., 0]
    # double-where: sqrt'(0) is infinite and would poison reverse-mode AD
    # through the TIR lanes even though they are masked out downstream
    safe_disc = jnp.where(disc > 0.0, disc, 1.0)
    refr = ni_over_nt * (v - n * dt) - n * jnp.sqrt(safe_disc)
    return refr, ok


def schlick(cosine, ref_idx):
    """Schlick fresnel approximation (reference src/math.rs:76-80)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def random_unit_vector(u1, u2):
    """Exact uniform direction from two uniforms.

    Same closed form the reference uses (src/math.rs:28-34):
    z in [-1,1), azimuth in [0,2pi); no rejection loop.
    ``u1``/``u2`` are uniforms in [0,1) of any matching batch shape;
    returns shape ``u1.shape + (3,)``.
    """
    z = u1 * 2.0 - 1.0
    a = u2 * TWO_PI
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a), z], axis=-1)


def random_in_unit_sphere(u1, u2, u3):
    """Uniform point in the unit ball from three uniforms.

    Closed-form replacement for the reference's rejection loop
    (src/math.rs:15-26): uniform direction scaled by U^(1/3).
    """
    d = random_unit_vector(u1, u2)
    r = jnp.cbrt(u3)
    return d * r[..., None]


def random_in_unit_disk(u1, u2):
    """Uniform point in the unit disk (z=0) from two uniforms.

    Closed-form replacement for reference src/math.rs:6-13:
    radius sqrt(U), uniform angle. Returns ``u1.shape + (3,)`` with z=0.
    """
    r = jnp.sqrt(u1)
    a = u2 * TWO_PI
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a), jnp.zeros_like(r)], axis=-1)


def linear_to_srgb_f32(rgb):
    """Linear -> sRGB-ish transfer, float in [0,1].

    Same curve as reference src/math.rs:36-48: 1.055*x^(1/2.4) - 0.055,
    clamped to [0,1].
    """
    rgb = jnp.maximum(rgb, 0.0)
    srgb = 1.055 * jnp.power(rgb, 0.41666666) - 0.055
    return jnp.clip(srgb, 0.0, 1.0)


def linear_to_srgb_u8(rgb):
    """Linear float RGB -> u8, matching reference quantization (*255.99)."""
    return (linear_to_srgb_f32(rgb) * 255.99).astype(jnp.uint8)
