"""Gather-based Perlin noise with turbulence.

TPU-native re-design of the reference Perlin implementation
(reference ``src/perlin.rs:54-111``): the eight corner lookups become eight
vectorized gathers from the device-resident tables; the Hermite-smoothed
trilinear gradient interpolation is fully batched and differentiable with
respect to both the evaluation point and the gradient table.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtrace_tpu.models.types import PerlinTables


def noise(tables: PerlinTables, p):
    """Perlin gradient noise at points ``p`` of shape ``[..., 3]``.

    Mirrors reference ``src/perlin.rs:89-111``: hash =
    ``perm_x[(i+di)&255] ^ perm_y[(j+dj)&255] ^ perm_z[(k+dk)&255]``,
    gradient dot offset, Hermite-weighted trilinear blend
    (``src/perlin.rs:54-74``).
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    xf, yf, zf = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    u, v, w = x - xf, y - yf, z - zf
    i = xf.astype(jnp.int32)
    j = yf.astype(jnp.int32)
    k = zf.astype(jnp.int32)

    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)

    accum = jnp.zeros_like(u)
    # 8 corners, unrolled (static): gathers vectorize over the batch.
    for di in (0, 1):
        px = tables.perm_x[(i + di) & 255]
        wu = uu if di else (1.0 - uu)
        for dj in (0, 1):
            py = tables.perm_y[(j + dj) & 255]
            wv = vv if dj else (1.0 - vv)
            for dk in (0, 1):
                pz = tables.perm_z[(k + dk) & 255]
                wwk = ww if dk else (1.0 - ww)
                g = tables.randvec[px ^ py ^ pz]  # [..., 3]
                weight = jnp.stack([u - di, v - dj, w - dk], axis=-1)
                accum = accum + wu * wv * wwk * jnp.sum(g * weight, axis=-1)
    return accum


def turb(tables: PerlinTables, p, depth: int = 7):
    """Turbulence: 7-octave |sum of halved noise| (reference src/perlin.rs:76-87)."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    temp_p = p
    weight = 1.0
    for _ in range(depth):
        accum = accum + weight * noise(tables, temp_p)
        weight *= 0.5
        temp_p = temp_p * 2.0
    return jnp.abs(accum)
