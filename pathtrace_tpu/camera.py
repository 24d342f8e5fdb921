"""Batched differentiable thin-lens camera.

TPU-native analog of the reference camera (reference ``src/camera.rs``):
the same precomputed basis/film-extent model
(``src/camera.rs:22-54``) evaluated over whole ray batches at once, with the
aperture-disk offset and shutter-time sampling of ``get_ray``
(``src/camera.rs:56-68``) driven by uniform arrays instead of a stateful RNG.
All fields live in a pytree, so pixel gradients can flow into camera
parameters too.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.ops import math as pmath


@dataclasses.dataclass
class Camera:
    origin: Any             # [3]
    lower_left_corner: Any  # [3]
    horizontal: Any         # [3]
    vertical: Any           # [3]
    u: Any                  # [3]
    v: Any                  # [3]
    w: Any                  # [3]
    time0: Any              # []
    time1: Any              # []
    lens_radius: Any        # []


jax.tree_util.register_pytree_node(
    Camera,
    lambda c: (
        (c.origin, c.lower_left_corner, c.horizontal, c.vertical, c.u, c.v, c.w,
         c.time0, c.time1, c.lens_radius),
        None,
    ),
    lambda _, ch: Camera(*ch),
)


def make_camera(
    lookfrom,
    lookat,
    vup,
    vfov_degrees: float,
    aspect: float,
    aperture: float,
    focus_dist: float,
    time0: float = 0.0,
    time1: float = 0.0,
) -> Camera:
    """Build the precomputed camera basis (reference src/camera.rs:22-54)."""
    lookfrom = jnp.asarray(lookfrom, jnp.float32)
    lookat = jnp.asarray(lookat, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)
    theta = vfov_degrees * np.pi / 180.0
    half_height = jnp.tan(theta * 0.5)
    half_width = aspect * half_height
    w = pmath.normalize(lookfrom - lookat)
    u = pmath.normalize(jnp.cross(vup, w))
    v = jnp.cross(w, u)
    return Camera(
        origin=lookfrom,
        lower_left_corner=(
            lookfrom
            - half_width * focus_dist * u
            - half_height * focus_dist * v
            - focus_dist * w
        ),
        horizontal=2.0 * half_width * focus_dist * u,
        vertical=2.0 * half_height * focus_dist * v,
        u=u,
        v=v,
        w=w,
        time0=jnp.float32(time0),
        time1=jnp.float32(time1),
        lens_radius=jnp.float32(aperture * 0.5),
    )


def get_rays(camera: Camera, s, t, uniforms):
    """Generate a batch of primary rays.

    Args:
      camera: the camera pytree.
      s, t: film coordinates in [0,1), any batch shape ``[...]``
        (s = x across, t = y up — same convention as the reference update
        loop, ``src/scene.rs:107-108``).
      uniforms: ``[..., 3]`` uniforms in [0,1): two for the aperture disk,
        one for shutter time.

    Returns:
      (origin ``[..., 3]``, direction ``[..., 3]`` normalized, time ``[...]``).
    """
    rd = camera.lens_radius * pmath.random_in_unit_disk(uniforms[..., 0], uniforms[..., 1])
    offset = camera.u * rd[..., 0:1] + camera.v * rd[..., 1:2]
    time = camera.time0 + uniforms[..., 2] * (camera.time1 - camera.time0)
    origin = camera.origin + offset
    direction = pmath.normalize(
        camera.lower_left_corner
        + s[..., None] * camera.horizontal
        + t[..., None] * camera.vertical
        - camera.origin
        - offset
    )
    return origin, direction, time
