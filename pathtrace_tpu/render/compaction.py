"""Stream-compacted wavefront tracing.

The masked-lane integrator (:mod:`pathtrace_tpu.render.integrator`) pays the
FULL per-bounce cost for dead lanes: after a few bounces most rays have
escaped to the sky or been absorbed, but the fixed-shape program keeps
intersecting and shading them. This module adds true stream compaction — the
BASELINE.json "stream-compacted wavefront bounces" — in the only way a
static-shape XLA program can: a **host-driven relaunch ladder**.

Per bounce:
1. run ONE bounce at the current wavefront size (jit, shape-specialized);
2. read the alive count (one scalar device->host sync);
3. when the alive set fits a smaller power-of-two rung, flush accumulated
   radiance to the full-size output buffer (scatter-add by original ray
   index), gather the alive lanes to the front (argsort of the dead mask),
   and continue at the smaller size.

Each rung size is its own compiled program; sizes are powers of two, so a
16M-ray frame uses at most ~10 cached programs, reused forever (the
persistent compilation cache makes this a one-time cost per machine).

Note: compaction re-slots rays, so a ray's per-bounce random stream depends
on its slot — results differ from the uncompacted integrator by RNG stream
only (statistically identical, deterministic for a fixed seed).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.render import integrator
from pathtrace_tpu.render.compact_util import (
    compact as _compact,
    final_flush as _final_flush,
    rung as _rung,
)


@functools.lru_cache(maxsize=None)
def _bounce_jit(features: SceneFeatures, sphere_nearest_fn, max_depth: int,
                intersect_fn=None):
    """One-bounce program; shape specialization is handled by jit itself."""

    @jax.jit
    def bounce(scene, state, key):
        return integrator._bounce(
            scene, state, key, max_depth, sphere_nearest_fn, features,
            intersect_fn=intersect_fn,
        )

    return bounce


def trace_compacted(
    scene: Scene,
    ro,
    rd,
    time,
    key,
    max_depth: int,
    features: Optional[SceneFeatures] = None,
    sphere_nearest_fn=None,
    intersect_fn=None,
    min_size: int = 1 << 13,
) -> Tuple[jnp.ndarray, int]:
    """Trace with host-driven stream compaction.

    Same estimator contract as ``integrator.trace`` (modulo RNG slotting;
    see module docstring). Returns (radiance [R, 3], ray_count int).
    ``intersect_fn`` is the whole-scene override (the ``-B`` BVH): dead-lane
    elimination matters most there, where every lane pays the traversal loop.
    """
    features = features or SceneFeatures.all_on()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    R = ro.shape[0]
    bounce = _bounce_jit(features, sphere_nearest_fn, max_depth,
                         intersect_fn=intersect_fn)

    out_radiance = jnp.zeros((R, 3), ro.dtype)
    indices = jnp.arange(R, dtype=jnp.int32)
    identity = True  # dense flush until the first compaction re-slots rays
    state = integrator._initial_state(ro, rd, time)
    size = R
    ray_count = 0
    n_alive = R

    for _ in range(max_depth + 1):
        ray_count += n_alive
        state = bounce(scene, state, key)
        n_alive = int(jnp.sum(state.alive))  # the one sync per bounce
        if n_alive == 0:
            break
        next_size = _rung(n_alive, min_size)
        if next_size <= size // 2:
            out_radiance, state, indices = _compact(
                out_radiance, state, indices, next_size, identity=identity
            )
            size = next_size
            identity = False

    out_radiance = _final_flush(out_radiance, state, indices,
                                identity=identity)
    return out_radiance, ray_count


def render_frame_compacted(
    scene: Scene,
    camera,
    width: int,
    height: int,
    samples: int,
    max_depth: int,
    key,
    features: Optional[SceneFeatures] = None,
    sphere_nearest_fn=None,
    intersect_fn=None,
    min_size: int = 1 << 13,
):
    """Whole-frame render via the compaction ladder (host-driven)."""
    from pathtrace_tpu.render.frame import generate_primary_rays

    kray, ktrace = jax.random.split(key)
    ro, rd, t = _gen_rays_jit(camera, width, height, samples, kray)
    R = height * width * samples
    radiance, ray_count = trace_compacted(
        scene, ro.reshape(R, 3), rd.reshape(R, 3), t.reshape(R), ktrace,
        max_depth, features=features, sphere_nearest_fn=sphere_nearest_fn,
        intersect_fn=intersect_fn, min_size=min_size,
    )
    img = radiance.reshape(height, width, samples, 3).mean(axis=2)
    return img, ray_count


@functools.partial(jax.jit, static_argnames=("width", "height", "samples"))
def _gen_rays_jit(camera, width, height, samples, key):
    from pathtrace_tpu.render.frame import generate_primary_rays

    return generate_primary_rays(camera, width, height, samples, key)
