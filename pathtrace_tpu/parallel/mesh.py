"""Device-mesh sharding for the ray wavefront.

TPU-native replacement for the reference's only multi-core strategy — rayon
work-stealing over pixels (reference ``src/scene.rs:90-93``): the flattened
ray/sample axis is sharded across a ``jax.sharding.Mesh`` with ``shard_map``;
the scene pytree is replicated on every chip (the analog of all rayon threads
reading one shared immutable scene, SURVEY.md §5); the ray-count metric is the
only cross-chip reduction in the forward path (a ``psum`` riding ICI — the
analog of the reference's AtomicUsize, ``src/scene.rs:118-120``).

Rays never exchange data across the sharded axis during tracing — pixel
parallelism is embarrassing — so the forward render needs NO other
collectives. (Inverse rendering adds the gradient all-reduce; see
:mod:`pathtrace_tpu.parallel.inverse`.)

Works identically on a real TPU slice, a multi-host pod
(``jax.distributed.initialize`` + the same code), and the 8-device virtual
CPU mesh used in CI.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pathtrace_tpu.camera import Camera
from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.render import integrator
from pathtrace_tpu.render.frame import generate_primary_rays

RAY_AXIS = "rays"


def make_render_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, ray axis sharded."""
    devices = list(devices) if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (RAY_AXIS,))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def trace_sharded(
    scene: Scene,
    ro,
    rd,
    time,
    key,
    max_depth: int,
    mesh: Mesh,
    features: SceneFeatures = None,
    sphere_nearest_fn=None,
    differentiable: bool = False,
):
    """Trace a wavefront sharded over the mesh's ray axis.

    ``ro/rd``: [R, 3] with R divisible by mesh size. Scene replicated.
    Returns (radiance [R, 3] sharded, ray_count [] replicated via psum).
    """
    features = features or SceneFeatures.all_on()
    n_dev = mesh.devices.size
    assert ro.shape[0] % n_dev == 0, (
        f"ray count {ro.shape[0]} not divisible by mesh size {n_dev}"
    )
    trace_fn = integrator.trace_diff if differentiable else integrator.trace

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS), P()),
    )
    def _shard(scene_rep, ro_s, rd_s, time_s, key_rep):
        # decorrelate shards: each device folds its mesh position into the key
        my = jax.lax.axis_index(RAY_AXIS)
        local_key = jax.random.fold_in(key_rep, my)
        radiance, count = trace_fn(
            scene_rep, ro_s, rd_s, time_s, local_key, max_depth,
            sphere_nearest_fn=sphere_nearest_fn, features=features,
        )
        # total rays traced: psum over ICI (analog of the AtomicUsize merge)
        total = jax.lax.psum(count, RAY_AXIS)
        return radiance, total

    return _shard(scene, ro, rd, time, key)


def render_frame_sharded(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    samples: int,
    max_depth: int,
    key,
    mesh: Mesh,
    features: SceneFeatures = None,
    sphere_nearest_fn=None,
    differentiable: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-frame render with the sample grid sharded across the mesh.

    The [H*W*S] ray axis is padded to the mesh size. Padding rays are born
    dead via NaN time (the liveness init is ``time == time``) so the psum'd
    ray_count stays exact; the differentiable path instead aliases the
    first rays (NaN forward values would poison reverse-mode AD) and
    accepts a <= n_dev-1 primary-ray overcount in the metric.
    """
    n_dev = mesh.devices.size
    kray, ktrace = jax.random.split(key)
    ro, rd, time = generate_primary_rays(camera, width, height, samples, kray)
    R = height * width * samples
    ro = ro.reshape(R, 3)
    rd = rd.reshape(R, 3)
    time = time.reshape(R)
    Rp = pad_to_multiple(R, n_dev)
    if Rp != R:
        pad = Rp - R
        ro = jnp.concatenate([ro, ro[:pad]], axis=0)
        rd = jnp.concatenate([rd, rd[:pad]], axis=0)
        pad_time = (
            time[:pad] if differentiable
            else jnp.full((pad,), jnp.nan, time.dtype)
        )
        time = jnp.concatenate([time, pad_time], axis=0)

    radiance, ray_count = trace_sharded(
        scene, ro, rd, time, ktrace, max_depth, mesh,
        features=features, sphere_nearest_fn=sphere_nearest_fn,
        differentiable=differentiable,
    )
    radiance = radiance[:R]
    img = radiance.reshape(height, width, samples, 3).mean(axis=2)
    return img, ray_count


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "samples", "max_depth", "features", "mesh"),
)
def render_frame_sharded_jit(
    scene, camera, width, height, samples, max_depth, key, mesh, features=None
):
    return render_frame_sharded(
        scene, camera, width, height, samples, max_depth, key, mesh,
        features=features,
    )
