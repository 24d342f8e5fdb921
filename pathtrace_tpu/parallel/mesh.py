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
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pathtrace_tpu.camera import Camera
from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.render import integrator
from pathtrace_tpu.render.frame import generate_primary_rays

RAY_AXIS = "rays"


def make_render_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, ray axis sharded."""
    devices = list(devices) if devices is not None else jax.devices()
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
    mode: str = "general",
    seed: int = 0,
    alive_limit: int = None,
    bvh=None,
    bvh_offsets=None,
):
    """Trace a wavefront sharded over the mesh's ray axis.

    ``ro/rd``: [R, 3] with R divisible by mesh size. Scene replicated.
    Returns (radiance [R, 3] sharded, ray_count [] replicated via psum).

    ``mode="fast"`` runs the fused fast path
    (:func:`pathtrace_tpu.ops.fastpath.trace_fast_device` — Pallas
    closest-hit + fused shading) in every shard: the production
    multi-chip forward path. Its RNG is the counter hash keyed on
    globally-unique lane ids (``axis_index * shard_R`` offsets), so the
    sharded image is bit-identical to the single-device uncompacted
    trace for the same ``seed`` — sharding is invisible, and no
    per-device key folding is needed. ``key`` is therefore UNUSED in
    fast mode (vary ``seed``); :func:`render_frame_sharded` folds the
    frame key into the seed for callers that only vary the key.
    ``alive_limit`` births lanes at or beyond that global id dead
    (exact ray counts under padding).
    """
    features = features or SceneFeatures.all_on()
    n_dev = mesh.devices.size
    assert ro.shape[0] % n_dev == 0, (
        f"ray count {ro.shape[0]} not divisible by mesh size {n_dev}"
    )

    if mode == "fast":
        from pathtrace_tpu.ops import fastpath

        shard_R = ro.shape[0] // n_dev
        # differentiable shards ride trace_fast_diff (XLA shading + the
        # custom-VJP Pallas hit kernel); forward-only shards the fused
        # Pallas shading twin. Same counter-hash RNG keyed on global lane
        # ids either way, so both are shard-count invariant.
        trace_dev = (fastpath.trace_fast_diff if differentiable
                     else fastpath.trace_fast_device)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
            out_specs=(P(RAY_AXIS), P()),
            # pallas_call out_shapes carry no varying-mesh-axes annotation
            check_vma=False,
        )
        def _shard_fast(scene_rep, ro_s, rd_s, time_s):
            my = jax.lax.axis_index(RAY_AXIS)
            radiance, count = trace_dev(
                scene_rep, ro_s, rd_s, time_s, seed, max_depth, features,
                lane_offset=my.astype(jnp.uint32) * jnp.uint32(shard_R),
                alive_limit=alive_limit,
                bvh=bvh, bvh_offsets=bvh_offsets,
            )
            total = jax.lax.psum(count, RAY_AXIS)
            return radiance, total

        return _shard_fast(scene, ro, rd, time)

    trace_fn = integrator.trace_diff if differentiable else integrator.trace

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS), P()),
        # pallas_call out_shapes carry no varying-mesh-axes annotation, so
        # vma checking must be off when the Pallas sweep runs in-shard
        check_vma=sphere_nearest_fn is None,
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
    mode: str = "general",
    seed: int = 0,
    bvh=None,
    bvh_offsets=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-frame render with the sample grid sharded across the mesh.

    The [H*W*S] ray axis is padded to the mesh size. Padding rays are born
    dead via NaN time (the liveness init is ``time == time``) so the psum'd
    ray_count stays exact; the differentiable path instead aliases the
    first rays (NaN forward values would poison reverse-mode AD) and
    accepts a <= n_dev-1 primary-ray overcount in the metric.

    ``mode="fast"``: every shard runs the fused Pallas fast path (see
    :func:`trace_sharded`); padding is to ``n_dev * 1024`` (plane-block
    granularity) with padding lanes born dead by global lane id.
    """
    n_dev = mesh.devices.size
    kray, ktrace = jax.random.split(key)
    if mode == "fast" and isinstance(seed, int):
        # the fast path's bounce RNG is seed-keyed (counter hash on global
        # lane ids; `key` is unused there by design — see trace_sharded).
        # Fold the frame key into the seed host-side so a caller varying
        # only `key` across frames still decorrelates bounce draws.
        # (A traced seed — e.g. the inverse renderer deriving it from the
        # step key inside jit — skips the host fold and is used as-is.)
        try:
            kd = np.asarray(jax.random.key_data(ktrace)).ravel()
            # reinterpret as int32: the fold must stay in jnp.int32 range
            seed = int((np.uint32(seed) ^ kd[-1]).astype(np.int32))
        except jax.errors.TracerArrayConversionError:
            pass  # traced key (caller jitted the frame): vary `seed` instead
    ro, rd, time = generate_primary_rays(camera, width, height, samples, kray)
    R = height * width * samples
    ro = ro.reshape(R, 3)
    rd = rd.reshape(R, 3)
    time = time.reshape(R)
    alive_limit = None
    if mode == "fast":
        Rp = pad_to_multiple(R, n_dev * 1024)
        alive_limit = R
    else:
        Rp = pad_to_multiple(R, n_dev)
    if Rp != R:
        pad = Rp - R
        reps = -(-pad // R)  # pad may exceed R in fast mode at tiny sizes

        def tile(x):
            return jnp.concatenate([x] + [x[:R]] * reps, axis=0)[:Rp]

        ro, rd = tile(ro), tile(rd)
        if mode == "fast" or differentiable:
            # fast mode: padding lanes are born dead by lane id instead
            # (NaNs would propagate through the plane kernels' selects)
            time = tile(time)
        else:
            time = jnp.concatenate(
                [time, jnp.full((pad,), jnp.nan, time.dtype)]
            )

    radiance, ray_count = trace_sharded(
        scene, ro, rd, time, ktrace, max_depth, mesh,
        features=features, sphere_nearest_fn=sphere_nearest_fn,
        differentiable=differentiable, mode=mode, seed=seed,
        alive_limit=alive_limit, bvh=bvh, bvh_offsets=bvh_offsets,
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
