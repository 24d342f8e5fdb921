"""Frame rendering: primary-ray generation, trace, sample mean, accumulation.

TPU analog of the reference's parallel frame update (reference
``src/scene.rs:73-121``): the rayon pixel loop becomes one batched program
over the ``[H, W, S]`` sample grid; the progressive-refinement blend
``mix_prev = n/(n+1)`` (``src/scene.rs:86-87, 114-116``) is preserved exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pathtrace_tpu.camera import Camera, get_rays
from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.render import integrator


def pixel_jitter(key, height: int, width: int, samples: int,
                 stratify: bool) -> jnp.ndarray:
    """In-pixel sample offsets [H, W, S, 2] in [0, 1).

    Uniform iid by default (the reference's ``x + U`` jitter,
    src/scene.rs:107-108); with ``stratify`` each pixel's S samples are
    Latin-hypercube placed — one per 1/S stratum on each axis, the two
    axes independently permuted (argsort of iid uniforms = a uniform
    random permutation).
    """
    jitter = jax.random.uniform(key, (height, width, samples, 2))
    if not stratify or samples <= 1:
        return jitter
    ka, kb = jax.random.split(jax.random.fold_in(key, 1))
    px = jnp.argsort(
        jax.random.uniform(ka, (height, width, samples)), axis=-1
    ).astype(jnp.float32)
    py = jnp.argsort(
        jax.random.uniform(kb, (height, width, samples)), axis=-1
    ).astype(jnp.float32)
    return jnp.stack(
        [(px + jitter[..., 0]) / samples, (py + jitter[..., 1]) / samples],
        axis=-1,
    )


def generate_primary_rays(camera: Camera, width: int, height: int,
                          samples: int, key, stratify: bool = False):
    """Jittered primary rays for the full frame.

    Mirrors the reference sampling ``u = (x + U)/W, v = (y + U)/H``
    (src/scene.rs:107-108) and the thin-lens/time sampling of
    ``Camera::get_ray``. Row y=0 is the *bottom* of the image (the reference
    flips rows only at PNG save, src/offline.rs:44-47).

    ``stratify=True`` upgrades the in-pixel jitter to Latin-hypercube
    sampling (each pixel's S samples land in distinct 1/S strata on each
    film axis, independently permuted) — unbiased for any S, and lower
    variance than the reference's uniform jitter wherever radiance varies
    smoothly across the pixel footprint.

    Returns ro, rd: [H, W, S, 3]; time: [H, W, S].
    """
    kj, kc = jax.random.split(key)
    jitter = pixel_jitter(kj, height, width, samples, stratify)
    cam_u = jax.random.uniform(kc, (height, width, samples, 3))
    x = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    y = jnp.arange(height, dtype=jnp.float32)[:, None, None]
    s = (x + jitter[..., 0]) / width
    t = (y + jitter[..., 1]) / height
    return get_rays(camera, s, t, cam_u)


def render_frame(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    samples: int,
    max_depth: int,
    key,
    sphere_nearest_fn=None,
    differentiable: bool = False,
    features: SceneFeatures = None,
    ray_chunk: int = 0,
    intersect_fn=None,
    stratify: bool = False,
    nee_lights=None,
    rr_start: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one frame. Returns (image [H, W, 3] linear RGB, ray_count []).

    ``differentiable=True`` uses the scan-based integrator (for jax.grad);
    otherwise the early-exit while_loop renderer.

    ``ray_chunk > 0`` sweeps the wavefront in fixed-size launches via
    ``lax.map``: the trace program is compiled once for the chunk shape and
    reused for any film size — compile time stays flat as resolution grows,
    and per-chunk early exit kicks in sooner than whole-frame early exit
    (a partial stream-compaction effect: finished chunks stop bouncing).
    """
    kray, ktrace = jax.random.split(key)
    ro, rd, time = generate_primary_rays(
        camera, width, height, samples, kray, stratify=stratify
    )
    R = height * width * samples
    ro = ro.reshape(R, 3)
    rd = rd.reshape(R, 3)
    time = time.reshape(R)

    trace_fn = integrator.trace_diff if differentiable else integrator.trace

    if ray_chunk and ray_chunk < R:
        # pad to a chunk multiple so ONE chunk-shaped program serves every
        # film size; padded lanes are born dead (NaN time fails the
        # `time == time` liveness init) so they cost no ray-count and no
        # bounces. The differentiable path instead aliases ray 0 — NaN
        # forward values would poison reverse-mode AD.
        Rp = ((R + ray_chunk - 1) // ray_chunk) * ray_chunk
        if Rp != R:
            pad = Rp - R
            pad_time = jnp.nan if not differentiable else time[0]
            ro = jnp.concatenate([ro, jnp.broadcast_to(ro[:1], (pad, 3))], axis=0)
            rd = jnp.concatenate([rd, jnp.broadcast_to(rd[:1], (pad, 3))], axis=0)
            time = jnp.concatenate(
                [time, jnp.full((pad,), pad_time, time.dtype)], axis=0
            )
        n_chunks = Rp // ray_chunk

        def chunk_body(args):
            ro_c, rd_c, time_c, idx = args
            # decorrelate chunks: same lane in different chunks must not
            # share its random sequence
            ck = jax.random.fold_in(ktrace, idx)
            return trace_fn(
                scene, ro_c, rd_c, time_c, ck, max_depth,
                sphere_nearest_fn=sphere_nearest_fn, features=features,
                intersect_fn=intersect_fn, nee_lights=nee_lights,
                rr_start=rr_start,
            )

        radiance, counts = jax.lax.map(
            chunk_body,
            (
                ro.reshape(n_chunks, ray_chunk, 3),
                rd.reshape(n_chunks, ray_chunk, 3),
                time.reshape(n_chunks, ray_chunk),
                jnp.arange(n_chunks, dtype=jnp.int32),
            ),
        )
        radiance = radiance.reshape(-1, 3)[:R]
        ray_count = jnp.sum(counts)
    else:
        radiance, ray_count = trace_fn(
            scene, ro, rd, time, ktrace, max_depth,
            sphere_nearest_fn=sphere_nearest_fn, features=features,
            intersect_fn=intersect_fn, nee_lights=nee_lights,
            rr_start=rr_start,
        )
    img = radiance.reshape(height, width, samples, 3).mean(axis=2)
    return img, ray_count


def accumulate(acc_image, new_image, frame_num):
    """Progressive blend: acc*n/(n+1) + new/(n+1) (reference src/scene.rs:86-87)."""
    n = frame_num.astype(new_image.dtype) if hasattr(frame_num, "astype") else jnp.float32(frame_num)
    mix_prev = n / (n + 1.0)
    return acc_image * mix_prev + new_image * (1.0 - mix_prev)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "samples", "max_depth", "use_pallas", "features",
        "ray_chunk", "stratify", "rr_start",
    ),
)
def render_frame_jit(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    samples: int,
    max_depth: int,
    key,
    use_pallas: bool = False,
    features: SceneFeatures = None,
    ray_chunk: int = 0,
    stratify: bool = False,
    nee_lights=None,
    rr_start: int = 0,
):
    """Jitted whole-frame render, optionally with the Pallas sphere kernel."""
    fn = None
    if use_pallas:
        from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas

        fn = sphere_nearest_pallas
    return render_frame(
        scene, camera, width, height, samples, max_depth, key,
        sphere_nearest_fn=fn, features=features, ray_chunk=ray_chunk,
        stratify=stratify, nee_lights=nee_lights, rr_start=rr_start,
    )
