"""Wavefront path-tracing integrator.

The architectural inversion at the heart of the TPU build: the reference
recurses per ray (reference ``src/scene.rs:49-71``); here ONE program advances
the whole ``[R]`` ray wavefront through bounce depth sequentially —
intersect-all, shade-all, scatter-all — with dead lanes masked.

Two sweep drivers share one bounce body:

* :func:`trace` — ``lax.while_loop`` with whole-wavefront early exit: the
  sweep stops as soon as every lane is dead (escaped to sky / absorbed /
  emitted), which recovers most of what per-ray recursion depth-termination
  gives the CPU. This is the fast forward renderer (not reverse-mode
  differentiable, as XLA cannot run a while_loop backwards).
* :func:`trace_diff` — ``lax.scan`` over the static ``max_depth + 1`` bounce
  budget: same estimator, reverse-mode differentiable for inverse rendering.

Dead-lane masking *is* the TPU-idiomatic stream compaction: VPU lanes are
SIMD, so masked lanes cost the same as compacted ones would in any
fixed-shape program; what early exit removes is whole wasted sweeps.

RNG is counter-based Threefry keyed (frame, bounce), replacing the
reference's per-pixel Xoshiro seeds (``src/scene.rs:96-102``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.ops import bsdf
from pathtrace_tpu.ops import intersect as isect


def sky_color(scene: Scene, rd):
    """Sky radiance for escaped rays (reference src/scene.rs:40-47).

    Gradient sky: ``(1-t)*white + t*0.3*(0.5,0.7,1.0)`` with
    ``t = 0.5*(dir.y+1)``; or the constant ``scene.sky``. Selected by the
    ``use_gradient_sky`` scalar so the program is scene-independent.
    """
    t = 0.5 * (rd[..., 1] + 1.0)
    grad = (1.0 - t)[..., None] + t[..., None] * (
        jnp.asarray([0.5, 0.7, 1.0], rd.dtype) * 0.3
    )
    const = jnp.broadcast_to(scene.sky, rd.shape)
    return jnp.where(scene.use_gradient_sky > 0.5, grad, const)


class WavefrontState(NamedTuple):
    depth: jnp.ndarray       # [] i32
    ro: jnp.ndarray          # [R, 3]
    rd: jnp.ndarray          # [R, 3]
    time: jnp.ndarray        # [R]
    radiance: jnp.ndarray    # [R, 3]
    throughput: jnp.ndarray  # [R, 3]
    alive: jnp.ndarray       # [R] bool
    ray_count: jnp.ndarray   # [] i32 — traced ray segments (Mrays metric)
    # MIS weight on this lane's next primitive-emission hit (1 = full).
    # Where the previous vertex ran NEE, the two direct-light strategies
    # (light sampling / BSDF sampling) split ownership of that emission by
    # the power heuristic; this carries the BSDF side's share. 1.0 when no
    # NEE ran, and for emitters outside the light table (sky included —
    # the sampler never produces either, so BSDF owns them fully).
    emit_scale: jnp.ndarray  # [R] f32


def _bounce(
    scene: Scene,
    state: WavefrontState,
    key,
    max_depth: int,
    sphere_nearest_fn,
    features: SceneFeatures,
    intersect_fn=None,
    nee_lights=None,
    rr_start: int = 0,
) -> WavefrontState:
    """One wavefront bounce: intersect, emit/sky, scatter, advance.

    Mirrors one level of the reference recursion
    ``emitted + attenuation * ray_trace(scattered)`` (src/scene.rs:58-66):
    the running ``throughput`` carries the attenuation product, so emission
    and sky terms accumulate as ``radiance += throughput * term``.

    ``nee_lights`` (a :class:`~pathtrace_tpu.ops.lights.LightTable`) turns
    on next-event estimation with MIS: diffuse vertices (lambertian/
    isotropic) cast one shadow ray at a sampled light, and the light-sample
    and BSDF-sample contributions are combined by the power heuristic
    (Veach '97) — ``emit_scale`` carries the BSDF side's share to the next
    hit. Unbiased, with far lower variance on light-driven scenes than the
    reference's BSDF-only integration (src/scene.rs:58-66), and robust at
    BOTH extremes (small lights: light sampling dominates; large close
    lights: BSDF sampling dominates) where plain NEE-with-suppression
    degrades on the latter.
    """
    kb = jax.random.fold_in(key, state.depth)
    med_u = None
    if features.has_media:
        n_media = scene.media.count
        med_u = jax.random.uniform(
            jax.random.fold_in(kb, 0), state.time.shape + (n_media,)
        )
    scat_u = jax.random.uniform(jax.random.fold_in(kb, 1), state.time.shape + (4,))

    if intersect_fn is not None:
        # whole-scene override (e.g. the -B BVH over every primitive kind)
        rec = intersect_fn(scene, state.ro, state.rd, state.time, med_u)
    else:
        rec = isect.intersect_scene(
            scene, state.ro, state.rd, state.time, med_u,
            sphere_nearest_fn=sphere_nearest_fn,
            features=features,
        )
    sc = bsdf.scatter(scene, rec, state.rd, scat_u, features=features)

    alive_f = state.alive.astype(state.ro.dtype)[..., None]
    sky = sky_color(scene, state.rd)
    emitted = sc.emitted
    if nee_lights is not None:
        # the previous vertex's NEE sample owns (1 - emit_scale) of this
        # emission; the sky is untouched (the light sampler never hits it)
        emitted = emitted * state.emit_scale[..., None]
    emit_term = jnp.where(rec.hit[..., None], emitted, sky)
    radiance = state.radiance + state.throughput * emit_term * alive_f

    can_scatter = state.alive & rec.hit & sc.ok & (state.depth < max_depth)

    # NaN-safe varying all-ones (time*0 would be NaN on NaN-padded lanes)
    emit_scale_next = (state.time == state.time).astype(state.ro.dtype)
    shadow_rays = jnp.int32(0)
    if nee_lights is not None:
        from pathtrace_tpu.models.types import MAT_ISOTROPIC, MAT_LAMBERTIAN
        from pathtrace_tpu.ops import lights as plights
        from pathtrace_tpu.ops.texture import texture_value

        mat_kind = scene.materials.kind[rec.mat_id]
        is_lam = mat_kind == MAT_LAMBERTIAN
        diffuse = is_lam | (mat_kind == MAT_ISOTROPIC)
        # gate on can_scatter (depth < max_depth): the BSDF estimator only
        # sees this direct light if the path continues, so NEE must apply
        # under the same depth budget for the two estimators to agree
        nee_mask = can_scatter & diffuse

        lu = jax.random.uniform(jax.random.fold_in(kb, 2),
                                state.time.shape + (3,))
        # missed lanes carry unbounded hit points; pin them to the origin so
        # no NaN/inf can leak out of the masked lanes' arithmetic
        safe_p = jnp.where(nee_mask[..., None], rec.point,
                           jnp.zeros_like(rec.point))
        wi, ldist, lpdf, lidx, lvalid = plights.sample_light_dirs(
            nee_lights, safe_p, lu
        )
        nee_mask = nee_mask & lvalid

        smed_u = None
        if features.has_media:
            smed_u = jax.random.uniform(
                jax.random.fold_in(kb, 3),
                state.time.shape + (scene.media.count,),
            )
        if intersect_fn is not None:
            srec = intersect_fn(scene, safe_p, wi, state.time, smed_u)
        else:
            srec = isect.intersect_scene(
                scene, safe_p, wi, state.time, smed_u,
                sphere_nearest_fn=sphere_nearest_fn, features=features,
            )
        # unoccluded iff nothing lands strictly before the light sample
        # (the light itself is scene geometry and resolves at t ~= dist)
        unoccluded = jnp.logical_not(
            srec.hit & (srec.t < ldist * (1.0 - 1e-3))
        )

        light_p = safe_p + wi * ldist[..., None]
        le = texture_value(
            scene, nee_lights.tex_id[lidx],
            jnp.full_like(ldist, 0.5), jnp.full_like(ldist, 0.5), light_p,
            features=features,
        )
        safe_n = jnp.where(nee_mask[..., None], rec.normal,
                           jnp.zeros_like(rec.normal))
        cos_s = jnp.maximum(jnp.sum(wi * safe_n, axis=-1), 0.0)
        inv_pi = 1.0 / jnp.pi
        # lambertian f*cos = albedo*cos/pi; isotropic phase = albedo/(4*pi)
        f_term = jnp.where(
            is_lam[..., None],
            sc.attenuation * (cos_s * inv_pi)[..., None],
            sc.attenuation * (0.25 * inv_pi),
        )
        # MIS power heuristic between the two direct-light strategies.
        # The BSDF-strategy density of a direction is the scatter pdf:
        # cosine-weighted cos/pi for lambertian (normal + unit vector,
        # reference src/material.rs:52-67), uniform 1/(4pi) for isotropic.
        p_b_nee = jnp.where(is_lam, cos_s * inv_pi, 0.25 * inv_pi)
        w_light = lpdf * lpdf / jnp.maximum(
            lpdf * lpdf + p_b_nee * p_b_nee, 1e-20
        )
        contrib = state.throughput * f_term * le * (
            w_light / jnp.maximum(lpdf, 1e-12)
        )[..., None]
        radiance = radiance + jnp.where(
            (nee_mask & unoccluded)[..., None], contrib,
            jnp.zeros_like(contrib),
        )
        # BSDF side of the split: weight the emission this lane's scattered
        # ray will hit by p_bsdf^2/(p_bsdf^2 + p_light^2), where p_light is
        # the density with which the light sampler would have produced that
        # same direction from this vertex (0 off the table -> weight 1).
        # Applies whether or not the shadow ray was occluded.
        cos_b = jnp.maximum(jnp.sum(sc.direction * safe_n, axis=-1), 0.0)
        p_b_next = jnp.where(is_lam, cos_b * inv_pi, 0.25 * inv_pi)
        p_l_next = plights.light_dir_pdf(nee_lights, safe_p, sc.direction)
        w_bsdf = p_b_next * p_b_next / jnp.maximum(
            p_b_next * p_b_next + p_l_next * p_l_next, 1e-20
        )
        emit_scale_next = jnp.where(
            nee_mask & (p_l_next > 0.0), w_bsdf, emit_scale_next
        )
        shadow_rays = jnp.sum(nee_mask, dtype=jnp.int32)

    cs = can_scatter[..., None]
    throughput = jnp.where(cs, state.throughput * sc.attenuation, state.throughput)

    if rr_start > 0:
        # Russian roulette (beyond-reference, opt-in): from bounce rr_start
        # survive with p = max throughput channel (floored), dividing it
        # back out — unbiased, kills deep low-energy paths instead of
        # carrying them to the depth budget (the reference has none; its
        # paths terminate only by depth/absorption, scene.rs:60-66)
        p = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
        rr_u = jax.random.uniform(jax.random.fold_in(kb, 4),
                                  state.time.shape)
        roll = state.depth >= rr_start
        survive = jnp.logical_not(roll) | (rr_u < p)
        throughput = jnp.where(
            (roll & survive)[..., None], throughput / p[..., None],
            throughput,
        )
        can_scatter = can_scatter & survive
        cs = can_scatter[..., None]

    ro = jnp.where(cs, rec.point, state.ro)
    rd = jnp.where(cs, sc.direction, state.rd)

    return WavefrontState(
        depth=state.depth + 1,
        ro=ro,
        rd=rd,
        time=state.time,
        radiance=radiance,
        throughput=throughput,
        alive=can_scatter,
        ray_count=state.ray_count
        + jnp.sum(state.alive, dtype=jnp.int32) + shadow_rays,
        emit_scale=emit_scale_next,
    )


def _initial_state(ro, rd, time) -> WavefrontState:
    # derive every carry from the ray inputs so the sharding "varying" type
    # matches the loop body under shard_map manual mode
    zero3 = ro * 0.0
    return WavefrontState(
        depth=jnp.int32(0),
        ro=ro,
        rd=rd,
        time=time,
        radiance=zero3,
        throughput=zero3 + 1.0,
        alive=time == time,  # True unless NaN-padded (born-dead lanes)
        # NaN-safe varying zero (sum(time*0) would be NaN for padded lanes)
        ray_count=jnp.sum((time == time).astype(jnp.int32)) * 0,
        emit_scale=(time == time).astype(ro.dtype),  # varying all-ones
    )


def trace(
    scene: Scene,
    ro,
    rd,
    time,
    key,
    max_depth: int,
    sphere_nearest_fn=None,
    features: SceneFeatures = None,
    intersect_fn=None,
    nee_lights=None,
    rr_start: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast forward trace: while_loop with whole-wavefront early exit.

    Returns (radiance [R, 3], ray_count []).
    """
    features = features or SceneFeatures.all_on()
    # numpy scene leaves cannot be indexed by tracers inside the loop
    scene = jax.tree_util.tree_map(jnp.asarray, scene)

    def cond(state: WavefrontState):
        return (state.depth <= max_depth) & jnp.any(state.alive)

    def body(state: WavefrontState):
        return _bounce(scene, state, key, max_depth, sphere_nearest_fn,
                       features, intersect_fn=intersect_fn,
                       nee_lights=nee_lights, rr_start=rr_start)

    final = jax.lax.while_loop(cond, body, _initial_state(ro, rd, time))
    return final.radiance, final.ray_count


def trace_diff(
    scene: Scene,
    ro,
    rd,
    time,
    key,
    max_depth: int,
    sphere_nearest_fn=None,
    features: SceneFeatures = None,
    intersect_fn=None,
    nee_lights=None,
    rr_start: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable trace: scan over the full static bounce budget.

    Identical estimator to :func:`trace`; usable under ``jax.grad`` (the
    scan is checkpoint-friendly and reverse-differentiable).
    """
    features = features or SceneFeatures.all_on()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)

    def step(state: WavefrontState, _):
        return _bounce(scene, state, key, max_depth, sphere_nearest_fn,
                       features, intersect_fn=intersect_fn,
                       nee_lights=nee_lights, rr_start=rr_start), None

    final, _ = jax.lax.scan(
        step, _initial_state(ro, rd, time), None, length=max_depth + 1
    )
    return final.radiance, final.ray_count
