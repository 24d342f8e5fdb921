"""Vectorized closest-hit intersection over the whole scene.

This is the TPU re-design of the reference's per-ray enum dispatch
(reference ``src/collision/hitable.rs:39-65``) and its SIMD SoA sphere kernel
(``src/collision/spheres_soa.rs:105-391``): each primitive *kind* is
intersected by one ``[rays x primitives]`` vector program producing a
(t, index) candidate; candidates combine by masked argmin — the wavefront
analog of the reference list scan's shrinking ``closest_so_far``
(``src/collision/hitable_list.rs:40-56``), which is order-independent once
expressed as a global min (exponential free-flight sampling in media is
memoryless, so the min-combine matches the reference's sequential clamping
statistically).

The sphere kind is the hot path; :mod:`pathtrace_tpu.ops.intersect_pallas`
provides the Pallas VMEM-tiled version of ``sphere_nearest`` selected at
render time. Everything here is pure jnp — XLA fuses the elementwise work
into the reduction — and serves as the portable reference implementation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pathtrace_tpu.config import MAX_T, MIN_T
from pathtrace_tpu.models.types import (
    Boxes,
    Media,
    Rects,
    Scene,
    SceneFeatures,
    Spheres,
    MEDIUM_SPHERE,
)

# python float, NOT a jnp scalar: a module-level jax array becomes a
# hoisted const_arg in every jaxpr that uses it, and jax 0.9's executable
# const bookkeeping miscounts it on repeated jit calls ("Execution
# supplied N buffers but compiled program expected N+1")
_INF = float(MAX_T)
_PI = 3.14159265358979
_HALF_PI = 1.5707963267948966
_INV_PI = 1.0 / _PI
_INV_2PI = 0.5 / _PI


class HitRecord(NamedTuple):
    """Wavefront hit record (analog of reference RayHit, src/collision/ray.rs:43-50)."""

    t: jnp.ndarray        # [R] f32 — hit distance (MAX_T when miss)
    point: jnp.ndarray    # [R, 3]
    normal: jnp.ndarray   # [R, 3]
    u: jnp.ndarray        # [R]
    v: jnp.ndarray        # [R]
    mat_id: jnp.ndarray   # [R] i32
    hit: jnp.ndarray      # [R] bool


# ---------------------------------------------------------------------------
# Spheres
# ---------------------------------------------------------------------------

def sphere_nearest(spheres: Spheres, ro, rd, time, t_min=MIN_T, t_max=MAX_T,
                   has_motion: bool = True):
    """Nearest sphere hit: brute-force masked argmin over [R, N].

    The jnp reference implementation of the reference's SoA hit kernel
    (``src/collision/spheres_soa.rs:105-155`` scalar / ``:274-391`` AVX2):
    broadcast the ray across all spheres, per-lane quadratic, masked min of
    (t, index). Handles static and moving spheres (time-lerped centers,
    ``src/collision/moving_sphere.rs:28-30``) and signed radii.

    The quadratic is expanded so no ``[R, N, 3]`` intermediate is ever
    built — only ``[R, N]`` terms that XLA fuses into the reduction:
    ``b = (ro - c)·d = ro·d - c·d`` and
    ``c_term = |ro|^2 - 2 ro·c + |c|^2 - r^2``.

    Returns ``(t [R], idx [R])`` with ``t = MAX_T`` on miss.

    Instanced spheres (``spheres.world_from_obj is not None`` — the generic
    Instance wrapper, reference ``src/collision/instance.rs:32-47``) take
    the object-space branch: rays transform into each sphere's object frame
    and the full quadratic runs there. The t parameter is frame-invariant
    (an affine maps ``o + t*d`` to ``(Ao+b) + t*(Ad)``), so winners merge
    directly with the other kinds' world-space candidates.
    """
    if spheres.world_from_obj is not None:
        lin = spheres.obj_from_world[:, :, :3]                    # [N,3,3]
        trans = spheres.obj_from_world[:, :, 3]                   # [N,3]
        ro_o = jnp.einsum("nij,rj->rni", lin, ro) + trans[None]   # [R,N,3]
        rd_o = jnp.einsum("nij,rj->rni", lin, rd)                 # [R,N,3]
        c = spheres.center[None, :, :]                            # [1,N,3]
        if has_motion:
            s = (time[:, None] - spheres.time0[None, :]) * \
                spheres.inv_time_delta[None, :]                   # [R,N]
            c = c + s[..., None] * spheres.center_delta[None, :, :]
        oc = ro_o - c
        a = jnp.sum(rd_o * rd_o, axis=-1)                         # [R,N]
        b = jnp.sum(oc * rd_o, axis=-1)
        cterm = jnp.sum(oc * oc, axis=-1) - \
            (spheres.radius * spheres.radius)[None, :]
        disc = b * b - a * cterm
        valid = (disc > 0.0) & spheres.mask[None, :]
        sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
        inv_a = 1.0 / a
        t0 = (-b - sq) * inv_a
        t1 = (-b + sq) * inv_a
        t0_ok = valid & (t0 > t_min) & (t0 < t_max)
        t1_ok = valid & (t1 > t_min) & (t1 < t_max)
        t_cand = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, _INF))
        idx = jnp.argmin(t_cand, axis=-1)
        t = jnp.take_along_axis(t_cand, idx[..., None], axis=-1)[..., 0]
        return t, idx.astype(jnp.int32)

    rox, roy, roz = ro[..., 0:1], ro[..., 1:2], ro[..., 2:3]      # [R,1]
    rdx, rdy, rdz = rd[..., 0:1], rd[..., 1:2], rd[..., 2:3]      # [R,1]

    cx = spheres.center[:, 0][None, :]                            # [1,N]
    cy = spheres.center[:, 1][None, :]
    cz = spheres.center[:, 2][None, :]
    if has_motion:
        # moving spheres: center at the ray's time
        s = (time[..., None] - spheres.time0[None, :]) * spheres.inv_time_delta[None, :]
        cx = cx + s * spheres.center_delta[:, 0][None, :]
        cy = cy + s * spheres.center_delta[:, 1][None, :]
        cz = cz + s * spheres.center_delta[:, 2][None, :]

    a = (rdx * rdx + rdy * rdy + rdz * rdz)                       # [R,1]
    ro_d = rox * rdx + roy * rdy + roz * rdz                      # [R,1]
    ro_ro = rox * rox + roy * roy + roz * roz                     # [R,1]

    b = ro_d - (cx * rdx + cy * rdy + cz * rdz)                   # [R,N]
    c = (
        ro_ro
        - 2.0 * (rox * cx + roy * cy + roz * cz)
        + (cx * cx + cy * cy + cz * cz)
        - (spheres.radius * spheres.radius)[None, :]
    )                                                             # [R,N]

    disc = b * b - a * c
    valid = (disc > 0.0) & spheres.mask[None, :]
    # "double-where" guard: sqrt at clamped-0 has an infinite derivative that
    # would poison reverse-mode AD through the miss lanes
    sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    inv_a = 1.0 / a
    t0 = (-b - sq) * inv_a
    t1 = (-b + sq) * inv_a
    t0_ok = valid & (t0 > t_min) & (t0 < t_max)
    t1_ok = valid & (t1 > t_min) & (t1 < t_max)
    t_cand = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, _INF))     # [R,N]

    idx = jnp.argmin(t_cand, axis=-1)                             # [R]
    t = jnp.take_along_axis(t_cand, idx[..., None], axis=-1)[..., 0]
    return t, idx.astype(jnp.int32)


def sphere_record(spheres: Spheres, t, idx, ro, rd, time,
                  with_uv: bool = True) -> HitRecord:
    """Build the hit record for winning sphere indices (gathers, O(R)).

    Instanced spheres evaluate normal and UV in object space and transform
    the normal back with the inverse-transpose (exact for every affine,
    reduces to the rotation for rigid transforms); the hit point comes from
    the world ray directly since t is frame-invariant. UV stays
    object-space, matching the reference where the wrapped child computes
    UV before the hit is forward-transformed (``instance.rs:32-47``).
    """
    hit = t < _INF
    t_safe = jnp.where(hit, t, 0.0)  # keep miss lanes finite for AD
    c0 = spheres.center[idx]
    delta = spheres.center_delta[idx]
    s = (time - spheres.time0[idx]) * spheres.inv_time_delta[idx]
    center = c0 + s[..., None] * delta
    radius = spheres.radius[idx]
    point = ro + t_safe[..., None] * rd
    if spheres.world_from_obj is not None:
        lin_ofw = spheres.obj_from_world[idx][:, :, :3]           # [R,3,3]
        trans_ofw = spheres.obj_from_world[idx][:, :, 3]          # [R,3]
        point_o = jnp.einsum("rij,rj->ri", lin_ofw, point) + trans_ofw
        # signed radius flips the normal for hollow shells
        normal_o = (point_o - center) / radius[..., None]
        # world normal via inverse-transpose: (obj_from_world_lin)^T
        n_w = jnp.einsum("rji,rj->ri", lin_ofw, normal_o)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(n_w * n_w, axis=-1), 1e-24))
        normal = n_w / norm[..., None]
        uv_normal = normal_o
    else:
        # signed radius flips the normal for hollow shells (reference
        # src/collision/sphere.rs:45, src/presets.rs:265)
        normal = (point - center) / radius[..., None]
        uv_normal = normal
    if with_uv:
        # sphere UV from the unit normal (reference src/material.rs:41-49):
        # phi = atan2(x, y), theta = asin(y) — the reference's argument
        # order. Only image textures consume sphere UV (the reference
        # computes it only then too, src/material.rs:169-180), so callers
        # skip these transcendentals when the scene has no image textures.
        phi = jnp.arctan2(uv_normal[..., 0], uv_normal[..., 1])
        theta = jnp.arcsin(jnp.clip(uv_normal[..., 1], -1.0, 1.0))
        u = 1.0 - (phi + _PI) * _INV_2PI
        v = (theta + _HALF_PI) * _INV_PI
    else:
        u = jnp.zeros(t.shape, t.dtype)
        v = u
    return HitRecord(
        t=t,
        point=point,
        normal=normal,
        u=u,
        v=v,
        mat_id=spheres.mat_id[idx],
        hit=t < _INF,
    )


# ---------------------------------------------------------------------------
# Rects
# ---------------------------------------------------------------------------

def rect_nearest(rects: Rects, ro, rd, t_min=MIN_T, t_max=MAX_T):
    """Nearest axis-aligned rect hit over [R, N].

    One-hot axis gathers replace the reference's XY/XZ/YZ variants
    (``src/collision/rect.rs:73-160``): plane-t from the normal axis,
    2D in-plane bounds test.

    Instanced rects (generic Instance, ``instance.rs:32-47``) run the same
    plane test on per-rect object-space rays — in world space the rect is
    then an arbitrary parallelogram.
    """
    if rects.world_from_obj is not None:
        lin = rects.obj_from_world[:, :, :3]             # [N,3,3]
        trans = rects.obj_from_world[:, :, 3]            # [N,3]
        ro_o = jnp.einsum("nij,rj->rni", lin, ro) + trans[None]  # [R,N,3]
        rd_o = jnp.einsum("nij,rj->rni", lin, rd)
        axis = rects.axis                                # [N]
        a_axis = jnp.where(axis == 0, 1, 0)
        b_axis = jnp.where(axis == 2, 1, 2)
        ga = lambda arr, ax: jnp.take_along_axis(
            arr, jnp.broadcast_to(ax[None, :, None], arr.shape[:2] + (1,)),
            axis=-1,
        )[..., 0]
        o_n, d_n = ga(ro_o, axis), ga(rd_o, axis)        # [R,N]
        o_a, d_a = ga(ro_o, a_axis), ga(rd_o, a_axis)
        o_b, d_b = ga(ro_o, b_axis), ga(rd_o, b_axis)
        d_n = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
        t = (rects.k[None, :] - o_n) / d_n
        pa = o_a + t * d_a
        pb = o_b + t * d_b
        ok = (
            rects.mask[None, :]
            & (t > t_min) & (t < t_max)
            & (pa >= rects.a0[None, :]) & (pa <= rects.a1[None, :])
            & (pb >= rects.b0[None, :]) & (pb <= rects.b1[None, :])
        )
        t_cand = jnp.where(ok, t, _INF)
        idx = jnp.argmin(t_cand, axis=-1)
        tbest = jnp.take_along_axis(t_cand, idx[..., None], axis=-1)[..., 0]
        return tbest, idx.astype(jnp.int32)

    axis = rects.axis                                   # [N]
    # in-plane axes in ascending order
    a_axis = jnp.where(axis == 0, 1, 0)                 # [N]
    b_axis = jnp.where(axis == 2, 1, 2)                 # [N]

    o_n = ro[..., axis]                                 # [R,N] gather
    d_n = rd[..., axis]
    o_a = ro[..., a_axis]
    d_a = rd[..., a_axis]
    o_b = ro[..., b_axis]
    d_b = rd[..., b_axis]

    # guard axis-parallel rays (d_n == 0): inf t is masked out below, but the
    # division must stay NaN-free for reverse-mode AD
    d_n = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
    t = (rects.k[None, :] - o_n) / d_n                  # [R,N]
    pa = o_a + t * d_a
    pb = o_b + t * d_b
    ok = (
        rects.mask[None, :]
        & (t > t_min)
        & (t < t_max)
        & (pa >= rects.a0[None, :])
        & (pa <= rects.a1[None, :])
        & (pb >= rects.b0[None, :])
        & (pb <= rects.b1[None, :])
    )
    t_cand = jnp.where(ok, t, _INF)
    idx = jnp.argmin(t_cand, axis=-1)
    tbest = jnp.take_along_axis(t_cand, idx[..., None], axis=-1)[..., 0]
    return tbest, idx.astype(jnp.int32)


def rect_nearest_cols(rects: Rects, rox, roy, roz, rdx, rdy, rdz,
                      t_min=MIN_T, t_max=MAX_T):
    """Plane-input twin of :func:`rect_nearest` (ray components as [R]
    arrays; per-rect axis selects replace the [R, N] axis gathers — the
    selected values are identical). Fast-path only: instanced rects route
    to the general integrator before reaching here."""
    assert rects.world_from_obj is None, "instanced rects use rect_nearest"
    axis = rects.axis[None, :]                          # [1,N]

    def sel(x, y, z):
        return jnp.where(
            axis == 0, x[:, None], jnp.where(axis == 1, y[:, None], z[:, None])
        )

    o_n = sel(rox, roy, roz)                            # [R,N]
    d_n = sel(rdx, rdy, rdz)
    # in-plane axes: a = (axis==0 ? y : x), b = (axis==2 ? y : z)
    o_a = jnp.where(axis == 0, roy[:, None], rox[:, None])
    d_a = jnp.where(axis == 0, rdy[:, None], rdx[:, None])
    o_b = jnp.where(axis == 2, roy[:, None], roz[:, None])
    d_b = jnp.where(axis == 2, rdy[:, None], rdz[:, None])

    d_n = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
    t = (rects.k[None, :] - o_n) / d_n
    pa = o_a + t * d_a
    pb = o_b + t * d_b
    ok = (
        rects.mask[None, :]
        & (t > t_min)
        & (t < t_max)
        & (pa >= rects.a0[None, :])
        & (pa <= rects.a1[None, :])
        & (pb >= rects.b0[None, :])
        & (pb <= rects.b1[None, :])
    )
    t_cand = jnp.where(ok, t, _INF)
    idx = jnp.argmin(t_cand, axis=-1)
    tbest = jnp.take_along_axis(t_cand, idx[..., None], axis=-1)[..., 0]
    return tbest, idx.astype(jnp.int32)


def rect_nearest_planes(rects: Rects, rox, roy, roz, rdx, rdy, rdz,
                        t_min=MIN_T, t_max=MAX_T):
    """Small-N twin of :func:`rect_nearest_cols`: a static python loop
    over the rects, all math on [R] planes with scalar rect parameters.

    The [R, N] form materializes ~10 lane-padded [R, N<128] temps at
    fusion boundaries (XLA pads the minor dim to 128 — PERF.md trap 4),
    which at N=1 is a 128x write amplification per temp; measured +15 ms
    per 2M-lane bounce on `simple_light` (tools/scene_compare_probe.py,
    r4). Selected values are identical — the winner is the same
    first-minimum argmin."""
    assert rects.world_from_obj is None, "instanced rects use rect_nearest"
    R = rox.shape[0]
    INF = jnp.float32(_INF)
    tbest = jnp.full((R,), _INF, rox.dtype)
    ibest = jnp.zeros((R,), jnp.int32)
    for j in range(rects.count):
        axis = rects.axis[j]
        o_n = jnp.where(axis == 0, rox, jnp.where(axis == 1, roy, roz))
        d_n = jnp.where(axis == 0, rdx, jnp.where(axis == 1, rdy, rdz))
        o_a = jnp.where(axis == 0, roy, rox)
        d_a = jnp.where(axis == 0, rdy, rdx)
        o_b = jnp.where(axis == 2, roy, roz)
        d_b = jnp.where(axis == 2, rdy, rdz)
        d_n = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
        t = (rects.k[j] - o_n) / d_n
        pa = o_a + t * d_a
        pb = o_b + t * d_b
        ok = (
            rects.mask[j]
            & (t > t_min) & (t < t_max)
            & (pa >= rects.a0[j]) & (pa <= rects.a1[j])
            & (pb >= rects.b0[j]) & (pb <= rects.b1[j])
        )
        cand = jnp.where(ok, t, INF)
        better = cand < tbest
        tbest = jnp.where(better, cand, tbest)
        ibest = jnp.where(better, j, ibest)
    return tbest, ibest


def rect_record(rects: Rects, t, idx, ro, rd) -> HitRecord:
    hit = t < _INF
    t_safe = jnp.where(hit, t, 0.0)
    axis = rects.axis[idx]                              # [R]
    a_axis = jnp.where(axis == 0, 1, 0)
    b_axis = jnp.where(axis == 2, 1, 2)
    point = ro + t_safe[..., None] * rd
    if rects.world_from_obj is not None:
        # UV from the object-space hit point; normal transformed back by
        # the inverse-transpose (generic Instance, instance.rs:32-47)
        lin_ofw = rects.obj_from_world[idx][:, :, :3]   # [R,3,3]
        trans_ofw = rects.obj_from_world[idx][:, :, 3]
        point_uv = jnp.einsum("rij,rj->ri", lin_ofw, point) + trans_ofw
    else:
        point_uv = point
    pa = jnp.take_along_axis(point_uv, a_axis[..., None], axis=-1)[..., 0]
    pb = jnp.take_along_axis(point_uv, b_axis[..., None], axis=-1)[..., 0]
    a0, a1 = rects.a0[idx], rects.a1[idx]
    b0, b1 = rects.b0[idx], rects.b1[idx]
    u = (pa - a0) / (a1 - a0)
    v = (pb - b0) / (b1 - b0)
    one_hot = (jnp.arange(3, dtype=axis.dtype)[None, :] == axis[..., None]).astype(point.dtype)
    normal = one_hot * rects.flip[idx][..., None]
    if rects.world_from_obj is not None:
        n_w = jnp.einsum("rji,rj->ri", lin_ofw, normal)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(n_w * n_w, axis=-1), 1e-24))
        normal = n_w / norm[..., None]
    return HitRecord(
        t=t, point=point, normal=normal, u=u, v=v,
        mat_id=rects.mat_id[idx], hit=t < _INF,
    )


# ---------------------------------------------------------------------------
# Boxes (slab test in object space, replacing Cuboid's six rects + Instance)
# ---------------------------------------------------------------------------

def _to_object_space(obj_from_world, ro, rd):
    """Transform rays into each box's object space.

    obj_from_world: [N, 3, 4]; ro/rd: [R, 3] ->
    returns ro_o, rd_o: [R, N, 3]. (N is small: boxes/media are few.)
    """
    lin = obj_from_world[:, :, :3]                      # [N,3,3]
    trans = obj_from_world[:, :, 3]                     # [N,3]
    ro_o = jnp.einsum("nij,rj->rni", lin, ro) + trans[None]
    rd_o = jnp.einsum("nij,rj->rni", lin, rd)
    return ro_o, rd_o


def _slab_interval(p0, p1, ro_o, rd_o):
    """Slab entry/exit per [R, N] (reference src/collision/aabb.rs:46-58).

    Returns (t_enter, t_exit, enter_axis, exit_axis).
    """
    rd_o = jnp.where(jnp.abs(rd_o) < 1e-12, 1e-12, rd_o)  # NaN-free AD
    rcp = 1.0 / rd_o                                    # [R,N,3]
    d0 = (p0[None] - ro_o) * rcp
    d1 = (p1[None] - ro_o) * rcp
    tn = jnp.minimum(d0, d1)                            # [R,N,3]
    tf = jnp.maximum(d0, d1)
    t_enter = jnp.max(tn, axis=-1)                      # [R,N]
    t_exit = jnp.min(tf, axis=-1)
    enter_axis = jnp.argmax(tn, axis=-1)                # [R,N]
    exit_axis = jnp.argmin(tf, axis=-1)
    return t_enter, t_exit, enter_axis, exit_axis


def box_nearest(boxes: Boxes, ro, rd, t_min=MIN_T, t_max=MAX_T):
    """Nearest box hit over [R, N]: entry face, or exit face from inside.

    Matches the reference Cuboid closest-of-6-rects scan
    (``src/collision/cuboid.rs:25-37``) with outward face normals on both
    entry and exit (back faces are flipped, ``src/collision/cuboid.rs:13-20``).
    """
    ro_o, rd_o = _to_object_space(boxes.obj_from_world, ro, rd)
    t_enter, t_exit, _, _ = _slab_interval(boxes.p0, boxes.p1, ro_o, rd_o)
    crosses = (t_exit > t_enter) & boxes.mask[None, :]
    enter_ok = crosses & (t_enter > t_min) & (t_enter < t_max)
    exit_ok = crosses & (t_enter <= t_min) & (t_exit > t_min) & (t_exit < t_max)
    t_cand = jnp.where(enter_ok, t_enter, jnp.where(exit_ok, t_exit, _INF))
    idx = jnp.argmin(t_cand, axis=-1)
    t = jnp.take_along_axis(t_cand, idx[..., None], axis=-1)[..., 0]
    return t, idx.astype(jnp.int32)


def box_nearest_planes(boxes: Boxes, rox, roy, roz, rdx, rdy, rdz,
                       t_min=MIN_T, t_max=MAX_T):
    """Small-N twin of :func:`box_nearest`: static python loop over boxes,
    all math on [R] planes with per-box scalar affines.

    The [R, N] form materializes [R, N, 3] object-space rays and ~8
    [R, N<128] temps whose minor dims pad to 128 lanes at every fusion
    boundary (PERF.md trap) — at N=2 (cornell) that is a 64x write
    amplification per temp, measured as the dominant cost of the fast
    path's XLA shading flavor under NEE (tools/nee_bench.py r5). Same
    winners: ascending-j running min == first-minimum argmin."""
    R = rox.shape[0]
    INF = jnp.float32(_INF)
    tbest = jnp.full((R,), _INF, rox.dtype)
    ibest = jnp.zeros((R,), jnp.int32)
    for j in range(boxes.count):
        ofw = boxes.obj_from_world[j]                  # [3, 4] scalars
        ro_o = [ofw[r, 0] * rox + ofw[r, 1] * roy + ofw[r, 2] * roz
                + ofw[r, 3] for r in range(3)]
        rd_o = [ofw[r, 0] * rdx + ofw[r, 1] * rdy + ofw[r, 2] * rdz
                for r in range(3)]
        tn = tf = None
        for r in range(3):
            d = jnp.where(jnp.abs(rd_o[r]) < 1e-12, 1e-12, rd_o[r])
            rcp = 1.0 / d
            d0 = (boxes.p0[j, r] - ro_o[r]) * rcp
            d1 = (boxes.p1[j, r] - ro_o[r]) * rcp
            lo = jnp.minimum(d0, d1)
            hi = jnp.maximum(d0, d1)
            tn = lo if tn is None else jnp.maximum(tn, lo)
            tf = hi if tf is None else jnp.minimum(tf, hi)
        crosses = (tf > tn) & boxes.mask[j]
        enter_ok = crosses & (tn > t_min) & (tn < t_max)
        exit_ok = crosses & (tn <= t_min) & (tf > t_min) & (tf < t_max)
        cand = jnp.where(enter_ok, tn, jnp.where(exit_ok, tf, INF))
        better = cand < tbest
        tbest = jnp.where(better, cand, tbest)
        ibest = jnp.where(better, j, ibest)
    return tbest, ibest


def media_nearest_planes(media: Media, rox, roy, roz, rdx, rdy, rdz,
                         uniforms, t_min=MIN_T, t_max=MAX_T):
    """Small-N twin of :func:`media_nearest` on [R] planes (see
    :func:`box_nearest_planes` for why). ``uniforms``: [R, N]."""
    R = rox.shape[0]
    INF = jnp.float32(_INF)
    tbest = jnp.full((R,), _INF, rox.dtype)
    ibest = jnp.zeros((R,), jnp.int32)
    for j in range(media.count):
        ofw = media.obj_from_world[j]
        ro_o = [ofw[r, 0] * rox + ofw[r, 1] * roy + ofw[r, 2] * roz
                + ofw[r, 3] for r in range(3)]
        rd_o = [ofw[r, 0] * rdx + ofw[r, 1] * rdy + ofw[r, 2] * rdz
                for r in range(3)]
        tn = tf = None
        for r in range(3):
            d = jnp.where(jnp.abs(rd_o[r]) < 1e-12, 1e-12, rd_o[r])
            rcp = 1.0 / d
            d0 = (media.p0[j, r] - ro_o[r]) * rcp
            d1 = (media.p1[j, r] - ro_o[r]) * rcp
            lo = jnp.minimum(d0, d1)
            hi = jnp.maximum(d0, d1)
            tn = lo if tn is None else jnp.maximum(tn, lo)
            tf = hi if tf is None else jnp.minimum(tf, hi)
        box_crosses = tf > tn

        # sphere boundary (centers stored in p0); |d| == 1 wavefront-wide
        ocx = rox - media.p0[j, 0]
        ocy = roy - media.p0[j, 1]
        ocz = roz - media.p0[j, 2]
        a = rdx * rdx + rdy * rdy + rdz * rdz
        b = ocx * rdx + ocy * rdy + ocz * rdz
        c = (ocx * ocx + ocy * ocy + ocz * ocz
             - media.radius[j] * media.radius[j])
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
        t_enter_s = (-b - sq) / a
        t_exit_s = (-b + sq) / a

        is_sphere = media.kind[j] == MEDIUM_SPHERE
        t1 = jnp.where(is_sphere, t_enter_s, tn)
        t2 = jnp.where(is_sphere, t_exit_s, tf)
        crosses = jnp.where(is_sphere, disc > 0.0, box_crosses) & media.mask[j]
        t1 = jnp.maximum(t1, t_min)
        t2 = jnp.minimum(t2, t_max)
        ok = crosses & (t1 < t2)
        t1 = jnp.maximum(t1, 0.0)
        hit_dist = -jnp.log(jnp.maximum(uniforms[:, j], 1e-38)) / media.density[j]
        inside = hit_dist < (t2 - t1)
        cand = jnp.where(ok & inside, t1 + hit_dist, INF)
        better = cand < tbest
        tbest = jnp.where(better, cand, tbest)
        ibest = jnp.where(better, j, ibest)
    return tbest, ibest


def box_record(boxes: Boxes, t, idx, ro, rd) -> HitRecord:
    hit = t < _INF
    t_safe = jnp.where(hit, t, 0.0)
    # redo the slab test only for the winning box of each ray ([R] work)
    lin_ofw = boxes.obj_from_world[idx]                 # [R,3,3+1]
    ro_o = jnp.einsum("rij,rj->ri", lin_ofw[:, :, :3], ro) + lin_ofw[:, :, 3]
    rd_o = jnp.einsum("rij,rj->ri", lin_ofw[:, :, :3], rd)
    p0, p1 = boxes.p0[idx], boxes.p1[idx]
    rd_o = jnp.where(jnp.abs(rd_o) < 1e-12, 1e-12, rd_o)
    rcp = 1.0 / rd_o
    d0 = (p0 - ro_o) * rcp
    d1 = (p1 - ro_o) * rcp
    tn = jnp.minimum(d0, d1)
    tf = jnp.maximum(d0, d1)
    t_enter = jnp.max(tn, axis=-1)
    enter_axis = jnp.argmax(tn, axis=-1)
    exit_axis = jnp.argmin(tf, axis=-1)
    is_entry = jnp.abs(t_safe - t_enter) < 1e-4 * jnp.maximum(jnp.abs(t_safe), 1.0)
    face_axis = jnp.where(is_entry, enter_axis, exit_axis)
    # outward normal: entry face opposes the ray, exit face follows it
    sign_d = jnp.sign(jnp.take_along_axis(rd_o, face_axis[..., None], axis=-1)[..., 0])
    n_sign = jnp.where(is_entry, -sign_d, sign_d)
    normal_obj = (
        (jnp.arange(3)[None, :] == face_axis[..., None]).astype(ro.dtype)
        * n_sign[..., None]
    )
    lin_wfo = boxes.world_from_obj[idx][:, :, :3]
    normal = jnp.einsum("rij,rj->ri", lin_wfo, normal_obj)
    point = ro + t_safe[..., None] * rd
    # face u/v per the rect parameterization of that face
    p_obj = ro_o + t_safe[..., None] * rd_o
    a_axis = jnp.where(face_axis == 0, 1, 0)
    b_axis = jnp.where(face_axis == 2, 1, 2)
    ga = lambda arr, ax: jnp.take_along_axis(arr, ax[..., None], axis=-1)[..., 0]
    u = (ga(p_obj, a_axis) - ga(p0, a_axis)) / (ga(p1, a_axis) - ga(p0, a_axis))
    v = (ga(p_obj, b_axis) - ga(p0, b_axis)) / (ga(p1, b_axis) - ga(p0, b_axis))
    return HitRecord(
        t=t, point=point, normal=normal, u=u, v=v,
        mat_id=boxes.mat_id[idx], hit=hit,
    )


# ---------------------------------------------------------------------------
# Constant-density media
# ---------------------------------------------------------------------------

def media_nearest(media: Media, ro, rd, uniforms, t_min=MIN_T, t_max=MAX_T):
    """Stochastic free-flight hit in constant-density media over [R, N].

    Boundary interval from the slab test (boxes) or sphere quadratic, then
    exponential sampling ``-ln(U)/density`` — reference
    ``src/collision/constant_medium.rs:39-76``. ``uniforms`` is ``[R, N]``.
    """
    ro_o, rd_o = _to_object_space(media.obj_from_world, ro, rd)
    t_enter_b, t_exit_b, _, _ = _slab_interval(media.p0, media.p1, ro_o, rd_o)
    box_crosses = t_exit_b > t_enter_b

    # sphere boundary: quadratic interval (centers stored in p0)
    oc = ro[:, None, :] - media.p0[None]                # [R,N,3] (N tiny)
    a = jnp.sum(rd * rd, axis=-1)[..., None]
    b = jnp.sum(oc * rd[:, None, :], axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - (media.radius * media.radius)[None]
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    t_enter_s = (-b - sq) / a
    t_exit_s = (-b + sq) / a
    sph_crosses = disc > 0.0

    is_sphere = (media.kind == MEDIUM_SPHERE)[None, :]
    t1 = jnp.where(is_sphere, t_enter_s, t_enter_b)
    t2 = jnp.where(is_sphere, t_exit_s, t_exit_b)
    crosses = jnp.where(is_sphere, sph_crosses, box_crosses) & media.mask[None, :]

    # clamp the interval exactly as the reference does
    # (src/collision/constant_medium.rs:44-56)
    t1 = jnp.maximum(t1, t_min)
    t2 = jnp.minimum(t2, t_max)
    ok = crosses & (t1 < t2)
    t1 = jnp.maximum(t1, 0.0)

    # exponential free flight; rays here are normalized so |d| == 1
    hit_dist = -jnp.log(jnp.maximum(uniforms, 1e-38)) / media.density[None, :]
    inside = hit_dist < (t2 - t1)
    t_cand = jnp.where(ok & inside, t1 + hit_dist, _INF)
    idx = jnp.argmin(t_cand, axis=-1)
    t = jnp.take_along_axis(t_cand, idx[..., None], axis=-1)[..., 0]
    return t, idx.astype(jnp.int32)


def media_record(media: Media, t, idx, ro, rd) -> HitRecord:
    hit = t < _INF
    t_safe = jnp.where(hit, t, 0.0)
    point = ro + t_safe[..., None] * rd
    # arbitrary normal, unused by the isotropic phase function
    # (reference src/collision/constant_medium.rs:66)
    normal = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], ro.dtype), point.shape
    )
    zeros = jnp.zeros(t.shape, t.dtype)
    return HitRecord(
        t=t, point=point, normal=normal, u=zeros, v=zeros,
        mat_id=media.mat_id[idx], hit=hit,
    )


# ---------------------------------------------------------------------------
# Whole-scene closest hit
# ---------------------------------------------------------------------------

def _select_record(cond, a: HitRecord, b: HitRecord) -> HitRecord:
    c1 = cond
    c3 = cond[..., None]
    return HitRecord(
        t=jnp.where(c1, a.t, b.t),
        point=jnp.where(c3, a.point, b.point),
        normal=jnp.where(c3, a.normal, b.normal),
        u=jnp.where(c1, a.u, b.u),
        v=jnp.where(c1, a.v, b.v),
        mat_id=jnp.where(c1, a.mat_id, b.mat_id),
        hit=jnp.where(c1, a.hit, b.hit),
    )


def _miss_record(ro) -> HitRecord:
    R = ro.shape[:-1]
    dt = ro.dtype
    return HitRecord(
        t=jnp.full(R, _INF, dt),
        point=jnp.zeros(R + (3,), dt),
        normal=jnp.zeros(R + (3,), dt),
        u=jnp.zeros(R, dt),
        v=jnp.zeros(R, dt),
        mat_id=jnp.zeros(R, jnp.int32),
        hit=jnp.zeros(R, bool),
    )


def intersect_scene(
    scene: Scene,
    ro,
    rd,
    time,
    media_uniforms,
    sphere_nearest_fn=None,
    t_min=MIN_T,
    t_max=MAX_T,
    features: SceneFeatures = None,
) -> HitRecord:
    """Closest hit across all primitive kinds for a ray wavefront.

    ``sphere_nearest_fn`` lets the renderer swap in the Pallas kernel for
    the sphere hot path. ``media_uniforms``: [R, n_media] uniforms for
    free-flight sampling. ``features`` (static) compiles out absent kinds.
    """
    f = features or SceneFeatures.all_on()
    sfn = sphere_nearest_fn or sphere_nearest

    rec = None
    if f.has_spheres:
        sp_t, sp_i = sfn(
            scene.spheres, ro, rd, time, t_min, t_max, has_motion=f.has_motion
        )
        rec = sphere_record(
            scene.spheres, sp_t, sp_i, ro, rd, time, with_uv=f.has_image
        )
    if f.has_rects:
        re_t, re_i = rect_nearest(scene.rects, ro, rd, t_min, t_max)
        nxt = rect_record(scene.rects, re_t, re_i, ro, rd)
        rec = nxt if rec is None else _select_record(rec.t <= re_t, rec, nxt)
    if f.has_boxes:
        bx_t, bx_i = box_nearest(scene.boxes, ro, rd, t_min, t_max)
        nxt = box_record(scene.boxes, bx_t, bx_i, ro, rd)
        rec = nxt if rec is None else _select_record(rec.t <= bx_t, rec, nxt)
    if f.has_media:
        md_t, md_i = media_nearest(scene.media, ro, rd, media_uniforms, t_min, t_max)
        nxt = media_record(scene.media, md_t, md_i, ro, rd)
        rec = nxt if rec is None else _select_record(rec.t <= md_t, rec, nxt)
    if rec is None:  # empty scene ('final' stub preset): everything misses
        rec = _miss_record(ro)
    return rec
