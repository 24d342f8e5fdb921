"""Light table + direct-light (next-event estimation) sampling.

Beyond-reference estimator: the reference integrates emissive surfaces only
through BSDF path hits (reference ``src/scene.rs:58-66`` — its cornell at
low spp is famously noisy). NEE samples the lights explicitly with shadow
rays; the integrator combines the light-sample and BSDF-sample estimators
with the MIS power heuristic so the pair stays unbiased and robust for
lights of every solid angle (``render/integrator.py``).

Wavefront design: the light list is a tiny static table (scenes have 1-2
lights); every lane samples ONE light uniformly, so the whole pass is a few
``[R]``-shaped selects + one extra scene intersection for the shadow rays —
no per-light loop, no divergence.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models.types import MAT_DIFFUSE_LIGHT, Scene
from pathtrace_tpu.ops import math as pmath


class LightTable(NamedTuple):
    """[L]-shaped SoA of emissive primitives (kind 0 = sphere, 1 = rect)."""

    kind: jnp.ndarray     # [L] i32
    center: jnp.ndarray   # [L, 3] f32 — sphere center (zeros for rects)
    radius: jnp.ndarray   # [L] f32   — sphere radius
    axis: jnp.ndarray     # [L] i32   — rect normal axis
    a0: jnp.ndarray       # [L] f32
    a1: jnp.ndarray       # [L] f32
    b0: jnp.ndarray       # [L] f32
    b1: jnp.ndarray       # [L] f32
    k: jnp.ndarray        # [L] f32
    tex_id: jnp.ndarray   # [L] i32 — emission texture
    # emission colors RESOLVED AT BUILD when every light texture is a
    # constant (every preset) — None otherwise, in which case emission is
    # evaluated through the full texture table. The fast path's NEE tail
    # reads this directly: calling texture_value for a constant light on
    # a noise-featured scene paid 7-octave GATHER Perlin per shadow ray
    # (measured 8.4 s/frame on simple_light, tools/nee_bench.py r5).
    color: jnp.ndarray = None  # [L, 3] f32 or None

    @property
    def count(self) -> int:
        return self.kind.shape[0]


def build_light_table(scene: Scene) -> Optional[LightTable]:
    """Host-side extraction of the emissive primitives.

    Covers sphere and rect lights (every preset's lights are one of the
    two; an emissive box/medium would be skipped — its contribution still
    arrives through BSDF hits, so the estimator stays unbiased either way).
    Returns None when the scene has no sampleable lights.
    """
    mats = np.asarray(scene.materials.kind)
    rows = []

    sp = scene.spheres
    sp_mask = np.asarray(sp.mask)
    sp_mat = np.asarray(sp.mat_id)
    for i in np.nonzero(sp_mask)[0]:
        if mats[sp_mat[i]] == MAT_DIFFUSE_LIGHT:
            rows.append(dict(
                kind=0, center=np.asarray(sp.center)[i],
                radius=abs(float(np.asarray(sp.radius)[i])),
                axis=0, a0=0.0, a1=0.0, b0=0.0, b1=0.0, k=0.0,
                tex_id=int(np.asarray(scene.materials.tex_id)[sp_mat[i]]),
            ))

    rc = scene.rects
    rc_mask = np.asarray(rc.mask)
    rc_mat = np.asarray(rc.mat_id)
    for i in np.nonzero(rc_mask)[0]:
        if mats[rc_mat[i]] == MAT_DIFFUSE_LIGHT:
            rows.append(dict(
                kind=1, center=np.zeros(3), radius=0.0,
                axis=int(np.asarray(rc.axis)[i]),
                a0=float(np.asarray(rc.a0)[i]), a1=float(np.asarray(rc.a1)[i]),
                b0=float(np.asarray(rc.b0)[i]), b1=float(np.asarray(rc.b1)[i]),
                k=float(np.asarray(rc.k)[i]),
                tex_id=int(np.asarray(scene.materials.tex_id)[rc_mat[i]]),
            ))

    if not rows:
        return None
    f32 = np.float32
    tex_kinds = np.asarray(scene.textures.kind)
    tex_colors = np.asarray(scene.textures.color)
    all_const = all(tex_kinds[r["tex_id"]] == 0 for r in rows)
    color = (
        jnp.asarray(np.stack([tex_colors[r["tex_id"]] for r in rows]), f32)
        if all_const else None
    )
    return LightTable(
        color=color,
        kind=jnp.asarray([r["kind"] for r in rows], jnp.int32),
        center=jnp.asarray(np.stack([r["center"] for r in rows]), f32),
        radius=jnp.asarray([r["radius"] for r in rows], f32),
        axis=jnp.asarray([r["axis"] for r in rows], jnp.int32),
        a0=jnp.asarray([r["a0"] for r in rows], f32),
        a1=jnp.asarray([r["a1"] for r in rows], f32),
        b0=jnp.asarray([r["b0"] for r in rows], f32),
        b1=jnp.asarray([r["b1"] for r in rows], f32),
        k=jnp.asarray([r["k"] for r in rows], f32),
        tex_id=jnp.asarray([r["tex_id"] for r in rows], jnp.int32),
    )


# in-plane axes for rect normal axis n (matches ops/intersect.py rects)
_RECT_AXES = np.array([[1, 2], [0, 2], [0, 1]], np.int32)


def sample_light_dirs(
    lights: LightTable, point: jnp.ndarray, u: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample one light per lane; returns (wi, dist, pdf_w, light_idx, valid).

    ``point``: [R, 3] shading points; ``u``: [R, 3] uniforms (light choice +
    2 surface coordinates). ``pdf_w`` is the solid-angle density INCLUDING
    the uniform 1/L light choice. ``valid`` is False where the geometry
    makes the sample meaningless (shading point inside a sphere light, or a
    zero-solid-angle configuration) — callers must fall back to the BSDF
    estimator there.

    Sphere lights use exact cone (visible-cap) sampling; rect lights use
    uniform-area sampling converted to solid angle by dist^2 / (cos_l A),
    treated double-sided like the reference's ``emitted``
    (src/material.rs:161-167 never tests the side).
    """
    L = lights.count
    R = point.shape[0]
    idx = jnp.minimum((u[:, 0] * L).astype(jnp.int32), L - 1)       # [R]

    kind = lights.kind[idx]
    u1, u2 = u[:, 1], u[:, 2]

    # --- sphere lights: cone sampling toward the visible cap
    c = lights.center[idx]                                          # [R, 3]
    r = lights.radius[idx]
    to_c = c - point
    d2 = jnp.sum(to_c * to_c, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    outside = d2 > r * r * (1.0 + 1e-4)
    sin2_max = jnp.clip(r * r / jnp.maximum(d2, 1e-12), 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
    cos_t = 1.0 - u1 * (1.0 - cos_max)                              # [R]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    # orthonormal basis around the center direction
    w = to_c / d[..., None]
    a = jnp.where(
        (jnp.abs(w[:, 0]) > 0.9)[..., None],
        jnp.asarray([0.0, 1.0, 0.0], point.dtype),
        jnp.asarray([1.0, 0.0, 0.0], point.dtype),
    )
    v1 = pmath.normalize(jnp.cross(w, a))
    v2 = jnp.cross(w, v1)
    wi_sph = (
        w * cos_t[..., None]
        + v1 * (jnp.cos(phi) * sin_t)[..., None]
        + v2 * (jnp.sin(phi) * sin_t)[..., None]
    )
    solid_angle = 2.0 * jnp.pi * (1.0 - cos_max)
    pdf_sph = 1.0 / jnp.maximum(solid_angle, 1e-12)
    # distance to the sampled cap point: nearest sphere intersection along wi
    cos_ray = jnp.sum(wi_sph * to_c, axis=-1)                        # d*cos_t
    disc = jnp.maximum(cos_ray * cos_ray - (d2 - r * r), 0.0)
    dist_sph = cos_ray - jnp.sqrt(disc)
    valid_sph = outside & (solid_angle > 1e-9)

    # --- rect lights: uniform area point
    ax = lights.axis[idx]
    pa = lights.a0[idx] + u1 * (lights.a1[idx] - lights.a0[idx])
    pb = lights.b0[idx] + u2 * (lights.b1[idx] - lights.b0[idx])
    kk = lights.k[idx]
    a_ax = jnp.asarray(_RECT_AXES)[ax, 0]
    b_ax = jnp.asarray(_RECT_AXES)[ax, 1]
    one_hot = lambda axv: (jnp.arange(3)[None, :] == axv[:, None]).astype(point.dtype)
    lp = one_hot(ax) * kk[:, None] + one_hot(a_ax) * pa[:, None] + one_hot(b_ax) * pb[:, None]
    delta = lp - point
    dist2 = jnp.sum(delta * delta, axis=-1)
    dist_r = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    wi_rect = delta / dist_r[..., None]
    # double-sided: |cos| against the rect normal (the `ax` component)
    cos_l = jnp.abs(jnp.take_along_axis(wi_rect, ax[:, None], axis=-1)[:, 0])
    area = jnp.abs(
        (lights.a1[idx] - lights.a0[idx]) * (lights.b1[idx] - lights.b0[idx])
    )
    pdf_rect = dist2 / jnp.maximum(cos_l * area, 1e-9)
    valid_rect = (cos_l > 1e-6) & (area > 1e-12)

    is_rect = kind == 1
    wi = jnp.where(is_rect[..., None], wi_rect, wi_sph)
    dist = jnp.where(is_rect, dist_r, dist_sph)
    # effective density of the whole procedure: choose light (1/L), then
    # direction (pdf_one) -> divide contributions by pdf_one / L
    pdf = jnp.where(is_rect, pdf_rect, pdf_sph) / L
    valid = jnp.where(is_rect, valid_rect, valid_sph)
    return wi, dist, pdf, idx, valid


def light_dir_pdf(
    lights: LightTable, point: jnp.ndarray, wd: jnp.ndarray
) -> jnp.ndarray:
    """Density with which :func:`sample_light_dirs` would generate ``wd``.

    Evaluated for the NEAREST table light along ``wd`` — the emitter a
    BSDF-sampled ray actually lands on — including the uniform 1/L light
    choice; 0 where no table light lies along ``wd`` (sky, or an emitter
    the sampler cannot produce, whose emission must then ride the BSDF
    estimator at full weight). This is the light-strategy pdf in the MIS
    power heuristic (``render/integrator.py``); keeping it per-nearest-
    light (not the L-mixture) matches the estimator's partition of the
    integrand by sampled light, so the two strategies' weights sum to 1
    per emitting surface point.

    ``point``: [R, 3]; ``wd``: [R, 3] unit directions. Returns [R] f32.
    Vectorized [R, L] over the (tiny, static) light table.
    """
    pt = point[:, None, :]                                           # [R,1,3]
    w = wd[:, None, :]

    # --- sphere lights: inside the visible cone <=> the ray hits the cap
    c = lights.center[None, :, :]                                    # [1,L,3]
    r = lights.radius[None, :]
    to_c = c - pt                                                    # [R,L,3]
    d2 = jnp.sum(to_c * to_c, axis=-1)
    outside = d2 > r * r * (1.0 + 1e-4)
    sin2_max = jnp.clip(r * r / jnp.maximum(d2, 1e-12), 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
    cos_ray = jnp.sum(w * to_c, axis=-1)                             # d*cos
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    in_cone = cos_ray > cos_max * d
    solid_angle = 2.0 * jnp.pi * (1.0 - cos_max)
    pdf_sph = 1.0 / jnp.maximum(solid_angle, 1e-12)
    disc = jnp.maximum(cos_ray * cos_ray - (d2 - r * r), 0.0)
    t_sph = cos_ray - jnp.sqrt(disc)
    hit_sph = outside & in_cone & (solid_angle > 1e-9) & (t_sph > 1e-4)

    # --- rect lights: plane crossing inside the bounds (double-sided)
    ax = lights.axis                                                 # [L]
    oh = (jnp.arange(3)[None, :] == ax[:, None]).astype(point.dtype)  # [L,3]
    a_oh = (jnp.arange(3)[None, :] == jnp.asarray(_RECT_AXES)[ax, 0][:, None]).astype(point.dtype)
    b_oh = (jnp.arange(3)[None, :] == jnp.asarray(_RECT_AXES)[ax, 1][:, None]).astype(point.dtype)
    w_n = jnp.sum(w * oh[None, :, :], axis=-1)                       # [R,L]
    p_n = jnp.sum(pt * oh[None, :, :], axis=-1)
    t_rect = (lights.k[None, :] - p_n) / jnp.where(
        jnp.abs(w_n) > 1e-9, w_n, 1e-9
    )
    hp = pt + w * t_rect[..., None]                                  # [R,L,3]
    pa = jnp.sum(hp * a_oh[None, :, :], axis=-1)
    pb = jnp.sum(hp * b_oh[None, :, :], axis=-1)
    lo_a = jnp.minimum(lights.a0, lights.a1)[None, :]
    hi_a = jnp.maximum(lights.a0, lights.a1)[None, :]
    lo_b = jnp.minimum(lights.b0, lights.b1)[None, :]
    hi_b = jnp.maximum(lights.b0, lights.b1)[None, :]
    in_rect = (pa >= lo_a) & (pa <= hi_a) & (pb >= lo_b) & (pb <= hi_b)
    area = jnp.abs((lights.a1 - lights.a0) * (lights.b1 - lights.b0))[None, :]
    cos_l = jnp.abs(w_n)
    pdf_rect = (t_rect * t_rect) / jnp.maximum(cos_l * area, 1e-9)
    hit_rect = in_rect & (t_rect > 1e-4) & (cos_l > 1e-6) & (area > 1e-12)

    is_rect = (lights.kind == 1)[None, :]
    hit = jnp.where(is_rect, hit_rect, hit_sph)                      # [R,L]
    t = jnp.where(is_rect, t_rect, t_sph)
    pdf = jnp.where(is_rect, pdf_rect, pdf_sph)

    t = jnp.where(hit, t, jnp.inf)
    nearest = jnp.argmin(t, axis=-1)                                 # [R]
    any_hit = jnp.any(hit, axis=-1)
    pdf_near = jnp.take_along_axis(pdf, nearest[:, None], axis=-1)[:, 0]
    return jnp.where(any_hit, pdf_near / lights.count, 0.0)


# ---------------------------------------------------------------------------
# Plane-form twins (the fast path's NEE tail)
# ---------------------------------------------------------------------------
#
# The [R, 3] / [R, L] forms above materialize lane-padded temps at every
# fusion boundary (an [R, 3] temp pads its minor dim 128x; [R, L<128]
# likewise — PERF.md trap). The light table is tiny and STATIC, so these
# twins loop over the lights in python and keep every array a dense [R]
# plane; branch selection (sphere vs rect light) is by masked select on
# device scalars. Selected values match the array forms (same formulas,
# same guards) — tests/test_nee.py::TestPlaneLights pins it.


def sample_light_dirs_planes(lights: LightTable, px, py, pz, u0, u1, u2):
    """Plane twin of :func:`sample_light_dirs`.

    Returns ``(wix, wiy, wiz, dist, pdf_w, idx, valid)`` — all [R] planes.
    """
    L = lights.count
    idx = jnp.minimum((u0 * L).astype(jnp.int32), L - 1)
    zero = jnp.zeros_like(px)
    wix = wiy = wiz = zero
    dist = zero
    pdf = zero
    valid = jnp.zeros(px.shape, bool)
    for l in range(L):
        sel = idx == l
        is_rect = lights.kind[l] == 1

        # --- sphere light l: cone sampling toward the visible cap
        cx, cy, cz = (lights.center[l, 0], lights.center[l, 1],
                      lights.center[l, 2])
        r = lights.radius[l]
        tcx, tcy, tcz = cx - px, cy - py, cz - pz
        d2 = tcx * tcx + tcy * tcy + tcz * tcz
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        outside = d2 > r * r * (1.0 + 1e-4)
        sin2_max = jnp.clip(r * r / jnp.maximum(d2, 1e-12), 0.0, 1.0)
        cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
        cos_t = 1.0 - u1 * (1.0 - cos_max)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = 2.0 * jnp.pi * u2
        wx_, wy_, wz_ = tcx / d, tcy / d, tcz / d
        big_x = jnp.abs(wx_) > 0.9
        ax_ = jnp.where(big_x, 0.0, 1.0)
        ay_ = jnp.where(big_x, 1.0, 0.0)
        # v1 = normalize(cross(w, a)); a has az == 0
        c1x = -wz_ * ay_
        c1y = wz_ * ax_
        c1z = wx_ * ay_ - wy_ * ax_
        inv1 = 1.0 / jnp.sqrt(jnp.maximum(
            c1x * c1x + c1y * c1y + c1z * c1z, 1e-24))
        v1x, v1y, v1z = c1x * inv1, c1y * inv1, c1z * inv1
        v2x = wy_ * v1z - wz_ * v1y
        v2y = wz_ * v1x - wx_ * v1z
        v2z = wx_ * v1y - wy_ * v1x
        cp, sp = jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t
        sx = wx_ * cos_t + v1x * cp + v2x * sp
        sy = wy_ * cos_t + v1y * cp + v2y * sp
        sz = wz_ * cos_t + v1z * cp + v2z * sp
        solid_angle = 2.0 * jnp.pi * (1.0 - cos_max)
        pdf_sph = 1.0 / jnp.maximum(solid_angle, 1e-12)
        cos_ray = sx * tcx + sy * tcy + sz * tcz
        disc = jnp.maximum(cos_ray * cos_ray - (d2 - r * r), 0.0)
        dist_sph = cos_ray - jnp.sqrt(disc)
        valid_sph = outside & (solid_angle > 1e-9)

        # --- rect light l: uniform area point
        ax = lights.axis[l]
        a_ax = jnp.asarray(_RECT_AXES)[ax, 0]
        b_ax = jnp.asarray(_RECT_AXES)[ax, 1]
        pa = lights.a0[l] + u1 * (lights.a1[l] - lights.a0[l])
        pb = lights.b0[l] + u2 * (lights.b1[l] - lights.b0[l])
        kk = lights.k[l]

        def oh(axv, c):
            return (axv == c).astype(px.dtype)

        lpx = oh(ax, 0) * kk + oh(a_ax, 0) * pa + oh(b_ax, 0) * pb
        lpy = oh(ax, 1) * kk + oh(a_ax, 1) * pa + oh(b_ax, 1) * pb
        lpz = oh(ax, 2) * kk + oh(a_ax, 2) * pa + oh(b_ax, 2) * pb
        dx_, dy_, dz_ = lpx - px, lpy - py, lpz - pz
        dist2 = dx_ * dx_ + dy_ * dy_ + dz_ * dz_
        dist_r = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        rx, ry, rz = dx_ / dist_r, dy_ / dist_r, dz_ / dist_r
        cos_l = jnp.abs(oh(ax, 0) * rx + oh(ax, 1) * ry + oh(ax, 2) * rz)
        area = jnp.abs((lights.a1[l] - lights.a0[l])
                       * (lights.b1[l] - lights.b0[l]))
        pdf_rect = dist2 / jnp.maximum(cos_l * area, 1e-9)
        valid_rect = (cos_l > 1e-6) & (area > 1e-12)

        lx = jnp.where(is_rect, rx, sx)
        ly = jnp.where(is_rect, ry, sy)
        lz = jnp.where(is_rect, rz, sz)
        ld = jnp.where(is_rect, dist_r, dist_sph)
        lpdf = jnp.where(is_rect, pdf_rect, pdf_sph)
        lval = jnp.where(is_rect, valid_rect, valid_sph)

        wix = jnp.where(sel, lx, wix)
        wiy = jnp.where(sel, ly, wiy)
        wiz = jnp.where(sel, lz, wiz)
        dist = jnp.where(sel, ld, dist)
        pdf = jnp.where(sel, lpdf, pdf)
        valid = jnp.where(sel, lval, valid)
    return wix, wiy, wiz, dist, pdf / L, idx, valid


def light_dir_pdf_planes(lights: LightTable, px, py, pz, wx, wy, wz):
    """Plane twin of :func:`light_dir_pdf` ([R] planes in/out)."""
    INF = jnp.float32(3.0e38)
    t_best = jnp.full(px.shape, 3.0e38, px.dtype)
    pdf_best = jnp.zeros_like(px)
    any_hit = jnp.zeros(px.shape, bool)
    for l in range(lights.count):
        is_rect = lights.kind[l] == 1

        # sphere cap
        cx, cy, cz = (lights.center[l, 0], lights.center[l, 1],
                      lights.center[l, 2])
        r = lights.radius[l]
        tcx, tcy, tcz = cx - px, cy - py, cz - pz
        d2 = tcx * tcx + tcy * tcy + tcz * tcz
        outside = d2 > r * r * (1.0 + 1e-4)
        sin2_max = jnp.clip(r * r / jnp.maximum(d2, 1e-12), 0.0, 1.0)
        cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
        cos_ray = wx * tcx + wy * tcy + wz * tcz
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        in_cone = cos_ray > cos_max * d
        solid_angle = 2.0 * jnp.pi * (1.0 - cos_max)
        pdf_sph = 1.0 / jnp.maximum(solid_angle, 1e-12)
        disc = jnp.maximum(cos_ray * cos_ray - (d2 - r * r), 0.0)
        t_sph = cos_ray - jnp.sqrt(disc)
        hit_sph = outside & in_cone & (solid_angle > 1e-9) & (t_sph > 1e-4)

        # rect plane crossing
        ax = lights.axis[l]
        a_ax = jnp.asarray(_RECT_AXES)[ax, 0]
        b_ax = jnp.asarray(_RECT_AXES)[ax, 1]

        def oh(axv, c):
            return (axv == c).astype(px.dtype)

        w_n = oh(ax, 0) * wx + oh(ax, 1) * wy + oh(ax, 2) * wz
        p_n = oh(ax, 0) * px + oh(ax, 1) * py + oh(ax, 2) * pz
        t_rect = (lights.k[l] - p_n) / jnp.where(
            jnp.abs(w_n) > 1e-9, w_n, 1e-9
        )
        hx, hy, hz = px + wx * t_rect, py + wy * t_rect, pz + wz * t_rect
        pa = oh(a_ax, 0) * hx + oh(a_ax, 1) * hy + oh(a_ax, 2) * hz
        pb = oh(b_ax, 0) * hx + oh(b_ax, 1) * hy + oh(b_ax, 2) * hz
        lo_a = jnp.minimum(lights.a0[l], lights.a1[l])
        hi_a = jnp.maximum(lights.a0[l], lights.a1[l])
        lo_b = jnp.minimum(lights.b0[l], lights.b1[l])
        hi_b = jnp.maximum(lights.b0[l], lights.b1[l])
        in_rect = (pa >= lo_a) & (pa <= hi_a) & (pb >= lo_b) & (pb <= hi_b)
        area = jnp.abs((lights.a1[l] - lights.a0[l])
                       * (lights.b1[l] - lights.b0[l]))
        cos_l = jnp.abs(w_n)
        pdf_rect = (t_rect * t_rect) / jnp.maximum(cos_l * area, 1e-9)
        hit_rect = in_rect & (t_rect > 1e-4) & (cos_l > 1e-6) & (area > 1e-12)

        hit = jnp.where(is_rect, hit_rect, hit_sph)
        t = jnp.where(hit, jnp.where(is_rect, t_rect, t_sph), INF)
        pdf = jnp.where(is_rect, pdf_rect, pdf_sph)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        pdf_best = jnp.where(better, pdf, pdf_best)
        any_hit = any_hit | hit
    return jnp.where(any_hit, pdf_best / lights.count, 0.0)
