"""Silhouette (visibility) gradients via edge sampling on sphere contours.

The interior autodiff path (``trace_diff`` / ``trace_fast_diff``)
differentiates the integrand but NOT the integration domain: moving a
sphere moves the visibility discontinuity, and that boundary term is
invisible to autodiff (``examples/inverse_render.py`` relies on shading
cues only). This module adds the missing boundary term with explicit edge
sampling — the approach of differentiable-rendering edge samplers (Li et
al. 2018 "redner"), specialized to the one silhouette family this scene
model has under primary visibility: the visible contour of a sphere, which
is a closed-form circle.

For a pixel-area-normalized image I and scene parameter θ,

    dI_p/dθ = (interior autodiff term)
            + ∮_edges (L_in − L_out)(x) · (n̂_⊥ · dP(x)/dθ) h_p(P(x)) dl,

with P the film projection, n̂_⊥ the image-space outward edge normal, and
h_p the (box) pixel filter. The contour of sphere (c, r) seen from o is
the circle of radius r·sqrt(1−r²/d²) centred at c − (r²/d)·ĝ in the plane
⊥ ĝ = (c−o)/d — differentiable in closed form, so dP/dθ comes from one
``jax.vjp`` through the projection chain. (L_in − L_out) is estimated by
tracing ray pairs straddling the edge; occluded contour segments cancel
automatically (L_in ≈ L_out).

Scope: primary visibility (lens-integrated for aperture > 0 — each edge
sample rides its own lens point); sphere contours — including MOVING
spheres, whose edge samples draw per-sample shutter times so the vjp
carries the ``center_delta`` component — rect boundary edges, and box
silhouette edges (the 12 transformed segments, masked by the
front-face/back-face sign test).

Indirect silhouettes (shadow and reflection edges) are NOT sampled, by
measured design: sampling them requires reprojecting each secondary
vertex's view of every contour (an [R x contours] pairing per bounce —
the general integrator's whole-frame cost again per edge family on this
device). The resulting BIAS is bounded: for parameter θ it is at most
  Σ_unsampled-families ∮ |L_in − L_out| · |n̂_⊥ · dP/dθ| dl,
i.e. (edge length in the secondary domain) x (radiance jump) x (the
projected parameter velocity) — zero wherever the occluder's shadow or
reflection falls on a region the interior term already explains (smooth
shading), and second-order in practice because secondary-domain jumps
are attenuated by the BSDF throughput. The inverse-rendering tests
recover geometry through the primary term alone
(tests/test_silhouette.py position-recovery cases).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pathtrace_tpu.camera import Camera, get_rays
from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.render import integrator

TWO_PI = 6.283185307179586


def project_to_film(camera: Camera, x, offset=None):
    """World point -> film coordinates (s, t) in [0,1]².

    Inverts ``get_rays``: intersects the ray (origin+offset)→x with the
    focus plane and expresses it in the film basis. ``x`` is [..., 3];
    ``offset`` (optional, broadcastable [..., 3]) is a lens-disk offset —
    a thin-lens camera maps x to different film points per lens sample,
    and edge sampling under aperture > 0 Monte-Carlos over them.
    """
    o = camera.origin if offset is None else camera.origin + offset
    dw = x - o
    plane = jnp.einsum(
        "...i,i->...", camera.lower_left_corner - o, camera.w
    )
    denom = jnp.einsum("...i,i->...", dw, camera.w)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    k = plane / denom
    q = o + k[..., None] * dw
    rel = q - camera.lower_left_corner
    s = jnp.einsum("...i,i->...", rel, camera.u) / jnp.dot(
        camera.horizontal, camera.u
    )
    t = jnp.einsum("...i,i->...", rel, camera.v) / jnp.dot(
        camera.vertical, camera.v
    )
    in_front = denom < 0.0  # w points backward from the view direction
    return s, t, in_front


def _contour_points(origin, center, radius, phis):
    """Closed-form visible-contour circle of a sphere. [M] angles -> [M,3].

    ``origin`` may be [3] (pinhole) or [M, 3] (per-sample lens points —
    each lens point sees its own contour). Differentiable w.r.t. center
    and radius."""
    r = jnp.abs(radius)
    g = center - origin                                      # [3] or [M,3]
    g = jnp.broadcast_to(g, phis.shape + (3,))
    d = jnp.sqrt(jnp.maximum(jnp.sum(g * g, axis=-1, keepdims=True), 1e-12))
    gh = g / d
    d = d[..., 0]
    # stable in-plane basis (per sample)
    up = jnp.where(jnp.abs(gh[..., 1:2]) < 0.9,
                   jnp.asarray([0.0, 1.0, 0.0]),
                   jnp.asarray([1.0, 0.0, 0.0]))
    e1 = jnp.cross(gh, up)
    e1 = e1 / jnp.sqrt(
        jnp.maximum(jnp.sum(e1 * e1, axis=-1, keepdims=True), 1e-12)
    )
    e2 = jnp.cross(gh, e1)
    frac = jnp.clip(1.0 - (r * r) / (d * d), 1e-6, 1.0)
    c_s = center - (r * r / d)[..., None] * gh
    r_s = (r * jnp.sqrt(frac))[..., None]
    cs, sn = jnp.cos(phis)[:, None], jnp.sin(phis)[:, None]
    return c_s + r_s * (cs * e1 + sn * e2)


def _film_points(camera, centers, radii, phis, offsets=None):
    """[S] spheres × [M] angles -> film P [S, M, 2] (pixel units applied
    by the caller), plus the in-front mask. ``offsets`` [M, 3]: per-sample
    lens-disk offsets (aperture > 0); None = pinhole."""
    o = camera.origin if offsets is None else camera.origin + offsets

    def per_sphere(c, r):
        x = _contour_points(o, c, r, phis)                   # [M,3]
        s, t, ok = project_to_film(camera, x, offset=offsets)
        return jnp.stack([s, t], axis=-1), ok

    P, ok = jax.vmap(per_sphere)(centers, radii)
    return P, ok


def _edge_radiance_pairs(scene, camera, s, t, n_hat_px, eps_px, width, height,
                         key, max_depth, features, lens_uni=None,
                         time_uni=None):
    """Trace ray pairs straddling the edge at film points (s, t).

    ``n_hat_px``: outward edge normal in pixel units. ``lens_uni`` [K, 2]:
    the lens-disk uniforms the film points were projected with (aperture
    > 0) — the pair must ride the SAME lens point as the projection or the
    edge blurs out of the pair's line of sight. ``time_uni`` [K]: shutter
    uniforms the contours were evaluated at (moving spheres) — the pair
    must likewise ride the SAME time. Returns (L_in - L_out) [K, 3]."""
    duv = jnp.stack([n_hat_px[..., 0] / width, n_hat_px[..., 1] / height],
                    axis=-1) * eps_px
    s_in = s - duv[..., 0]
    t_in = t - duv[..., 1]
    s_out = s + duv[..., 0]
    t_out = t + duv[..., 1]
    ss = jnp.concatenate([s_in, s_out])
    tt = jnp.concatenate([t_in, t_out])
    if lens_uni is None:
        lens2 = jnp.full(ss.shape + (2,), 0.5)
    else:
        lens2 = jnp.concatenate([lens_uni, lens_uni], axis=0)
    if time_uni is None:
        t2 = jnp.full(ss.shape + (1,), 0.5)
    else:
        t2 = jnp.concatenate([time_uni, time_uni])[:, None]
    uni = jnp.concatenate([lens2, t2], axis=-1)
    ro, rd, tm = get_rays(camera, ss, tt, uni)
    radiance, _ = integrator.trace(
        scene, ro, rd, tm, key, max_depth, features=features
    )
    K = s.shape[0]
    return radiance[:K] - radiance[K:]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "max_depth", "features",
                     "n_samples", "eps_px"),
)
def silhouette_grads(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    grad_img,
    key,
    max_depth: int = 4,
    features: SceneFeatures = None,
    n_samples: int = 128,
    eps_px: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Boundary-term gradients for sphere centers and radii.

    ``grad_img``: [H, W, 3] loss cotangent dLoss/dimage (image row 0 =
    bottom, the render-time convention). Returns (d_center [N, 3],
    d_center_delta [N, 3], d_radius [N]) to be ADDED to the interior
    autodiff gradients.

    Moving spheres (``features.has_motion``): each edge sample draws a
    shutter time and evaluates the contour at that time's center
    ``c + s(τ)·Δ`` — the pair rays ride the SAME time — so the boundary
    term is a Monte-Carlo estimate over the shutter interval and the vjp
    yields the ``center_delta`` component too (the r4 gap: contours were
    evaluated at time-0 centers only).
    """
    features = features or SceneFeatures.all_on()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    centers = scene.spheres.center
    deltas = scene.spheres.center_delta
    radii = scene.spheres.radius
    S = centers.shape[0]
    M = n_samples
    # stratified jittered angles, shared across spheres
    jitter = jax.random.uniform(jax.random.fold_in(key, 0), (M,))
    phis = (jnp.arange(M) + jitter) * (TWO_PI / M)

    # per-sample shutter times (shared across spheres, like the angles)
    motion = bool(features.has_motion)
    if motion:
        tau = jax.random.uniform(jax.random.fold_in(key, 3), (M,))
        t_ray = camera.time0 + tau * (camera.time1 - camera.time0)
        sfac = (t_ray[None, :] - scene.spheres.time0[:, None]) * \
            scene.spheres.inv_time_delta[:, None]              # [S, M]
    else:
        tau = None
        sfac = jnp.zeros((S, M))

    def eff_centers(c, d):
        return c[:, None, :] + sfac[..., None] * d[:, None, :]  # [S, M, 3]

    # aperture > 0: Monte-Carlo over the lens — each edge sample rides its
    # own lens point (offset -> contour -> projection -> pair rays all
    # share it). lens_radius == 0 reduces to the pinhole path exactly.
    from pathtrace_tpu.ops import math as pmath

    lens_uni = jax.random.uniform(jax.random.fold_in(key, 2), (M, 2))
    disk = pmath.random_in_unit_disk(lens_uni[:, 0], lens_uni[:, 1])
    offsets = camera.lens_radius * (
        disk[:, 0:1] * camera.u + disk[:, 1:2] * camera.v
    )                                                            # [M,3]

    # --- geometry of the projected contour (values, no grad yet) ---
    c_eff = eff_centers(centers, deltas)
    P, in_front = _film_points(camera, c_eff, radii, phis, offsets)
    P = jax.lax.stop_gradient(P)
    Ppx = P * jnp.asarray([width, height])                       # pixel units
    # tangent dP/dφ via a per-sample central difference AT THE SAME
    # (time, lens point): a roll along the sample axis would mix
    # neighbors that ride different shutter times / lens offsets, turning
    # the tangent (and hence the edge normal) into noise — measured as a
    # ~17x-understated center_delta gradient before this fix
    eps_phi = 1e-3
    Pp, _ = _film_points(camera, c_eff, radii, phis + eps_phi, offsets)
    Pm, _ = _film_points(camera, c_eff, radii, phis - eps_phi, offsets)
    tangent = jax.lax.stop_gradient(Pp - Pm) * jnp.asarray(
        [width, height]
    ) / (2.0 * eps_phi)                                          # [S,M,2]
    speed = jnp.sqrt(jnp.maximum(jnp.sum(tangent**2, axis=-1), 1e-12))
    n_hat = jnp.stack(
        [tangent[..., 1], -tangent[..., 0]], axis=-1
    ) / speed[..., None]
    # orient outward: away from the projected (per-sample-time) center
    pc_s, pc_t, _ = project_to_film(camera, c_eff)               # [S,M]
    pc = jnp.stack([pc_s * width, pc_t * height], axis=-1)       # [S,M,2]
    out_dir = Ppx - pc
    flip = jnp.sign(
        jnp.sum(n_hat * out_dir, axis=-1, keepdims=True) + 1e-12
    )
    n_hat = n_hat * flip

    # --- radiance jump across the edge ---
    flat = lambda a: a.reshape(S * M, *a.shape[2:])
    dL = _edge_radiance_pairs(
        scene, camera, flat(P[..., 0]), flat(P[..., 1]), flat(n_hat),
        eps_px, width, height, jax.random.fold_in(key, 1), max_depth,
        features, lens_uni=jnp.tile(lens_uni, (S, 1)),
        time_uni=jnp.tile(tau, (S,)) if motion else None,
    ).reshape(S, M, 3)

    # --- pixel cotangent at each edge sample ---
    xi = jnp.clip((P[..., 0] * width).astype(jnp.int32), 0, width - 1)
    yi = jnp.clip((P[..., 1] * height).astype(jnp.int32), 0, height - 1)
    g = grad_img[yi, xi]                                         # [S,M,3]

    inside = (
        (P[..., 0] >= 0.0) & (P[..., 0] < 1.0)
        & (P[..., 1] >= 0.0) & (P[..., 1] < 1.0)
        & in_front
        & scene.spheres.mask[:, None]
    )
    # weight per sample: (dLoss/dI_p · (L_in − L_out)) |dP/dφ| 2π/M, with
    # the pixel filter 1/A_p absorbed by pixel units (A_p = 1)
    w = jnp.sum(g * dL, axis=-1) * speed * (TWO_PI / M)
    w = jnp.where(inside, w, 0.0)
    cotangent = w[..., None] * n_hat                             # [S,M,2]
    cotangent = jax.lax.stop_gradient(cotangent)

    # --- pull the image-space cotangent back through the projection ---
    def film_px(c, d, r):
        Pf, _ = _film_points(camera, eff_centers(c, d), r, phis, offsets)
        return Pf * jnp.asarray([width, height])

    _, vjp = jax.vjp(film_px, centers, deltas, radii)
    d_center, d_delta, d_radius = vjp(cotangent)
    return d_center, d_delta, d_radius


# ---------------------------------------------------------------------------
# rect boundary edges and box silhouette edges
# ---------------------------------------------------------------------------
#
# A rect is an open surface: its whole boundary (4 segments) is a visibility
# discontinuity. A box is a convex solid: an edge silhouettes where exactly
# one adjacent face is front-facing — the classic sign test
# (n1·(x−o))·(n2·(x−o)) < 0, evaluated per sample since it varies along the
# edge. Both families share the sphere path's estimator: project samples to
# the film, trace straddling ray pairs for (L_in − L_out), weight by the
# local line measure, and pull the image-space cotangent back through the
# projection with one jax.vjp. Matches the cornell geometry the reference
# renders (reference src/presets.rs:373-458) — rect walls + rotated cuboids.


def _edge_us(key, n_per_edge):
    """Strictly-interior jittered samples + a finite-diff step for tangents."""
    M = n_per_edge
    jit = jax.random.uniform(key, (M,))
    us = (jnp.arange(M) + 0.05 + 0.9 * jit) / M
    h = 0.04 / M
    return us, h


def _rect_boundary_ab(a0, a1, b0, b1, us):
    """Boundary of [a0,a1]x[b0,b1]: 4 edges x M samples -> (a, b) [S, 4M].

    Edge order: b=b0 run, a=a1 run, b=b1 run (reversed), a=a0 run
    (reversed) — a closed CCW loop in the (a, b) plane."""
    al = a0[:, None] + us[None, :] * (a1 - a0)[:, None]
    bl = b0[:, None] + us[None, :] * (b1 - b0)[:, None]
    ar = a1[:, None] - us[None, :] * (a1 - a0)[:, None]
    br = b1[:, None] - us[None, :] * (b1 - b0)[:, None]
    S, M = al.shape
    cs = lambda *xs: jnp.concatenate(xs, axis=1)
    a = cs(al, jnp.broadcast_to(a1[:, None], (S, M)), ar,
           jnp.broadcast_to(a0[:, None], (S, M)))
    b = cs(jnp.broadcast_to(b0[:, None], (S, M)), bl,
           jnp.broadcast_to(b1[:, None], (S, M)), br)
    return a, b


def _rect_world_pts(axis, k, a0, a1, b0, b1, us):
    """[S, 4M, 3] world points on the rect boundaries (one-hot axis
    placement, matching ops.intersect.rect_nearest's (axis, a, b) frame)."""
    a, b = _rect_boundary_ab(a0, a1, b0, b1, us)
    a_axis = jnp.where(axis == 0, 1, 0)
    b_axis = jnp.where(axis == 2, 1, 2)
    oh = lambda ax: (jnp.arange(3)[None, :] == ax[:, None]).astype(a.dtype)
    return (
        a[..., None] * oh(a_axis)[:, None, :]
        + b[..., None] * oh(b_axis)[:, None, :]
        + k[:, None, None] * oh(axis)[:, None, :]
    )


def _box_edge_obj(p0, p1, us):
    """Object-space points on the 12 box edges: [S, 12M, 3] plus the two
    adjacent-face object normals per sample ([S, 12M, 3] each)."""
    pts, n1s, n2s = [], [], []
    eye = jnp.eye(3, dtype=p0.dtype)
    for e in range(3):
        oa, ob = (e + 1) % 3, (e + 2) % 3
        run = p0[:, e:e + 1] + us[None, :] * (p1[:, e:e + 1] - p0[:, e:e + 1])
        for sa in (0, 1):
            va = (p1 if sa else p0)[:, oa:oa + 1]
            for sb in (0, 1):
                vb = (p1 if sb else p0)[:, ob:ob + 1]
                S, M = run.shape
                x = jnp.zeros((S, M, 3), p0.dtype)
                x = x.at[..., e].set(run)
                x = x.at[..., oa].set(jnp.broadcast_to(va, (S, M)))
                x = x.at[..., ob].set(jnp.broadcast_to(vb, (S, M)))
                pts.append(x)
                sign_a = 1.0 if sa else -1.0
                sign_b = 1.0 if sb else -1.0
                n1s.append(jnp.broadcast_to(sign_a * eye[oa], (S, M, 3)))
                n2s.append(jnp.broadcast_to(sign_b * eye[ob], (S, M, 3)))
    return (jnp.concatenate(pts, axis=1), jnp.concatenate(n1s, axis=1),
            jnp.concatenate(n2s, axis=1))


def _edge_family_term(scene, camera, width, height, grad_img, key,
                      max_depth, features, film_px_of, params, center_world,
                      extra_mask, n_samples_total):
    """Shared edge estimator: weights + image-space cotangent for one
    primitive family.

    ``film_px_of(*params, h)``: -> (Ppx [S,K,2], in_front [S,K]) at the
    jittered samples shifted by ``h`` along the edge parameter (h=0 gives
    the samples themselves; a small h gives the tangent secant).
    ``center_world`` [S,3]: a point inside the shape, for outward
    orientation (valid for convex silhouettes). Returns the vjp-ready
    cotangent [S,K,2] (stop-gradiented) to feed film_px_of's vjp.
    """
    P0, in_front = film_px_of(*params, 0.0)
    P0 = jax.lax.stop_gradient(P0)
    P1, _ = film_px_of(*params, 1.0)                        # h-shifted
    P1 = jax.lax.stop_gradient(P1)
    tangent = P1 - P0                                       # ∝ dP/du
    speed = jnp.sqrt(jnp.maximum(jnp.sum(tangent**2, axis=-1), 1e-12))
    n_hat = jnp.stack([tangent[..., 1], -tangent[..., 0]], axis=-1) \
        / speed[..., None]
    pc_s, pc_t, _ = project_to_film(camera, center_world)
    pc = jnp.stack([pc_s * width, pc_t * height], axis=-1)
    flip = jnp.sign(
        jnp.sum(n_hat * (P0 - pc[:, None, :]), axis=-1, keepdims=True)
        + 1e-12
    )
    n_hat = n_hat * flip

    S, K = P0.shape[:2]
    Pu = P0 / jnp.asarray([width, height])                  # film units
    flat = lambda a: a.reshape(S * K, *a.shape[2:])
    dL = _edge_radiance_pairs(
        scene, camera, flat(Pu[..., 0]), flat(Pu[..., 1]), flat(n_hat),
        0.5, width, height, jax.random.fold_in(key, 1), max_depth,
        features,
    ).reshape(S, K, 3)

    xi = jnp.clip(P0[..., 0].astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(P0[..., 1].astype(jnp.int32), 0, height - 1)
    g = grad_img[yi, xi]

    inside = (
        (Pu[..., 0] >= 0.0) & (Pu[..., 0] < 1.0)
        & (Pu[..., 1] >= 0.0) & (Pu[..., 1] < 1.0)
        & in_front & extra_mask
    )
    # per-edge parameter u in [0,1) with M samples; tangent is the
    # h-step secant, so speed/h is |dP/du| and the measure is 1/M per
    # sample: w = (g·dL) |dP/du| / M
    M = n_samples_total
    w = jnp.sum(g * dL, axis=-1) * speed * (1.0 / M)
    w = jnp.where(inside, w, 0.0)
    return jax.lax.stop_gradient(w[..., None] * n_hat)


def rect_silhouette_grads(scene, camera, width, height, grad_img, key,
                          max_depth=4, features=None, n_per_edge=32):
    """Boundary-term gradients for rect parameters (a0, a1, b0, b1, k)."""
    features = features or SceneFeatures.all_on()
    rc = scene.rects
    us, h = _edge_us(jax.random.fold_in(key, 0), n_per_edge)
    axis = rc.axis

    def film_px_of(a0, a1, b0, b1, k, hh):
        x = _rect_world_pts(axis, k, a0, a1, b0, b1, us + hh * h)
        s, t, ok = project_to_film(camera, x)
        return (jnp.stack([s * width, t * height], axis=-1), ok)

    extra = jnp.broadcast_to(rc.mask[:, None], (rc.count, 4 * n_per_edge))
    cot = _edge_family_term(
        scene, camera, width, height, grad_img, key, max_depth, features,
        film_px_of, (rc.a0, rc.a1, rc.b0, rc.b1, rc.k),
        _rect_center_world(rc), extra, n_per_edge,
    )
    # secant scale: _edge_family_term's tangent is P(u+h) − P(u), i.e.
    # h·|dP/du| — divide the weights by h to recover the true line measure
    cot = cot / h

    def film_pts(a0, a1, b0, b1, k):
        x = _rect_world_pts(axis, k, a0, a1, b0, b1, us)
        s, t, _ = project_to_film(camera, x)
        return jnp.stack([s * width, t * height], axis=-1)

    _, vjp = jax.vjp(film_pts, rc.a0, rc.a1, rc.b0, rc.b1, rc.k)
    d_a0, d_a1, d_b0, d_b1, d_k = vjp(cot)
    return {"rects.a0": d_a0, "rects.a1": d_a1, "rects.b0": d_b0,
            "rects.b1": d_b1, "rects.k": d_k}


def _rect_center_world(rc):
    axis = rc.axis
    a_axis = jnp.where(axis == 0, 1, 0)
    b_axis = jnp.where(axis == 2, 1, 2)
    oh = lambda ax: (jnp.arange(3)[None, :] == ax[:, None]).astype(rc.k.dtype)
    return (
        (0.5 * (rc.a0 + rc.a1))[:, None] * oh(a_axis)
        + (0.5 * (rc.b0 + rc.b1))[:, None] * oh(b_axis)
        + rc.k[:, None] * oh(axis)
    )


def box_silhouette_grads(scene, camera, width, height, grad_img, key,
                         max_depth=4, features=None, n_per_edge=32):
    """Boundary-term gradients for box parameters (p0, p1, world_from_obj).

    Samples the 12 transformed edges; only samples where the edge
    silhouettes (one adjacent face front-facing, one back-facing) carry
    weight."""
    features = features or SceneFeatures.all_on()
    bx = scene.boxes
    us, h = _edge_us(jax.random.fold_in(key, 0), n_per_edge)

    def world_pts(p0, p1, wfo, uss):
        x_obj, _, _ = _box_edge_obj(p0, p1, uss)
        lin = wfo[:, None, :, :3]
        return jnp.einsum("sxij,sxj->sxi", jnp.broadcast_to(
            lin, x_obj.shape[:2] + (3, 3)), x_obj) + wfo[:, None, :, 3]

    # silhouette mask from the adjacent-face sign test (object normals
    # through obj_from_world^T; valid for general affines)
    x_obj, n1o, n2o = _box_edge_obj(jnp.asarray(bx.p0), jnp.asarray(bx.p1),
                                    us)
    ofw_lin = jnp.asarray(bx.obj_from_world)[:, :, :3]       # [S,3,3]
    to_world_n = lambda n: jnp.einsum("sji,sxj->sxi", ofw_lin, n)
    n1 = to_world_n(n1o)
    n2 = to_world_n(n2o)
    xw = world_pts(jnp.asarray(bx.p0), jnp.asarray(bx.p1),
                   jnp.asarray(bx.world_from_obj), us)
    view = xw - camera.origin
    s1 = jnp.sum(n1 * view, axis=-1)
    s2 = jnp.sum(n2 * view, axis=-1)
    sil = (s1 * s2) < 0.0
    extra = sil & bx.mask[:, None]

    def film_px_of(p0, p1, wfo, hh):
        x = world_pts(p0, p1, wfo, us + hh * h)
        s, t, ok = project_to_film(camera, x)
        return jnp.stack([s * width, t * height], axis=-1), ok

    center = jnp.einsum(
        "sij,sj->si", jnp.asarray(bx.world_from_obj)[:, :, :3],
        0.5 * (jnp.asarray(bx.p0) + jnp.asarray(bx.p1)),
    ) + jnp.asarray(bx.world_from_obj)[:, :, 3]

    cot = _edge_family_term(
        scene, camera, width, height, grad_img, key, max_depth, features,
        film_px_of, (bx.p0, bx.p1, bx.world_from_obj), center, extra,
        n_per_edge,
    )
    cot = cot / h

    def film_pts(p0, p1, wfo):
        x = world_pts(p0, p1, wfo, us)
        s, t, _ = project_to_film(camera, x)
        return jnp.stack([s * width, t * height], axis=-1)

    _, vjp = jax.vjp(film_pts, bx.p0, bx.p1, bx.world_from_obj)
    d_p0, d_p1, d_wfo = vjp(cot)
    return {"boxes.p0": d_p0, "boxes.p1": d_p1,
            "boxes.world_from_obj": d_wfo}


def silhouette_grads_all(scene, camera, width, height, grad_img, key,
                         max_depth=4, features=None, n_samples=128):
    """All visibility boundary terms present in the scene, as a dict keyed
    by scene-leaf path (matching ``parallel.inverse.split_scene`` names).
    """
    features = features or SceneFeatures.all_on()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    out = {}
    if features.has_spheres and scene.spheres.world_from_obj is not None:
        # generic-instanced spheres store OBJECT-space centers; the contour
        # math reads them as world coordinates. Skip the boundary term
        # (interior autodiff still flows through the affine) rather than
        # silently emit gradients for the wrong geometry.
        pass
    elif features.has_spheres:
        d_center, d_delta, d_radius = silhouette_grads(
            scene, camera, width, height, grad_img,
            jax.random.fold_in(key, 1), max_depth=max_depth,
            features=features, n_samples=n_samples,
        )
        out["spheres.center"] = d_center
        out["spheres.radius"] = d_radius
        if features.has_motion:
            out["spheres.center_delta"] = d_delta
    if features.has_rects:
        out.update(rect_silhouette_grads(
            scene, camera, width, height, grad_img,
            jax.random.fold_in(key, 2), max_depth=max_depth,
            features=features, n_per_edge=max(n_samples // 4, 8),
        ))
    if features.has_boxes:
        out.update(box_silhouette_grads(
            scene, camera, width, height, grad_img,
            jax.random.fold_in(key, 3), max_depth=max_depth,
            features=features, n_per_edge=max(n_samples // 4, 8),
        ))
    return out
