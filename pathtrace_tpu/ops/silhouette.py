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

Scope: primary visibility, zero-aperture cameras (the reference presets'
defocus blur already smooths the edge for autodiff), sphere primitives.
Indirect silhouettes (shadow/reflection edges) are not sampled.
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


def project_to_film(camera: Camera, x):
    """World point -> film coordinates (s, t) in [0,1]² (aperture 0).

    Inverts ``get_rays``: intersects the ray origin→x with the focus plane
    and expresses it in the film basis. ``x`` is [..., 3].
    """
    dw = x - camera.origin
    plane = jnp.dot(camera.lower_left_corner - camera.origin, camera.w)
    denom = jnp.einsum("...i,i->...", dw, camera.w)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    k = plane / denom
    q = camera.origin + k[..., None] * dw
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

    Differentiable w.r.t. center and radius."""
    r = jnp.abs(radius)
    g = center - origin
    d = jnp.sqrt(jnp.maximum(jnp.sum(g * g), 1e-12))
    gh = g / d
    # stable in-plane basis
    up = jnp.where(jnp.abs(gh[1]) < 0.9,
                   jnp.asarray([0.0, 1.0, 0.0]),
                   jnp.asarray([1.0, 0.0, 0.0]))
    e1 = jnp.cross(gh, up)
    e1 = e1 / jnp.sqrt(jnp.maximum(jnp.sum(e1 * e1), 1e-12))
    e2 = jnp.cross(gh, e1)
    frac = jnp.clip(1.0 - (r * r) / (d * d), 1e-6, 1.0)
    c_s = center - (r * r / d) * gh
    r_s = r * jnp.sqrt(frac)
    cs, sn = jnp.cos(phis), jnp.sin(phis)
    return c_s[None, :] + r_s * (cs[:, None] * e1[None, :] + sn[:, None] * e2[None, :])


def _film_points(camera, centers, radii, phis):
    """[S] spheres × [M] angles -> film P [S, M, 2] (pixel units applied
    by the caller), plus the in-front mask."""
    def per_sphere(c, r):
        x = _contour_points(camera.origin, c, r, phis)        # [M,3]
        s, t, ok = project_to_film(camera, x)
        return jnp.stack([s, t], axis=-1), ok

    P, ok = jax.vmap(per_sphere)(centers, radii)
    return P, ok


def _edge_radiance_pairs(scene, camera, s, t, n_hat_px, eps_px, width, height,
                         key, max_depth, features):
    """Trace ray pairs straddling the edge at film points (s, t).

    ``n_hat_px``: outward edge normal in pixel units. Returns
    (L_in - L_out) [K, 3]."""
    duv = jnp.stack([n_hat_px[..., 0] / width, n_hat_px[..., 1] / height],
                    axis=-1) * eps_px
    s_in = s - duv[..., 0]
    t_in = t - duv[..., 1]
    s_out = s + duv[..., 0]
    t_out = t + duv[..., 1]
    ss = jnp.concatenate([s_in, s_out])
    tt = jnp.concatenate([t_in, t_out])
    uni = jnp.full(ss.shape + (3,), 0.5)
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
    d_radius [N]) to be ADDED to the interior autodiff gradients.
    """
    features = features or SceneFeatures.all_on()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    centers = scene.spheres.center
    radii = scene.spheres.radius
    S = centers.shape[0]
    M = n_samples
    # stratified jittered angles, shared across spheres
    jitter = jax.random.uniform(jax.random.fold_in(key, 0), (M,))
    phis = (jnp.arange(M) + jitter) * (TWO_PI / M)

    # --- geometry of the projected contour (values, no grad yet) ---
    P, in_front = _film_points(camera, centers, radii, phis)     # [S,M,2]
    P = jax.lax.stop_gradient(P)
    Ppx = P * jnp.asarray([width, height])                       # pixel units
    # tangent via central difference along the closed curve
    tangent = (jnp.roll(Ppx, -1, axis=1) - jnp.roll(Ppx, 1, axis=1)) * (
        0.5 * M / TWO_PI
    )                                                            # dP/dφ [S,M,2]
    speed = jnp.sqrt(jnp.maximum(jnp.sum(tangent**2, axis=-1), 1e-12))
    n_hat = jnp.stack(
        [tangent[..., 1], -tangent[..., 0]], axis=-1
    ) / speed[..., None]
    # orient outward: away from the projected sphere center
    pc_s, pc_t, _ = project_to_film(camera, centers)             # [S]
    pc = jnp.stack([pc_s * width, pc_t * height], axis=-1)       # [S,2]
    out_dir = Ppx - pc[:, None, :]
    flip = jnp.sign(
        jnp.sum(n_hat * out_dir, axis=-1, keepdims=True) + 1e-12
    )
    n_hat = n_hat * flip

    # --- radiance jump across the edge ---
    flat = lambda a: a.reshape(S * M, *a.shape[2:])
    dL = _edge_radiance_pairs(
        scene, camera, flat(P[..., 0]), flat(P[..., 1]), flat(n_hat),
        eps_px, width, height, jax.random.fold_in(key, 1), max_depth,
        features,
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
    def film_px(c, r):
        Pf, _ = _film_points(camera, c, r, phis)
        return Pf * jnp.asarray([width, height])

    _, vjp = jax.vjp(film_px, centers, radii)
    d_center, d_radius = vjp(cotangent)
    return d_center, d_radius
