"""Fast render path: Pallas closest-hit kernel + single-row-gather shading
+ host-driven stream compaction with lag-hidden syncs.

Division of labor, driven by measurement on this hardware (one XLA scalar
gather ``[1M]<-[512]`` costs ~13 ms while ONE row gather ``[1M,24]`` costs
~5.7 ms; pallas outputs above ~8 MB get pinned VMEM-resident by the axon AOT
pipeline and destroy throughput):

* **Pallas kernel** (:mod:`..intersect_pallas`): the [ray-block x
  sphere-tile] closest-hit sweep producing compact (t, idx) outputs;
* **one row gather**: the winner's full 24-column attribute row (geometry +
  material + resolved texture constants) is fetched from a fused
  sphere+rect table with a single gather — replacing the ~25 scalar
  gathers a naive table walk costs;
* **XLA shading** (`fast_bounce`): pure elementwise geometry/texture/BSDF
  on full-width arrays with a counter-hash RNG (a Threefry draw costs
  3.4 ms/bounce; the hash ~0.5 ms);
* **host loop** (`trace_fast`): bounce iteration with a stream-compaction
  ladder whose alive-count readbacks are consumed one bounce late — the
  alive set only shrinks, so the lagged count is a safe upper bound and
  the device->host sync latency is fully hidden.

Attribute row layout (shared by all primitive kinds; width per
``attr_width``: 24, 28 with image textures, 48 with boxes/media):
  cols 0-13   shading: mat_kind, fuzz, ref_idx, tex_kind, col_rgb,
              odd_rgb, even_rgb, noise_scale
  col  14     kind: 0 sphere, 1 rect, 2 box, 3 medium
  cols 15+    geometry: sphere -> cx cy cz dx dy dz time0 inv_dt radius
              rect   -> axis a0 a1 b0 b1 k flip
              box    -> p0 p1 obj_from_world(3x4) world_from_obj_lin(3x3)
              medium -> p0 p1 obj_from_world(3x4) density radius
  last 3      image-texture atlas metadata (y_offset, height, width),
              present when the scene has image textures

Coverage: EVERY scene class — spheres (static/moving), rects, boxes,
constant-density media, all five materials, constant/checker/noise/image
textures, both skies. Noise uses the hash-based fast Perlin (table gathers
would defeat the gather-free design); the general integrator remains the
reference implementation, the differentiation path for mesh-sharded inverse
rendering, and the home of the table-Perlin/BVH options.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.config import MAX_T, MIN_T
from pathtrace_tpu.render.compact_util import (
    compact as _compact,
    compact_rows as _compact_rows,
    final_flush as _final_flush,
    rung as _rung,
)
from pathtrace_tpu.models.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    Scene,
    SceneFeatures,
    TEX_CHECKER,
    TEX_NOISE,
)

_INF = float(MAX_T)
TILE_R = 256
TILE_N = 128
N_SHADE = 14
COL_KIND = 14
GEO = 15
TWO_PI = 6.283185307179586

# winner-row kind codes (col COL_KIND)
KIND_SPHERE = 0.0
KIND_RECT = 1.0
KIND_BOX = 2.0
KIND_MEDIUM = 3.0


def attr_width(features: SceneFeatures) -> int:
    """24 columns suffice for sphere/rect scenes; boxes/media carry affine
    transforms and need 48 (box rows: 14 shade + kind + p0 p1 +
    obj_from_world 3x4 + world_from_obj linear 3x3 = 42). Image textures
    add 3 metadata columns (atlas y-offset/height/width) at the row tail."""
    if features.has_boxes or features.has_media:
        return 48
    return 28 if features.has_image else 24


def fastpath_supported(features: SceneFeatures, scene: Scene = None) -> bool:
    """Every scene class is covered; the capacity limits are the rect
    table (one 128-lane tile) and checker textures with non-constant
    children (the attr table bakes the odd/even child COLORS into row
    columns — a noise/image/checker child needs the general integrator's
    recursive texture evaluation). Pass the scene to gate on the former —
    rect-heavy user scenes fall back to the general integrator instead of
    tripping the ``build_rect_table`` assert."""
    if scene is not None and scene.rects.count > TILE_N:
        return False
    if scene is not None and (scene.spheres.world_from_obj is not None
                              or scene.rects.world_from_obj is not None):
        # generic instanced spheres/rects: the Pallas sweep and the fused
        # attr rows assume world-space primitives — route to the general
        # integrator's object-space branch (ops/intersect.py)
        return False
    if features.has_checker and not features.checker_children_const:
        return False
    return True


# ---------------------------------------------------------------------------
# attribute tables (device-side, [N]-scale gathers only)
# ---------------------------------------------------------------------------

def _shade_cols(scene: Scene, mat_id):
    mats = scene.materials
    tex = scene.textures
    tid = mats.tex_id[mat_id]
    return [
        mats.kind[mat_id].astype(jnp.float32),
        mats.fuzz[mat_id],
        mats.ref_idx[mat_id],
        tex.kind[tid].astype(jnp.float32),
        tex.color[tid][:, 0], tex.color[tid][:, 1], tex.color[tid][:, 2],
        tex.color[tex.odd_id[tid]][:, 0],
        tex.color[tex.odd_id[tid]][:, 1],
        tex.color[tex.odd_id[tid]][:, 2],
        tex.color[tex.even_id[tid]][:, 0],
        tex.color[tex.even_id[tid]][:, 1],
        tex.color[tex.even_id[tid]][:, 2],
        tex.scale[tid],
    ]


def _img_cols(scene: Scene, mat_id):
    """Atlas metadata (y_offset, height, width) per primitive — tail cols."""
    tid = scene.materials.tex_id[mat_id]
    img_id = scene.textures.image_id[tid]
    at = scene.atlas
    return [
        at.y_offset[img_id].astype(jnp.float32),
        at.height[img_id].astype(jnp.float32),
        at.width[img_id].astype(jnp.float32),
    ]


def _finish_table(cols, mask, dead_col: int, n_pad: int, k_attr: int,
                  img_cols=None):
    if img_cols is not None:
        # image metadata lives in the last 3 columns of the row
        n = cols[0].shape[0]
        while len(cols) < k_attr - 3:
            cols = cols + [jnp.zeros((n,), jnp.float32)]
        cols = cols[: k_attr - 3] + img_cols
    table = jnp.stack(cols, axis=1)
    table = jnp.where(mask[:, None], table, 0.0)
    dead = jnp.logical_not(mask)
    table = table.at[:, dead_col].set(jnp.where(dead, 1.0e18, table[:, dead_col]))
    rows = table.shape[0]
    if n_pad > rows:
        pad = jnp.zeros((n_pad - rows, table.shape[1]), table.dtype)
        pad = pad.at[:, dead_col].set(1.0e18)
        table = jnp.concatenate([table, pad], axis=0)
    if table.shape[1] < k_attr:
        table = jnp.concatenate(
            [table, jnp.zeros((table.shape[0], k_attr - table.shape[1]), table.dtype)],
            axis=1,
        )
    return table


def build_sphere_table(scene: Scene, k_attr: int) -> jnp.ndarray:
    sp = scene.spheres
    cols = _shade_cols(scene, sp.mat_id) + [
        jnp.zeros_like(sp.radius),                       # kind = 0 (sphere)
        sp.center[:, 0], sp.center[:, 1], sp.center[:, 2],
        sp.center_delta[:, 0], sp.center_delta[:, 1], sp.center_delta[:, 2],
        sp.time0, sp.inv_time_delta, sp.radius,          # radius at GEO+8
    ]
    n_pad = ((sp.count + TILE_N - 1) // TILE_N) * TILE_N
    img = _img_cols(scene, sp.mat_id) if k_attr >= 28 else None
    return _finish_table(cols, sp.mask, GEO, n_pad, k_attr, img)  # dead: cx -> 1e18


def build_rect_table(scene: Scene, k_attr: int) -> jnp.ndarray:
    rc = scene.rects
    cols = _shade_cols(scene, rc.mat_id) + [
        jnp.ones_like(rc.k),                             # kind = 1 (rect)
        rc.axis.astype(jnp.float32),
        rc.a0, rc.a1, rc.b0, rc.b1, rc.k, rc.flip,
    ]
    assert rc.count <= TILE_N, "fastpath supports at most 128 rects"
    img = _img_cols(scene, rc.mat_id) if k_attr >= 28 else None
    table = _finish_table(cols, rc.mask, GEO + 5, TILE_N, k_attr, img)
    # dead rows additionally get an empty in-plane interval (a0 > a1)
    dead_rows = jnp.concatenate(
        [jnp.logical_not(rc.mask), jnp.ones(TILE_N - rc.count, bool)]
    )
    table = table.at[:, GEO + 1].set(jnp.where(dead_rows, 1.0, table[:, GEO + 1]))
    table = table.at[:, GEO + 2].set(jnp.where(dead_rows, -1.0, table[:, GEO + 2]))
    return table


def build_box_table(scene: Scene, k_attr: int) -> jnp.ndarray:
    """Box rows: GEO+0..2 p0, +3..5 p1, +6..17 obj_from_world (3x4
    row-major), +18..26 world_from_obj linear part (3x3 row-major)."""
    bx = scene.boxes
    ofw = bx.obj_from_world.reshape(bx.count, 12)
    wfo = bx.world_from_obj[:, :, :3].reshape(bx.count, 9)
    cols = _shade_cols(scene, bx.mat_id) + [
        jnp.full((bx.count,), KIND_BOX),
        bx.p0[:, 0], bx.p0[:, 1], bx.p0[:, 2],
        bx.p1[:, 0], bx.p1[:, 1], bx.p1[:, 2],
    ] + [ofw[:, i] for i in range(12)] + [wfo[:, i] for i in range(9)]
    img = _img_cols(scene, bx.mat_id) if k_attr >= 28 else None
    return _finish_table(cols, bx.mask, GEO, bx.count, k_attr, img)


def build_media_table(scene: Scene, k_attr: int) -> jnp.ndarray:
    """Medium rows: same p0/p1/obj_from_world slots as boxes (the scatter
    needs no normal, so world_from_obj is unused); density at GEO+18,
    sphere-boundary radius at GEO+19."""
    md = scene.media
    ofw = md.obj_from_world.reshape(md.count, 12)
    cols = _shade_cols(scene, md.mat_id) + [
        jnp.full((md.count,), KIND_MEDIUM),
        md.p0[:, 0], md.p0[:, 1], md.p0[:, 2],
        md.p1[:, 0], md.p1[:, 1], md.p1[:, 2],
    ] + [ofw[:, i] for i in range(12)] + [md.density, md.radius]
    img = _img_cols(scene, md.mat_id) if k_attr >= 28 else None
    return _finish_table(cols, md.mask, GEO, md.count, k_attr, img)


def nearest_hit_attrs(tables, ro, rd, time, features, scene, med_u=None,
                      bvh=None, bvh_offsets=None):
    """Closest hit + winner attribute row across all primitive kinds.

    ``tables`` = (sphere, rect, box, media) attribute tables (box/media may
    be None for narrow scenes). Returns (t [R], attrs [R, k_attr]).

    Measured reality on this platform: pallas outputs above ~8 MB get
    allocated VMEM-resident and destroy throughput, while a single XLA ROW
    gather costs ~6 ms/1M — 20x cheaper than the ~25 scalar gathers it
    replaces. So the sphere kernel returns only (t, idx) and the winner row
    is fetched with one gather from the fused table. Rect/box/media counts
    are tiny, so their intersections stay in XLA.

    ``bvh`` (a WideBVH/FlatBVH + its offsets) swaps the intersect provider
    to whole-scene BVH traversal — the ``-B`` analog for XLA-shading scenes
    (image textures); winners land in the same fused table rows.
    """
    from pathtrace_tpu.ops import intersect as isect
    from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas

    f = features
    sph_table, rect_table, box_table, media_table = tables
    if bvh is not None:
        from pathtrace_tpu.models.bvh import (
            WideBVH, bvh_scene_nearest, wide_scene_nearest,
        )

        nearest = (wide_scene_nearest if isinstance(bvh, WideBVH)
                   else bvh_scene_nearest)
        t, gid = nearest(
            bvh, scene, ro, rd, time, med_u, MIN_T, MAX_T,
            features=f, offsets=bvh_offsets,
        )
        box_rows = box_table.shape[0] if box_table is not None else 0
        idx = _gid_to_table_row(gid, bvh_offsets, sph_table.shape[0],
                                box_rows)
        parts = [sph_table, rect_table]
        if box_table is not None:
            parts.append(box_table)
        if media_table is not None:
            parts.append(media_table)
        table = jnp.concatenate(parts, axis=0)
        return t, table[idx]
    parts = [sph_table]
    offset = sph_table.shape[0]
    if f.has_spheres:
        # the custom-VJP wrapper: differentiable via winner recomputation
        t, idx = sphere_nearest_pallas(
            scene.spheres, ro, rd, time, MIN_T, MAX_T,
            has_motion=bool(f.has_motion),
        )
    else:
        t = jnp.full(ro.shape[:1], _INF, ro.dtype)
        idx = jnp.zeros(ro.shape[:1], jnp.int32)
    if f.has_rects:
        t_r, i_r = _rect_nearest_any(scene.rects, ro, rd)
        wins = t_r < t
        t = jnp.where(wins, t_r, t)
        idx = jnp.where(wins, offset + i_r, idx)
    parts.append(rect_table)
    offset += rect_table.shape[0]
    if f.has_boxes:
        if scene.boxes.count <= PLANES_MAX_N:
            t_b, i_b = isect.box_nearest_planes(
                scene.boxes, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2],
            )
        else:
            t_b, i_b = isect.box_nearest(scene.boxes, ro, rd)
        wins = t_b < t
        t = jnp.where(wins, t_b, t)
        idx = jnp.where(wins, offset + i_b, idx)
    if box_table is not None:
        parts.append(box_table)
        offset += box_table.shape[0]
    if f.has_media:
        if scene.media.count <= PLANES_MAX_N:
            t_m, i_m = isect.media_nearest_planes(
                scene.media, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], med_u,
            )
        else:
            t_m, i_m = isect.media_nearest(scene.media, ro, rd, med_u)
        wins = t_m < t
        t = jnp.where(wins, t_m, t)
        idx = jnp.where(wins, offset + i_m, idx)
    if media_table is not None:
        parts.append(media_table)
    table = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    attrs = table[idx]                                   # ONE row gather
    return t, attrs


# Static-python-loop sweeps unroll one iteration per primitive: a huge win
# for preset-scale sets (no [R, N<128] lane-padded temps) but an HLO/compile
# explosion past a few dozen (400 boxes -> 48 GB XLA:CPU compile, r5).
PLANES_MAX_N = 16


def _rect_nearest_any(rects, ro, rd):
    """Plane-form rect sweep for small sets (every preset), [R, N] form
    otherwise — the same policy as the fused path (the [R, N<128] form
    pays 128x lane padding per temp, PERF.md)."""
    from pathtrace_tpu.ops import intersect as isect

    if rects.count <= 16 and rects.world_from_obj is None:
        return isect.rect_nearest_planes(
            rects, ro[:, 0], ro[:, 1], ro[:, 2],
            rd[:, 0], rd[:, 1], rd[:, 2],
        )
    return isect.rect_nearest(rects, ro, rd)


def nearest_t_only(scene, ro, rd, time, features, med_u=None,
                   bvh=None, bvh_offsets=None):
    """Closest-hit distance only — the shadow-ray (occlusion) intersector.

    Same winners as :func:`nearest_hit_attrs` minus the attribute row
    gather (~6 ms/1M), which occlusion tests never need. Used by the fast
    path's NEE shadow rays (reference has no NEE; estimator anchor is the
    general integrator's, ``render/integrator.py``)."""
    from pathtrace_tpu.ops import intersect as isect
    from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas

    f = features
    if bvh is not None:
        from pathtrace_tpu.models.bvh import (
            WideBVH, bvh_scene_nearest, wide_scene_nearest,
        )

        nearest = (wide_scene_nearest if isinstance(bvh, WideBVH)
                   else bvh_scene_nearest)
        t, _ = nearest(
            bvh, scene, ro, rd, time, med_u, MIN_T, MAX_T,
            features=f, offsets=bvh_offsets,
        )
        return t
    if f.has_spheres:
        t, _ = sphere_nearest_pallas(
            scene.spheres, ro, rd, time, MIN_T, MAX_T,
            has_motion=bool(f.has_motion),
        )
    else:
        t = jnp.full(ro.shape[:1], _INF, ro.dtype)
    if f.has_rects:
        t_r, _ = _rect_nearest_any(scene.rects, ro, rd)
        t = jnp.minimum(t, t_r)
    if f.has_boxes:
        if scene.boxes.count <= PLANES_MAX_N:
            t_b, _ = isect.box_nearest_planes(
                scene.boxes, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2],
            )
        else:
            t_b, _ = isect.box_nearest(scene.boxes, ro, rd)
        t = jnp.minimum(t, t_b)
    if f.has_media:
        if scene.media.count <= PLANES_MAX_N:
            t_m, _ = isect.media_nearest_planes(
                scene.media, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], med_u,
            )
        else:
            t_m, _ = isect.media_nearest(scene.media, ro, rd, med_u)
        t = jnp.minimum(t, t_m)
    return t


# ---------------------------------------------------------------------------
# XLA shading (gather-free)
# ---------------------------------------------------------------------------

def _mix32(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(2146121005)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2654435769)
    h = h ^ (h >> 13)
    return h


def counter_uniform(lane_u32, seed: jnp.ndarray, depth, draw: int):
    """Stateless counter-hash uniform in [0,1) (see megakernel docstring)."""
    h = lane_u32 * jnp.uint32(747796405) + seed.astype(jnp.uint32) * jnp.uint32(
        2891336453
    )
    h = h + jnp.asarray(depth, jnp.uint32) * jnp.uint32(1013904223)
    h = h + jnp.uint32((draw * 374761393) & 0xFFFFFFFF)
    h = _mix32(h)
    # h>>8 < 2^24 so the int32 round-trip is exact; Mosaic (the Pallas
    # shading twin) has no uint32->f32 cast, and both paths must share one
    # formula for bit parity
    return (h >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)


def _hash3(ix, iy, iz):
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(374761393)
        + iy.astype(jnp.uint32) * jnp.uint32(668265263)
        + iz.astype(jnp.uint32) * jnp.uint32(1103515245)
    )
    h = h ^ (h >> 13)
    h = h * jnp.uint32(1274126177)
    return h ^ (h >> 16)


def _hash_unit(h):
    return (h >> 8).astype(jnp.int32).astype(jnp.float32) * (2.0 / 16777216.0) - 1.0


def cbrt_pos(x):
    """cbrt for x in [0, 1) via exp/log — the one form both XLA and Mosaic
    lower identically (Mosaic has no cbrt op; bit-parity between the XLA
    and Pallas shading paths requires using the same formula in both)."""
    return jnp.exp(jnp.log(jnp.maximum(x, 1e-38)) * (1.0 / 3.0))


def fast_noise_c(px, py, pz):
    """Hash-gradient Hermite noise on component arrays (table-free twin of
    ops.perlin.noise; shared verbatim by the XLA and Pallas shading paths)."""
    fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    ix, iy, iz = fx.astype(jnp.int32), fy.astype(jnp.int32), fz.astype(jnp.int32)
    u, v, w = px - fx, py - fy, pz - fz
    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)
    accum = jnp.zeros_like(px)
    for di in (0, 1):
        wu = uu if di else (1.0 - uu)
        for dj in (0, 1):
            wv = vv if dj else (1.0 - vv)
            for dk in (0, 1):
                wwk = ww if dk else (1.0 - ww)
                h = _hash3(ix + di, iy + dj, iz + dk)
                gx = _hash_unit(h)
                gy = _hash_unit(h * jnp.uint32(1664525) + jnp.uint32(1013904223))
                gz = _hash_unit(h * jnp.uint32(22695477) + jnp.uint32(1))
                dot = gx * (u - di) + gy * (v - dj) + gz * (w - dk)
                accum = accum + wu * wv * wwk * dot
    return accum


def fast_noise(p):
    """Hash-gradient Hermite noise (table-free twin of ops.perlin.noise)."""
    return fast_noise_c(p[..., 0], p[..., 1], p[..., 2])


def fast_turb_c(px, py, pz, octaves: int = 7):
    accum = jnp.zeros_like(px)
    weight = 1.0
    for _ in range(octaves):
        accum = accum + weight * fast_noise_c(px, py, pz)
        weight *= 0.5
        px, py, pz = px * 2.0, py * 2.0, pz * 2.0
    return jnp.abs(accum)


def fast_turb(p, octaves: int = 7):
    return fast_turb_c(p[..., 0], p[..., 1], p[..., 2], octaves)


class FastState(NamedTuple):
    ro: jnp.ndarray          # [R, 3]
    rd: jnp.ndarray          # [R, 3]
    time: jnp.ndarray        # [R]
    radiance: jnp.ndarray    # [R, 3]
    throughput: jnp.ndarray  # [R, 3]
    alive: jnp.ndarray       # [R] bool
    lane: jnp.ndarray        # [R] uint32 — RNG stream id (stable under compaction)
    # MIS weight on this lane's next primitive-emission hit (the BSDF
    # strategy's power-heuristic share when the previous vertex ran NEE —
    # see render/integrator.py WavefrontState.emit_scale). None unless the
    # NEE estimator is on; [R] f32 then, and it rides compaction like any
    # other plane.
    emit_scale: jnp.ndarray = None


class FastStateP(NamedTuple):
    """Plane-form wavefront state for the fused Pallas shading path.

    Every component is its own packed [R] array: reshaping [R] to the
    (R/128, 128) lane tile the kernel wants is a free layout no-op, whereas
    [R, 3] state pads its minor dim to 128 lanes at every XLA fusion
    boundary (the measured dominant cost of the XLA shading path)."""

    rox: jnp.ndarray
    roy: jnp.ndarray
    roz: jnp.ndarray
    rdx: jnp.ndarray
    rdy: jnp.ndarray
    rdz: jnp.ndarray
    time: jnp.ndarray
    rad_r: jnp.ndarray
    rad_g: jnp.ndarray
    rad_b: jnp.ndarray
    thr_r: jnp.ndarray
    thr_g: jnp.ndarray
    thr_b: jnp.ndarray
    alive: jnp.ndarray       # [R] bool
    lane: jnp.ndarray        # [R] uint32
    # MIS emit_scale plane (see FastState.emit_scale): None unless NEE is
    # on; rides the attr cube into the kernel and compaction like any
    # other plane
    emit_scale: jnp.ndarray = None


def fast_bounce(
    tables, sky, use_gradient_sky, state: FastState,
    seed, depth, max_depth: int, features: SceneFeatures, scene=None,
    bvh=None, bvh_offsets=None, nee_lights=None, rr_start: int = 0,
):
    """One single-gather bounce. depth: traced int32; max_depth static.

    ``nee_lights`` (a :class:`~pathtrace_tpu.ops.lights.LightTable`) turns
    on next-event estimation with MIS on this path — the same estimator as
    the general integrator's (``render/integrator.py``: one shadow ray at
    a sampled light per diffuse vertex, power-heuristic split carried to
    the next hit via ``state.emit_scale``), with the counter-hash RNG
    (draws 4-6 light sampling, 7 Russian roulette, 8+n_media shadow media)
    and :func:`nearest_t_only` for the occlusion test. When set, the
    return is ``(state, shadow_ray_count)`` instead of ``state``.
    ``rr_start`` > 0 enables Russian roulette from that bounce depth."""
    f = features
    med_u = None
    if f.has_media:
        # one free-flight uniform per (ray, medium)
        n_media = scene.media.count
        med_u = jnp.stack(
            [counter_uniform(state.lane, seed, depth, 8 + j)
             for j in range(n_media)], axis=-1,
        )
    t, attrs = nearest_hit_attrs(
        tables, state.ro, state.rd, state.time, f, scene, med_u=med_u,
        bvh=bvh, bvh_offsets=bvh_offsets,
    )
    hit = t < _INF
    t_safe = jnp.where(hit, t, 0.0)
    point = state.ro + t_safe[:, None] * state.rd

    kind = attrs[:, COL_KIND]
    # sphere normal (default)
    center = attrs[:, GEO:GEO + 3]
    if f.has_motion:
        s = (state.time - attrs[:, GEO + 6]) * attrs[:, GEO + 7]
        center = center + s[:, None] * attrs[:, GEO + 3:GEO + 6]
    inv_r = 1.0 / jnp.where(jnp.abs(attrs[:, GEO + 8]) < 1e-12, 1.0, attrs[:, GEO + 8])
    normal = (point - center) * inv_r[:, None]
    if f.has_rects:
        axis = attrs[:, GEO + 0]
        flip = attrs[:, GEO + 6]
        one_hot_axis = (
            jnp.arange(3, dtype=jnp.float32)[None, :] == axis[:, None]
        ).astype(point.dtype)
        normal = jnp.where(
            (kind == KIND_RECT)[:, None], one_hot_axis * flip[:, None], normal
        )
    if f.has_boxes:
        # box normal: redo the slab test in object space from the winner's
        # affine columns (pure elementwise batched matvecs, no gathers)
        R = point.shape[0]
        ofw = attrs[:, GEO + 6:GEO + 18].reshape(R, 3, 4)
        ro_o = jnp.einsum("rij,rj->ri", ofw[:, :, :3], state.ro) + ofw[:, :, 3]
        rd_o = jnp.einsum("rij,rj->ri", ofw[:, :, :3], state.rd)
        rd_o = jnp.where(jnp.abs(rd_o) < 1e-12, 1e-12, rd_o)
        rcp = 1.0 / rd_o
        bp0 = attrs[:, GEO:GEO + 3]
        bp1 = attrs[:, GEO + 3:GEO + 6]
        d0 = (bp0 - ro_o) * rcp
        d1 = (bp1 - ro_o) * rcp
        tn = jnp.minimum(d0, d1)
        tf = jnp.maximum(d0, d1)
        t_enter = jnp.max(tn, axis=-1)
        enter_axis = jnp.argmax(tn, axis=-1)
        exit_axis = jnp.argmin(tf, axis=-1)
        is_entry = jnp.abs(t_safe - t_enter) < 1e-4 * jnp.maximum(jnp.abs(t_safe), 1.0)
        face_axis = jnp.where(is_entry, enter_axis, exit_axis)
        sign_d = jnp.sign(
            jnp.take_along_axis(rd_o, face_axis[:, None], axis=-1)[:, 0]
        )
        n_sign = jnp.where(is_entry, -sign_d, sign_d)
        n_obj = (
            (jnp.arange(3)[None, :] == face_axis[:, None]).astype(point.dtype)
            * n_sign[:, None]
        )
        wfo = attrs[:, GEO + 18:GEO + 27].reshape(R, 3, 3)
        box_n = jnp.einsum("rij,rj->ri", wfo, n_obj)
        normal = jnp.where((kind == KIND_BOX)[:, None], box_n, normal)
    if f.has_media:
        # arbitrary normal; the isotropic phase function ignores it
        # (reference src/collision/constant_medium.rs:66)
        normal = jnp.where(
            (kind == KIND_MEDIUM)[:, None],
            jnp.asarray([1.0, 0.0, 0.0], point.dtype),
            normal,
        )

    # texture color
    tex_kind = attrs[:, 3]
    rgb = attrs[:, 4:7]
    if f.has_checker:
        sines = (
            jnp.sin(10.0 * point[:, 0])
            * jnp.sin(10.0 * point[:, 1])
            * jnp.sin(10.0 * point[:, 2])
        )
        checker = jnp.where(sines[:, None] < 0.0, attrs[:, 7:10], attrs[:, 10:13])
        rgb = jnp.where((tex_kind == TEX_CHECKER)[:, None], checker, rgb)
    if f.has_noise:
        marble = 0.5 * (
            1.0 + jnp.sin(attrs[:, 13] * point[:, 2] + 10.0 * fast_turb(point))
        )
        rgb = jnp.where((tex_kind == TEX_NOISE)[:, None], marble[:, None], rgb)
    if f.has_image:
        # sphere UV from the unit normal (reference src/material.rs:41-49)
        phi = jnp.arctan2(normal[:, 0], normal[:, 1])
        theta = jnp.arcsin(jnp.clip(normal[:, 1], -1.0, 1.0))
        uu = 1.0 - (phi + 3.14159265) * (0.5 / 3.14159265)
        vv = (theta + 1.5707963) * (1.0 / 3.14159265)
        if f.has_rects:
            # rect UV: in-plane interval fractions (reference rect.rs:93-160)
            axis_r = attrs[:, GEO + 0].astype(jnp.int32)
            a_ax = jnp.where(axis_r == 0, 1, 0)
            b_ax = jnp.where(axis_r == 2, 1, 2)
            ga = lambda ax: jnp.take_along_axis(point, ax[:, None], axis=-1)[:, 0]
            da = attrs[:, GEO + 2] - attrs[:, GEO + 1]
            db = attrs[:, GEO + 4] - attrs[:, GEO + 3]
            da = jnp.where(jnp.abs(da) < 1e-12, 1.0, da)
            db = jnp.where(jnp.abs(db) < 1e-12, 1.0, db)
            u_r = (ga(a_ax) - attrs[:, GEO + 1]) / da
            v_r = (ga(b_ax) - attrs[:, GEO + 3]) / db
            uu = jnp.where(kind == KIND_RECT, u_r, uu)
            vv = jnp.where(kind == KIND_RECT, v_r, vv)
        if f.has_boxes:
            # box UV: face parameterization in object space, reusing the
            # normal pass's winner-transformed ray (ro_o/rd_o/face_axis)
            p_obj = ro_o + t_safe[:, None] * rd_o
            a_ax = jnp.where(face_axis == 0, 1, 0)
            b_ax = jnp.where(face_axis == 2, 1, 2)
            gp = lambda arr, ax: jnp.take_along_axis(arr, ax[:, None], axis=-1)[:, 0]
            da = gp(bp1, a_ax) - gp(bp0, a_ax)
            db = gp(bp1, b_ax) - gp(bp0, b_ax)
            da = jnp.where(jnp.abs(da) < 1e-12, 1.0, da)
            db = jnp.where(jnp.abs(db) < 1e-12, 1.0, db)
            u_b = (gp(p_obj, a_ax) - gp(bp0, a_ax)) / da
            v_b = (gp(p_obj, b_ax) - gp(bp0, b_ax)) / db
            uu = jnp.where(kind == KIND_BOX, u_b, uu)
            vv = jnp.where(kind == KIND_BOX, v_b, vv)
        k_attr = attrs.shape[1]
        img_y = attrs[:, k_attr - 3]
        img_h = attrs[:, k_attr - 2]
        img_w = attrs[:, k_attr - 1]
        ii = jnp.clip((uu * img_w).astype(jnp.int32), 0,
                      jnp.maximum(img_w.astype(jnp.int32) - 1, 0))
        jj = jnp.clip(((1.0 - vv) * img_h - 0.001).astype(jnp.int32), 0,
                      jnp.maximum(img_h.astype(jnp.int32) - 1, 0))
        atlas = scene.atlas.data
        w_atlas = atlas.shape[1]
        flat_idx = (img_y.astype(jnp.int32) + jj) * w_atlas + ii
        img_rgb = atlas.reshape(-1, 3)[flat_idx]   # ONE row gather
        rgb = jnp.where((tex_kind == 3.0)[:, None], img_rgb, rgb)

    # emission + sky
    mat_kind = attrs[:, 0]
    sky_t = 0.5 * (state.rd[:, 1] + 1.0)
    grad_sky = (1.0 - sky_t)[:, None] + sky_t[:, None] * jnp.asarray(
        [0.15, 0.21, 0.30], point.dtype
    )
    sky_rgb = jnp.where(use_gradient_sky > 0.5, grad_sky, sky)
    is_light = mat_kind == float(MAT_DIFFUSE_LIGHT)
    prim_emit = jnp.where(is_light[:, None], rgb, 0.0)
    if nee_lights is not None:
        # the previous vertex's NEE sample owns (1 - emit_scale) of this
        # emission; the sky is untouched (the light sampler never hits it)
        prim_emit = prim_emit * state.emit_scale[:, None]
    emit = jnp.where(hit[:, None], prim_emit, sky_rgb)
    alive_f = state.alive.astype(point.dtype)[:, None]
    radiance = state.radiance + state.throughput * emit * alive_f

    # scatter (counter-hash RNG keyed by stable lane ids)
    u1 = counter_uniform(state.lane, seed, depth, 0)
    u2 = counter_uniform(state.lane, seed, depth, 1)
    u3 = counter_uniform(state.lane, seed, depth, 2)
    uc = counter_uniform(state.lane, seed, depth, 3)
    zz = u1 * 2.0 - 1.0
    aa = u2 * TWO_PI
    rr = jnp.sqrt(jnp.maximum(1.0 - zz * zz, 0.0))
    unit = jnp.stack([rr * jnp.cos(aa), rr * jnp.sin(aa), zz], axis=-1)

    d = state.rd
    n = normal
    rdotn = jnp.sum(d * n, axis=-1)
    reflected = d - 2.0 * rdotn[:, None] * n

    direction = unit
    ok = jnp.ones(t.shape, bool)

    if f.has_dielectric:
        ref_idx = attrs[:, 2]
        exiting = rdotn > 0.0
        outward = jnp.where(exiting[:, None], -n, n)
        ni = jnp.where(exiting, ref_idx, 1.0 / ref_idx)
        cos_in = jnp.where(exiting, rdotn, -rdotn)
        ces = 1.0 - ref_idx * ref_idx * (1.0 - cos_in * cos_in)
        # double-where guards: sqrt'(0) is infinite and poisons reverse-mode
        # AD through masked lanes (see ops/intersect.py)
        cosine = jnp.where(
            exiting, jnp.sqrt(jnp.where(ces > 0.0, ces, 1.0)), cos_in
        )
        dt_ = jnp.sum(d * outward, axis=-1)
        disc = 1.0 - ni * ni * (1.0 - dt_ * dt_)
        refr_ok = disc > 0.0
        sq = jnp.sqrt(jnp.where(refr_ok, disc, 1.0))
        refr = ni[:, None] * (d - outward * dt_[:, None]) - outward * sq[:, None]
        r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
        r0 = r0 * r0
        omc = 1.0 - cosine
        omc2 = omc * omc
        schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
        reflect_prob = jnp.where(refr_ok, schlick, 1.0)
        diel_dir = jnp.where((uc > reflect_prob)[:, None], refr, reflected)
        is_diel = mat_kind == float(MAT_DIELECTRIC)
        direction = jnp.where(is_diel[:, None], diel_dir, direction)

    if f.has_metal:
        fuzz = attrs[:, 1]
        rad3 = cbrt_pos(u3)
        metal_dir = reflected + (fuzz * rad3)[:, None] * unit
        is_metal = mat_kind == float(MAT_METAL)
        direction = jnp.where(is_metal[:, None], metal_dir, direction)
        ok = jnp.where(is_metal, rdotn < 0.0, ok)  # reflected.n>0 <=> d.n<0

    if f.has_lambertian:
        is_lam = mat_kind == float(MAT_LAMBERTIAN)
        direction = jnp.where(is_lam[:, None], n + unit, direction)

    if f.has_light:
        ok = jnp.where(is_light, False, ok)

    inv_len = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(direction * direction, axis=-1), 1e-38)
    )
    direction = direction * inv_len[:, None]

    if f.has_dielectric:
        atten = jnp.where(is_diel[:, None], 1.0, rgb)
    else:
        atten = rgb

    can = state.alive & hit & ok & (depth < max_depth)
    cs = can[:, None]

    emit_scale_next = state.emit_scale
    shadow_ct = None
    if nee_lights is not None:
        # NEE with MIS, mirroring render/integrator.py's estimator on the
        # fast path's attr-table data (rgb IS the textured albedo here)
        from pathtrace_tpu.ops import lights as plights
        from pathtrace_tpu.ops.texture import texture_value

        is_lam_m = mat_kind == float(MAT_LAMBERTIAN)
        is_iso_m = mat_kind == float(MAT_ISOTROPIC)
        nee_mask = can & (is_lam_m | is_iso_m)

        lu = jnp.stack(
            [counter_uniform(state.lane, seed, depth, 4),
             counter_uniform(state.lane, seed, depth, 5),
             counter_uniform(state.lane, seed, depth, 6)], axis=-1,
        )
        safe_p = jnp.where(nee_mask[:, None], point, jnp.zeros_like(point))
        wi, ldist, lpdf, lidx, lvalid = plights.sample_light_dirs(
            nee_lights, safe_p, lu
        )
        nee_mask = nee_mask & lvalid

        smed_u = None
        if f.has_media:
            n_media = scene.media.count
            smed_u = jnp.stack(
                [counter_uniform(state.lane, seed, depth, 8 + n_media + j)
                 for j in range(n_media)], axis=-1,
            )
        s_t = nearest_t_only(
            scene, safe_p, wi, state.time, f, med_u=smed_u,
            bvh=bvh, bvh_offsets=bvh_offsets,
        )
        unoccluded = jnp.logical_not(
            (s_t < _INF) & (s_t < ldist * (1.0 - 1e-3))
        )

        light_p = safe_p + wi * ldist[:, None]
        le = texture_value(
            scene, nee_lights.tex_id[lidx],
            jnp.full_like(ldist, 0.5), jnp.full_like(ldist, 0.5), light_p,
            features=f,
        )
        safe_n = jnp.where(nee_mask[:, None], normal, jnp.zeros_like(normal))
        cos_s = jnp.maximum(jnp.sum(wi * safe_n, axis=-1), 0.0)
        inv_pi = 1.0 / 3.14159265358979
        f_term = jnp.where(
            is_lam_m[:, None],
            rgb * (cos_s * inv_pi)[:, None],
            rgb * (0.25 * inv_pi),
        )
        p_b_nee = jnp.where(is_lam_m, cos_s * inv_pi, 0.25 * inv_pi)
        w_light = lpdf * lpdf / jnp.maximum(
            lpdf * lpdf + p_b_nee * p_b_nee, 1e-20
        )
        contrib = state.throughput * f_term * le * (
            w_light / jnp.maximum(lpdf, 1e-12)
        )[:, None]
        radiance = radiance + jnp.where(
            (nee_mask & unoccluded)[:, None], contrib,
            jnp.zeros_like(contrib),
        )
        # BSDF side of the split for the NEXT hit's emission
        cos_b = jnp.maximum(jnp.sum(direction * safe_n, axis=-1), 0.0)
        p_b_next = jnp.where(is_lam_m, cos_b * inv_pi, 0.25 * inv_pi)
        p_l_next = plights.light_dir_pdf(nee_lights, safe_p, direction)
        w_bsdf = p_b_next * p_b_next / jnp.maximum(
            p_b_next * p_b_next + p_l_next * p_l_next, 1e-20
        )
        emit_scale_next = jnp.where(
            nee_mask & (p_l_next > 0.0), w_bsdf,
            jnp.ones_like(state.emit_scale),
        )
        shadow_ct = jnp.sum(nee_mask, dtype=jnp.int32)

    throughput = jnp.where(cs, state.throughput * atten, state.throughput)
    if rr_start > 0:
        # Russian roulette, same rule as the general integrator: survive
        # with p = max throughput channel (floored), dividing it back out
        p_rr = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
        rr_u = counter_uniform(state.lane, seed, depth, 7)
        roll = can & (depth >= rr_start)
        survive = jnp.logical_not(roll) | (rr_u < p_rr)
        throughput = jnp.where(
            (roll & survive)[:, None], throughput / p_rr[:, None],
            throughput,
        )
        can = can & survive
        cs = can[:, None]

    out = FastState(
        ro=jnp.where(cs, point, state.ro),
        rd=jnp.where(cs, direction, state.rd),
        time=state.time,
        radiance=radiance,
        throughput=throughput,
        alive=can,
        lane=state.lane,
        emit_scale=emit_scale_next,
    )
    return (out, shadow_ct) if nee_lights is not None else out


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "features", "group", "bvh_offsets",
                     "rr_start"),
)
def _bounce_group_jit(tables, sky, grad_sky, state, seed,
                      depth0, max_depth, features, scene,
                      group: int = 1, bvh=None, bvh_offsets=None,
                      nee_lights=None, rr_start: int = 0):
    """Run `group` consecutive bounces in ONE dispatch.

    Each jit dispatch costs ~45 ms of tunnel overhead on this platform;
    grouping amortizes it. Returns (state, segments_traced_in_group) —
    shadow rays count as segments, like the general integrator's metric.
    """
    segs = jnp.int32(0)
    for g in range(group):
        segs = segs + jnp.sum(state.alive, dtype=jnp.int32)
        out = fast_bounce(
            tables, sky, grad_sky, state, seed, depth0 + g,
            max_depth, features, scene=scene,
            bvh=bvh, bvh_offsets=bvh_offsets,
            nee_lights=nee_lights, rr_start=rr_start,
        )
        if nee_lights is not None:
            state, shadow_ct = out
            segs = segs + shadow_ct
        else:
            state = out
    return state, segs


class _PrimScene(NamedTuple):
    """The four primitive groups as a Scene-shaped pytree — all the BVH
    leaf tests touch (shading data rides the prebuilt attr tables)."""

    spheres: object
    rects: object
    boxes: object
    media: object


def _gid_to_table_row(gid, offsets, sph_rows, box_rows):
    """Global primitive id (sphere|rect|box|medium blocks, BVH order) ->
    fused attribute-table row (same kind order, but each kind's table
    block is padded: spheres to 128-multiples, rects to exactly 128).

    Branch-free: monotone offsets, applied in increasing order so the
    last matching block wins. Misses carry gid 0 -> sphere row 0, exactly
    like the brute path's argmin idx on a miss (shading masks on t)."""
    off_s, off_r, off_b, off_m = offsets
    row = gid
    row = jnp.where(gid >= off_r, gid - off_r + sph_rows, row)
    row = jnp.where(gid >= off_b, gid - off_b + sph_rows + TILE_N, row)
    row = jnp.where(gid >= off_m,
                    gid - off_m + sph_rows + TILE_N + box_rows, row)
    return row


def fast_bounce_fused(
    tables, sky, use_gradient_sky, state: FastStateP,
    seed, depth, max_depth: int, features: SceneFeatures, scene=None,
):
    """Plane-form bounce: Pallas closest hit + ONE row gather + Pallas
    fused shading. Op-for-op mirror of :func:`fast_bounce` (same hit
    kernel, same winner rows, same shading math — enforced by
    tests/test_shade_pallas.py); every scene class except image textures
    (see ``shade_pallas.fused_shade_supported``).

    ``scene`` may be a full Scene or a ``(spheres, rects, boxes, media)``
    tuple — the bounce touches only the primitive groups (shading data
    rides the prebuilt tables)."""
    atlas = None
    if hasattr(scene, "spheres"):
        prims = (scene.spheres, scene.rects, scene.boxes, scene.media)
        if features.has_image:
            atlas = _atlas_planes(scene)
    else:
        prims = scene
    return _fast_bounce_fused_prims(
        tables, sky, use_gradient_sky, state, seed, depth, max_depth,
        features, prims, atlas=atlas,
    )


def _fast_bounce_fused_prims(
    tables, sky, use_gradient_sky, state: FastStateP,
    seed, depth, max_depth: int, features: SceneFeatures, prims,
    cull: bool = False, bvh=None, bvh_offsets=None, atlas=None,
    bvh_first: bool = True, nee_lights=None, rr_start: int = 0,
    nee_scene=None,
):
    from pathtrace_tpu.ops import intersect as isect
    from pathtrace_tpu.ops.intersect_pallas import sphere_nearest_pallas_cols
    from pathtrace_tpu.ops.shade_pallas import shade_bounce_planes

    f = features
    spheres, rects, boxes, media = prims
    shade_kw = dict(
        nee_lights=nee_lights, rr_start=rr_start,
        prim_scene=_PrimScene(spheres, rects, boxes, media),
        nee_scene=nee_scene, bvh=bvh, bvh_offsets=bvh_offsets,
    )
    sph_table, rect_table, box_table, media_table = tables
    if bvh is not None:
        # -B on the fused path: whole-scene BVH traversal replaces the
        # brute per-kind sweeps as the intersect provider; winners land in
        # the SAME fused attr table (gid -> padded table row), so the row
        # gather + fused Pallas shading below are shared verbatim with the
        # brute path. Matches the reference's BVH-or-list switch feeding
        # one shading pipeline (src/main.rs:63-66, scene.rs ray_hit).
        from pathtrace_tpu.models.bvh import (
            WideBVH, bvh_scene_nearest, wide_scene_nearest,
        )

        med_u = None
        if f.has_media:
            med_u = jnp.stack(
                [counter_uniform(state.lane, seed, depth, 8 + j)
                 for j in range(media.count)], axis=-1,
            )
        ro3 = jnp.stack([state.rox, state.roy, state.roz], axis=1)
        rd3 = jnp.stack([state.rdx, state.rdy, state.rdz], axis=1)
        if isinstance(bvh, WideBVH):
            t, gid = wide_scene_nearest(
                bvh, _PrimScene(spheres, rects, boxes, media), ro3, rd3,
                state.time, med_u, MIN_T, MAX_T, features=f,
                offsets=bvh_offsets,
            )
        else:
            # depth-aware bulk hint (bvh_first is static per bounce-group
            # program); BVH_BOUNCE_BULK=None keeps the uniform bulk — the
            # short-bounce-bulk experiment measured WORSE (see the knob)
            t, gid = bvh_scene_nearest(
                bvh, _PrimScene(spheres, rects, boxes, media), ro3, rd3,
                state.time, med_u, MIN_T, MAX_T, features=f,
                offsets=bvh_offsets,
                bulk_it=None if bvh_first else BVH_BOUNCE_BULK,
            )
        box_rows = box_table.shape[0] if box_table is not None else 0
        idx = _gid_to_table_row(gid, bvh_offsets, sph_table.shape[0],
                                box_rows)
        parts = [sph_table, rect_table]
        if box_table is not None:
            parts.append(box_table)
        if media_table is not None:
            parts.append(media_table)
        table = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return _fused_shade_from_winners(
            table, idx, t, state, seed, depth, max_depth, features,
            sky, use_gradient_sky, atlas=atlas, **shade_kw,
        )
    if f.has_spheres:
        t, idx = sphere_nearest_pallas_cols(
            spheres, state.rox, state.roy, state.roz,
            state.rdx, state.rdy, state.rdz, state.time,
            MIN_T, MAX_T, has_motion=bool(f.has_motion), cull=cull,
        )
    else:
        t = jnp.full(state.rox.shape, _INF, state.rox.dtype)
        idx = jnp.zeros(state.rox.shape, jnp.int32)
    parts = [sph_table]
    offset = sph_table.shape[0]
    if f.has_rects:
        # small rect sets (every preset) sweep as a static python loop on
        # [R] planes — the [R, N<128] form pays 128x lane padding per temp
        rect_fn = (isect.rect_nearest_planes if rects.count <= 16
                   else isect.rect_nearest_cols)
        t_r, i_r = rect_fn(
            rects, state.rox, state.roy, state.roz,
            state.rdx, state.rdy, state.rdz,
        )
        wins = t_r < t
        t = jnp.where(wins, t_r, t)
        idx = jnp.where(wins, offset + i_r, idx)
    parts.append(rect_table)
    offset += rect_table.shape[0]
    if f.has_boxes or (f.has_media and media.count > PLANES_MAX_N):
        ro3 = jnp.stack([state.rox, state.roy, state.roz], axis=1)
        rd3 = jnp.stack([state.rdx, state.rdy, state.rdz], axis=1)
    if f.has_boxes:
        # small box sets (cornell) sweep as a static python loop on [R]
        # planes — the [R, N<128] form pays 128x lane padding per temp.
        # Big sets (final_full's 400-box ground field) keep the [R, N]
        # form: a 400-iteration unrolled loop exploded XLA:CPU compile
        # to 48 GB RSS (r5 suite hang).
        if boxes.count <= PLANES_MAX_N:
            t_b, i_b = isect.box_nearest_planes(
                boxes, state.rox, state.roy, state.roz,
                state.rdx, state.rdy, state.rdz,
            )
        else:
            t_b, i_b = isect.box_nearest(boxes, ro3, rd3)
        wins = t_b < t
        t = jnp.where(wins, t_b, t)
        idx = jnp.where(wins, offset + i_b, idx)
    if box_table is not None:
        parts.append(box_table)
        offset += box_table.shape[0]
    if f.has_media:
        med_u = jnp.stack(
            [counter_uniform(state.lane, seed, depth, 8 + j)
             for j in range(media.count)], axis=-1,
        )
        if media.count <= PLANES_MAX_N:
            t_m, i_m = isect.media_nearest_planes(
                media, state.rox, state.roy, state.roz,
                state.rdx, state.rdy, state.rdz, med_u,
            )
        else:
            t_m, i_m = isect.media_nearest(media, ro3, rd3, med_u)
        wins = t_m < t
        t = jnp.where(wins, t_m, t)
        idx = jnp.where(wins, offset + i_m, idx)
    if media_table is not None:
        parts.append(media_table)
    table = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return _fused_shade_from_winners(
        table, idx, t, state, seed, depth, max_depth, features,
        sky, use_gradient_sky, atlas=atlas, **shade_kw,
    )


def _image_rgb_planes(atlas, t, attrs3, state: FastStateP,
                      features: SceneFeatures):
    """XLA pre-pass for image textures on the fused path: winner UV + ONE
    atlas gather, all on [R] planes. Mirrors ``fast_bounce``'s image
    branch operation-for-operation (sphere UV from the unit normal,
    reference src/material.rs:41-49; rect UV from in-plane fractions,
    rect.rs:93-160; same v-flip and -0.001 bias, texture.rs:28-30) so the
    fused path's texels are identical to the XLA shading path's.

    Layout notes (the r4 version of this pre-pass lost its own win to
    them): winner attributes arrive as the (rows, K, 128) cube — column k
    is a contiguous plane slice, where ``attrs[:, k]`` extracts were
    strided reads (~27 ms/1M for K of them, tools/split_probe.py) — and
    the texel gather runs on the TRANSPOSED [3, N] atlas (prepared once
    per trace by ``_atlas_planes`` — NOT per bounce) so its output
    [3, R] is three unpadded planes (a [R, 3] gather result pads its
    minor dim 128x at every fusion boundary, PERF.md trap)."""
    f = features
    R = t.shape[0]
    col = lambda k: attrs3[:, k, :].reshape(R)
    hit = t < _INF
    ts = jnp.where(hit, t, 0.0)
    px = state.rox + ts * state.rdx
    py = state.roy + ts * state.rdy
    pz = state.roz + ts * state.rdz
    cx, cy, cz = col(GEO), col(GEO + 1), col(GEO + 2)
    if f.has_motion:
        s = (state.time - col(GEO + 6)) * col(GEO + 7)
        cx = cx + s * col(GEO + 3)
        cy = cy + s * col(GEO + 4)
        cz = cz + s * col(GEO + 5)
    r_col = col(GEO + 8)
    inv_r = 1.0 / jnp.where(jnp.abs(r_col) < 1e-12, 1.0, r_col)
    nx = (px - cx) * inv_r
    ny = (py - cy) * inv_r
    phi = jnp.arctan2(nx, ny)
    theta = jnp.arcsin(jnp.clip(ny, -1.0, 1.0))
    uu = 1.0 - (phi + 3.14159265) * (0.5 / 3.14159265)
    vv = (theta + 1.5707963) * (1.0 / 3.14159265)
    if f.has_rects:
        kind = col(COL_KIND)
        axis_r = col(GEO + 0).astype(jnp.int32)
        pa = jnp.where(axis_r == 0, py, px)
        pb = jnp.where(axis_r == 2, py, pz)
        a0, a1 = col(GEO + 1), col(GEO + 2)
        b0, b1 = col(GEO + 3), col(GEO + 4)
        da = a1 - a0
        db = b1 - b0
        da = jnp.where(jnp.abs(da) < 1e-12, 1.0, da)
        db = jnp.where(jnp.abs(db) < 1e-12, 1.0, db)
        u_r = (pa - a0) / da
        v_r = (pb - b0) / db
        uu = jnp.where(kind == KIND_RECT, u_r, uu)
        vv = jnp.where(kind == KIND_RECT, v_r, vv)
    k_attr = attrs3.shape[1]
    img_y = col(k_attr - 3)
    img_h = col(k_attr - 2)
    img_w = col(k_attr - 1)
    ii = jnp.clip((uu * img_w).astype(jnp.int32), 0,
                  jnp.maximum(img_w.astype(jnp.int32) - 1, 0))
    jj = jnp.clip(((1.0 - vv) * img_h - 0.001).astype(jnp.int32), 0,
                  jnp.maximum(img_h.astype(jnp.int32) - 1, 0))
    atlas_t, w_atlas = atlas                             # [3, N] planes
    flat_idx = (img_y.astype(jnp.int32) + jj) * w_atlas + ii
    texel_t = jnp.take(atlas_t, flat_idx, axis=1)        # [3, R] unpadded
    return texel_t[0], texel_t[1], texel_t[2]


def _normal_planes(t, attrs3, state: FastStateP, features: SceneFeatures):
    """Winner surface normal as three [R] planes (mirrors the fused
    kernel's normal computation — used by the NEE tail, which needs it
    OUTSIDE the kernel)."""
    f = features
    R = t.shape[0]
    col = lambda k: attrs3[:, k, :].reshape(R)
    hit = t < _INF
    ts = jnp.where(hit, t, 0.0)
    px = state.rox + ts * state.rdx
    py = state.roy + ts * state.rdy
    pz = state.roz + ts * state.rdz
    kind = col(COL_KIND)
    cx, cy, cz = col(GEO), col(GEO + 1), col(GEO + 2)
    if f.has_motion:
        s = (state.time - col(GEO + 6)) * col(GEO + 7)
        cx = cx + s * col(GEO + 3)
        cy = cy + s * col(GEO + 4)
        cz = cz + s * col(GEO + 5)
    r_col = col(GEO + 8)
    inv_r = 1.0 / jnp.where(jnp.abs(r_col) < 1e-12, 1.0, r_col)
    nx = (px - cx) * inv_r
    ny = (py - cy) * inv_r
    nz = (pz - cz) * inv_r
    if f.has_rects:
        axis = col(GEO + 0)
        flip = col(GEO + 6)
        is_rect = kind == KIND_RECT
        nx = jnp.where(is_rect, (axis == 0.0).astype(px.dtype) * flip, nx)
        ny = jnp.where(is_rect, (axis == 1.0).astype(px.dtype) * flip, ny)
        nz = jnp.where(is_rect, (axis == 2.0).astype(px.dtype) * flip, nz)
    if f.has_boxes:
        ofw = lambda r, c: col(GEO + 6 + r * 4 + c)
        ro_o = [ofw(r, 0) * state.rox + ofw(r, 1) * state.roy
                + ofw(r, 2) * state.roz + ofw(r, 3) for r in range(3)]
        rd_o = [ofw(r, 0) * state.rdx + ofw(r, 1) * state.rdy
                + ofw(r, 2) * state.rdz for r in range(3)]
        rd_o = [jnp.where(jnp.abs(v) < 1e-12, 1e-12, v) for v in rd_o]
        tn3, tf3 = [], []
        for r in range(3):
            rcp = 1.0 / rd_o[r]
            d0 = (col(GEO + r) - ro_o[r]) * rcp
            d1 = (col(GEO + 3 + r) - ro_o[r]) * rcp
            tn3.append(jnp.minimum(d0, d1))
            tf3.append(jnp.maximum(d0, d1))
        t_enter = jnp.maximum(jnp.maximum(tn3[0], tn3[1]), tn3[2])
        enter_axis = jnp.where(tn3[1] > tn3[0], 1, 0)
        enter_axis = jnp.where(tn3[2] > jnp.maximum(tn3[0], tn3[1]), 2,
                               enter_axis)
        exit_axis = jnp.where(tf3[1] < tf3[0], 1, 0)
        exit_axis = jnp.where(tf3[2] < jnp.minimum(tf3[0], tf3[1]), 2,
                              exit_axis)
        is_entry = jnp.abs(ts - t_enter) < 1e-4 * jnp.maximum(
            jnp.abs(ts), 1.0)
        face_axis = jnp.where(is_entry, enter_axis, exit_axis)
        fa = [(face_axis == r).astype(px.dtype) for r in range(3)]
        rd_sel = fa[0] * rd_o[0] + fa[1] * rd_o[1] + fa[2] * rd_o[2]
        n_sign = jnp.where(is_entry, -jnp.sign(rd_sel), jnp.sign(rd_sel))
        n_obj = [fa[r] * n_sign for r in range(3)]
        wfo = lambda r, c: col(GEO + 18 + r * 3 + c)
        is_box = kind == KIND_BOX
        bn = [wfo(r, 0) * n_obj[0] + wfo(r, 1) * n_obj[1]
              + wfo(r, 2) * n_obj[2] for r in range(3)]
        nx = jnp.where(is_box, bn[0], nx)
        ny = jnp.where(is_box, bn[1], ny)
        nz = jnp.where(is_box, bn[2], nz)
    if f.has_media:
        is_med = kind == KIND_MEDIUM
        nx = jnp.where(is_med, 1.0, nx)
        ny = jnp.where(is_med, 0.0, ny)
        nz = jnp.where(is_med, 0.0, nz)
    return nx, ny, nz, (px, py, pz)


def _albedo_planes(t, attrs3, point, features: SceneFeatures,
                   img_planes=None):
    """Winner albedo as three [R] planes (mirror of the fused kernel's
    texture evaluation, for the NEE tail)."""
    f = features
    R = t.shape[0]
    col = lambda k: attrs3[:, k, :].reshape(R)
    px, py, pz = point
    tex_kind = col(3)
    rgb = [col(4), col(5), col(6)]
    if f.has_checker:
        sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
        is_chk = tex_kind == float(TEX_CHECKER)
        neg = sines < 0.0
        for c in range(3):
            rgb[c] = jnp.where(
                is_chk, jnp.where(neg, col(7 + c), col(10 + c)), rgb[c]
            )
    if f.has_noise:
        marble = 0.5 * (1.0 + jnp.sin(col(13) * pz
                                      + 10.0 * fast_turb_c(px, py, pz)))
        is_noise = tex_kind == float(TEX_NOISE)
        for c in range(3):
            rgb[c] = jnp.where(is_noise, marble, rgb[c])
    if f.has_image:
        is_img = tex_kind == 3.0
        for c in range(3):
            rgb[c] = jnp.where(is_img, img_planes[c], rgb[c])
    return rgb


def _fused_nee_tail(t, attrs3, state_in: FastStateP, out: FastStateP,
                    seed, depth, features, prim_scene, nee_scene,
                    nee_lights, img_planes=None, bvh=None, bvh_offsets=None):
    """Plane-form NEE with MIS around the fused kernel — the same
    estimator as :func:`fast_bounce`'s (same RNG draw indices 4-6 and
    8+n_media shadow media), evaluated on [R] planes with only the light
    sampler and the shadow intersect touching [R, 3] forms. The kernel
    already scaled this bounce's emission by ``state_in.emit_scale`` (the
    cube's last entry); this tail adds the light-sample contribution and
    computes the next vertex's emit_scale."""
    from pathtrace_tpu.ops import lights as plights
    from pathtrace_tpu.ops.texture import texture_value

    f = features
    R = t.shape[0]
    col = lambda k: attrs3[:, k, :].reshape(R)
    mat_kind = col(0)
    is_lam = mat_kind == float(MAT_LAMBERTIAN)
    is_iso = mat_kind == float(MAT_ISOTROPIC)
    can = out.alive
    nee_mask = can & (is_lam | is_iso)

    nx, ny, nz, point = _normal_planes(t, attrs3, state_in, f)
    px, py, pz = point
    lu0 = counter_uniform(state_in.lane, seed, depth, 4)
    lu1 = counter_uniform(state_in.lane, seed, depth, 5)
    lu2 = counter_uniform(state_in.lane, seed, depth, 6)
    zero = jnp.zeros_like(px)
    spx = jnp.where(nee_mask, px, zero)
    spy = jnp.where(nee_mask, py, zero)
    spz = jnp.where(nee_mask, pz, zero)
    wix, wiy, wiz, ldist, lpdf, lidx, lvalid = \
        plights.sample_light_dirs_planes(nee_lights, spx, spy, spz,
                                         lu0, lu1, lu2)
    nee_mask = nee_mask & lvalid

    smed_u = None
    if f.has_media:
        n_media = prim_scene.media.count
        smed_u = jnp.stack(
            [counter_uniform(state_in.lane, seed, depth, 8 + n_media + j)
             for j in range(n_media)], axis=-1,
        )
    safe_p = jnp.stack([spx, spy, spz], axis=-1)
    wi3 = jnp.stack([wix, wiy, wiz], axis=-1)
    s_t = nearest_t_only(
        prim_scene, safe_p, wi3, state_in.time, f, med_u=smed_u,
        bvh=bvh, bvh_offsets=bvh_offsets,
    )
    unoccluded = jnp.logical_not((s_t < _INF) & (s_t < ldist * (1.0 - 1e-3)))

    if nee_lights.color is not None:
        # every light texture is a constant: one tiny [L,3] gather per
        # channel (texture_value here would re-pay gather Perlin / atlas
        # machinery the light never uses — the r5 simple_light bomb)
        le = [nee_lights.color[:, c][lidx] for c in range(3)]
    else:
        light_p = safe_p + wi3 * ldist[:, None]
        le3 = texture_value(
            nee_scene, nee_lights.tex_id[lidx],
            jnp.full_like(ldist, 0.5), jnp.full_like(ldist, 0.5), light_p,
            features=f,
        )
        le = [le3[:, c] for c in range(3)]
    snx = jnp.where(nee_mask, nx, zero)
    sny = jnp.where(nee_mask, ny, zero)
    snz = jnp.where(nee_mask, nz, zero)
    cos_s = jnp.maximum(wix * snx + wiy * sny + wiz * snz, 0.0)
    inv_pi = 1.0 / 3.14159265358979
    albedo = _albedo_planes(t, attrs3, point, f, img_planes=img_planes)
    pdf_f = jnp.where(is_lam, cos_s * inv_pi, 0.25 * inv_pi)
    p_b_nee = pdf_f
    w_light = lpdf * lpdf / jnp.maximum(lpdf * lpdf + p_b_nee * p_b_nee,
                                        1e-20)
    scale = jnp.where(
        (nee_mask & unoccluded),
        pdf_f * w_light / jnp.maximum(lpdf, 1e-12), 0.0,
    )
    thr = (state_in.thr_r, state_in.thr_g, state_in.thr_b)
    rad = [out.rad_r, out.rad_g, out.rad_b]
    for c in range(3):
        rad[c] = rad[c] + thr[c] * albedo[c] * le[c] * scale

    # BSDF side of the split: the kernel's scattered direction lives in
    # the output rd planes
    cos_b = jnp.maximum(
        out.rdx * snx + out.rdy * sny + out.rdz * snz, 0.0
    )
    p_b_next = jnp.where(is_lam, cos_b * inv_pi, 0.25 * inv_pi)
    p_l_next = plights.light_dir_pdf_planes(
        nee_lights, spx, spy, spz, out.rdx, out.rdy, out.rdz
    )
    w_bsdf = p_b_next * p_b_next / jnp.maximum(
        p_b_next * p_b_next + p_l_next * p_l_next, 1e-20
    )
    emit_scale_next = jnp.where(
        nee_mask & (p_l_next > 0.0), w_bsdf, jnp.ones_like(px)
    )
    shadow_ct = jnp.sum(nee_mask, dtype=jnp.int32)
    return out._replace(
        rad_r=rad[0], rad_g=rad[1], rad_b=rad[2],
        emit_scale=emit_scale_next,
    ), shadow_ct


def _fused_rr_tail(out: FastStateP, seed, depth, rr_start: int):
    """Plane-form Russian roulette after the fused kernel (same rule and
    draw index 7 as :func:`fast_bounce`'s)."""
    thr = (out.thr_r, out.thr_g, out.thr_b)
    p_rr = jnp.clip(
        jnp.maximum(jnp.maximum(thr[0], thr[1]), thr[2]), 0.05, 1.0
    )
    rr_u = counter_uniform(out.lane, seed, depth, 7)
    roll = out.alive & (depth >= rr_start)
    survive = jnp.logical_not(roll) | (rr_u < p_rr)
    boost = jnp.where(roll & survive, 1.0 / p_rr, 1.0)
    return out._replace(
        thr_r=thr[0] * boost, thr_g=thr[1] * boost, thr_b=thr[2] * boost,
        alive=out.alive & survive,
    )


def _fused_shade_from_winners(table, idx, t, state, seed, depth, max_depth,
                              features, sky, use_gradient_sky, atlas=None,
                              nee_lights=None, rr_start: int = 0,
                              prim_scene=None, nee_scene=None,
                              bvh=None, bvh_offsets=None):
    """Shared tail of the fused bounce: ONE winner row gather + the fused
    Pallas shading kernel (brute and BVH intersect providers both land
    here, so their shading is the same program byte-for-byte).

    ``nee_lights`` adds the plane-form NEE tail (:func:`_fused_nee_tail` —
    emission scaling happens IN the kernel via the emit_scale cube entry)
    and changes the return to ``(state, shadow_ray_count)``; ``rr_start``
    adds the roulette tail."""
    from pathtrace_tpu.ops.shade_pallas import shade_bounce_planes

    attrs = table[idx]                                   # ONE row gather
    # deliver attrs as ONE (rows, K, 128) array — a single minor-dim
    # transpose instead of K strided column extracts (the extracts cost
    # ~27 ms/1M rays vs ~5 ms for the transpose; tools/split_probe.py).
    # The kernel reads attr k as a static middle-dim slice.
    R, K = attrs.shape
    attrs3 = attrs.reshape(R // 128, 128, K).transpose(0, 2, 1)

    img_planes = None
    if features.has_image:
        import os as _os
        if _os.environ.get("PATHTRACE_IMG_STUB"):
            # diagnostic: constant texels, same kernel signature — isolates
            # the pre-pass cost from the kernel's image branch
            img_planes = (state.thr_r * 0.0 + 0.5,) * 3
        else:
            img_planes = _image_rgb_planes(atlas, t, attrs3, state, features)

    state_planes = {
        "rox": state.rox, "roy": state.roy, "roz": state.roz,
        "rdx": state.rdx, "rdy": state.rdy, "rdz": state.rdz,
        "time": state.time,
        "thr_r": state.thr_r, "thr_g": state.thr_g, "thr_b": state.thr_b,
        "rad_r": state.rad_r, "rad_g": state.rad_g, "rad_b": state.rad_b,
        "alive": state.alive.astype(state.rox.dtype),
        "lane": state.lane.astype(jnp.int32),
    }
    outs = shade_bounce_planes(
        t, attrs3, state_planes, seed, depth, sky, use_gradient_sky,
        features, max_depth, img_planes=img_planes,
        emit_scale=state.emit_scale if nee_lights is not None else None,
    )
    out = state._replace(
        rox=outs[0], roy=outs[1], roz=outs[2],
        rdx=outs[3], rdy=outs[4], rdz=outs[5],
        rad_r=outs[6], rad_g=outs[7], rad_b=outs[8],
        thr_r=outs[9], thr_g=outs[10], thr_b=outs[11],
        alive=outs[12] > 0.5,
    )
    shadow_ct = None
    if nee_lights is not None:
        out, shadow_ct = _fused_nee_tail(
            t, attrs3, state, out, seed, depth, features, prim_scene,
            nee_scene, nee_lights, img_planes=img_planes,
            bvh=bvh, bvh_offsets=bvh_offsets,
        )
    if rr_start > 0:
        out = _fused_rr_tail(out, seed, depth, rr_start)
    return (out, shadow_ct) if nee_lights is not None else out


def _bounce_group_fused(tables, sky, grad_sky, state, seed,
                        depth0, max_depth, features, prims,
                        group: int = 1, cull_first: bool = False,
                        bvh=None, bvh_offsets=None, atlas=None,
                        bvh_first: bool = True, nee_lights=None,
                        rr_start: int = 0, nee_scene=None):
    """``prims``: (spheres, rects, boxes, media) with absent kinds None —
    the bounce needs no other scene leaves (shading data is in the
    prebuilt tables), and keeping unused pytrees out of the signature
    keeps the argument list honest.

    ``cull_first``: run the in-kernel per-tile AABB cull on the group's
    FIRST bounce only. The cull decision is per 512-ray block, so it pays
    only for coherent rays — camera (depth-0) blocks share tight frusta
    and skip most tiles; diffuse bounce blocks want the union of every
    lane's tiles and the conditional machinery becomes pure overhead
    (tools/cull_probe.py: XL primary 147->126 ms, scattered 151->211 ms).
    The host ladder sets it for the depth-0 dispatch of big static scenes.
    """
    segs = jnp.int32(0)
    for g in range(group):
        segs = segs + jnp.sum(state.alive, dtype=jnp.int32)
        res = _fast_bounce_fused_prims(
            tables, sky, grad_sky, state, seed, depth0 + g,
            max_depth, features, prims,
            cull=(cull_first and (g == 0 or CULL_ALL_DEPTHS)),
            bvh=bvh, bvh_offsets=bvh_offsets, atlas=atlas,
            bvh_first=(bvh_first and g == 0),
            nee_lights=nee_lights, rr_start=rr_start, nee_scene=nee_scene,
        )
        if nee_lights is not None:
            state, shadow_ct = res
            segs = segs + shadow_ct
        else:
            state = res
    return state, segs


_STATICS = ("max_depth", "features", "group", "cull_first", "bvh_offsets",
            "bvh_first", "rr_start")
# Two compilations of the same bounce group: the depth-0 dispatch must NOT
# donate (its state planes wrap the CALLER's ro/rd/time arrays, which the
# caller may reuse — e.g. rendering the same rays twice); every later
# dispatch's state is a jit output nothing else holds, so donating lets
# XLA alias the ~13 wavefront planes in place instead of double-buffering.
_bounce_group_fused_first = functools.partial(
    jax.jit, static_argnames=_STATICS
)(_bounce_group_fused)
_bounce_group_fused_jit = functools.partial(
    jax.jit, static_argnames=_STATICS, donate_argnums=(3,)
)(_bounce_group_fused)


def _atlas_planes(scene: Scene):
    """Atlas as a [3, N] plane-form array + its row width, hoisted OUT of
    the bounce: the [H, W, 3] form's minor dim of 3 pads 128x in device
    tiling, so transposing (or gathering) it per bounce re-reads the
    whole padded layout — measured +410 ms/frame on earth (r5,
    tools/earth_probe.py) before this hoist."""
    w = jnp.int32(scene.atlas.data.shape[1])
    if scene.atlas.data_planes is not None:
        return scene.atlas.data_planes, w
    return scene.atlas.data.reshape(-1, 3).T, w


def _scene_prims(scene: Scene, features: SceneFeatures):
    return (
        scene.spheres if features.has_spheres else None,
        scene.rects if features.has_rects else None,
        scene.boxes if features.has_boxes else None,
        scene.media if features.has_media else None,
    )


@functools.partial(jax.jit, static_argnames=("features",))
def prep_tables(scene: Scene, features: SceneFeatures):
    k = attr_width(features)
    tables = (
        build_sphere_table(scene, k),
        build_rect_table(scene, k),
        build_box_table(scene, k) if features.has_boxes else None,
        build_media_table(scene, k) if features.has_media else None,
    )
    return tables, scene.sky.reshape(1, 3), scene.use_gradient_sky


def trace_fast_diff(
    scene: Scene,
    ro,
    rd,
    time,
    seed,
    max_depth: int,
    features: SceneFeatures,
    lane_offset=0,
    alive_limit: Optional[int] = None,
    bvh=None,
    bvh_offsets=None,
):
    """Differentiable fast trace: lax.scan over the full bounce budget.

    Every piece of ``fast_bounce`` is reverse-differentiable (the pallas
    kernel via its custom VJP, the row gather, the elementwise shading), so
    scene-parameter gradients flow through the attribute tables back to the
    scene pytree. No compaction (static shapes under scan). Returns
    (radiance [R, 3], ray_count []).

    ``lane_offset``/``alive_limit`` mirror :func:`trace_fast_device`: the
    counter-hash RNG is keyed on global lane ids, so a ``shard_map`` over
    the ray axis (``parallel.mesh.trace_sharded`` with
    ``differentiable=True``) is bit-identical to the single-device trace,
    and the shard_map transpose inserts the scene-gradient all-reduce
    (psum of replicated-input cotangents) over ICI automatically.
    """
    assert fastpath_supported(features, scene)
    assert bvh is None, (
        "the BVH traversal's while_loop is not reverse-differentiable; "
        "differentiate via the brute fast path or the general integrator"
    )
    R = ro.shape[0]
    tables, sky, grad_sky = prep_tables(scene, features)
    seed_arr = jnp.asarray(seed, jnp.int32)
    lane = jnp.uint32(lane_offset) + jnp.arange(R, dtype=jnp.uint32)
    alive = (
        jnp.ones(R, bool) if alive_limit is None
        else lane < jnp.uint32(alive_limit)
    )
    state = FastState(
        ro=ro,
        rd=rd,
        time=time,
        radiance=jnp.zeros((R, 3), ro.dtype),
        throughput=jnp.ones((R, 3), ro.dtype),
        alive=alive,
        lane=lane,
    )

    def step(carry, depth):
        state, segs = carry
        segs = segs + jnp.sum(state.alive, dtype=jnp.int32)
        state = fast_bounce(
            tables, sky, grad_sky, state, seed_arr, depth, max_depth,
            features, scene=scene,
        )
        return (state, segs), None

    (state, segs), _ = jax.lax.scan(
        step, (state, jnp.int32(0)),
        jnp.arange(max_depth + 1, dtype=jnp.int32),
    )
    return state.radiance, segs


def trace_fast_device(
    scene: Scene,
    ro,
    rd,
    time,
    seed,
    max_depth: int,
    features: SceneFeatures,
    lane_offset=0,
    alive_limit: Optional[int] = None,
    bvh=None,
    bvh_offsets=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-device fused fast trace: ``lax.scan`` over the bounce budget,
    no host loop, no compaction. jit- and ``shard_map``-composable — the
    multi-chip fast path (:mod:`pathtrace_tpu.parallel.mesh`) runs this in
    every shard, so distributed renders ride the same Pallas closest-hit +
    fused shading kernels as a single chip.

    The counter-hash RNG is keyed on (lane, seed, depth, draw) only, and
    ``lane_offset`` (may be traced, e.g. ``axis_index * shard_size``)
    makes lane ids globally unique — a sharded render is therefore
    bit-identical to the equivalent single-device trace, and shards need
    no per-device key folding.

    ``R`` must be a multiple of 1024 (plane-block granularity — the
    sharded caller pads); lanes at or beyond ``alive_limit`` (global lane
    id) are born dead: they trace no segments and contribute zero.
    Returns (radiance [R, 3], ray_count []).
    """
    assert fastpath_supported(features, scene)
    from pathtrace_tpu.ops.shade_pallas import fused_shade_supported

    assert fused_shade_supported(features), (
        "trace_fast_device covers fused-shading scenes; image-on-boxes/"
        "media scenes shard via the general integrator "
        "(_image_rgb_planes implements sphere and rect UV only — add a "
        "box-UV branch mirroring fast_bounce's before widening the gate)"
    )
    R = ro.shape[0]
    assert R % 1024 == 0, "pad the per-shard ray count to 1024"
    tables, sky, grad_sky = prep_tables(scene, features)
    seed_arr = jnp.asarray(seed, jnp.int32)
    lane = jnp.uint32(lane_offset) + jnp.arange(R, dtype=jnp.uint32)
    alive = (
        jnp.ones(R, bool) if alive_limit is None
        else lane < jnp.uint32(alive_limit)
    )
    state = FastStateP(
        rox=ro[:, 0], roy=ro[:, 1], roz=ro[:, 2],
        rdx=rd[:, 0], rdy=rd[:, 1], rdz=rd[:, 2],
        time=time,
        rad_r=jnp.zeros(R, ro.dtype), rad_g=jnp.zeros(R, ro.dtype),
        rad_b=jnp.zeros(R, ro.dtype),
        thr_r=jnp.ones(R, ro.dtype), thr_g=jnp.ones(R, ro.dtype),
        thr_b=jnp.ones(R, ro.dtype),
        alive=alive, lane=lane,
    )
    prims = _scene_prims(scene, features)
    atlas = _atlas_planes(scene) if features.has_image else None

    def step(carry, depth):
        st, segs = carry
        segs = segs + jnp.sum(st.alive, dtype=jnp.int32)
        st = _fast_bounce_fused_prims(
            tables, sky, grad_sky, st, seed_arr, depth, max_depth,
            features, prims, atlas=atlas,
            bvh=bvh, bvh_offsets=bvh_offsets,
        )
        return (st, segs), None

    (state, segs), _ = jax.lax.scan(
        step, (state, jnp.int32(0)),
        jnp.arange(max_depth + 1, dtype=jnp.int32),
    )
    radiance = jnp.stack([state.rad_r, state.rad_g, state.rad_b], axis=-1)
    return radiance, segs


class DeviceRayCount:
    """Lazy cross-chunk segment total that cannot wrap int32.

    Each part is a device int32 scalar bounded by ONE ``trace_fast`` call
    (at most ``FRAME_CHUNK * (max_depth + 1)`` segments, ~46M — comfortably
    int32). The TOTAL across a huge-spp frame's chunks can exceed 2**31
    (1280x720 @ 1024 spp, depth 10 is ~10B segments), so parts stay
    separate device scalars and are read back together and summed
    host-side in python ints at ``int()`` time — one sync point, the same
    lagged-readback discipline the drivers already follow. The reference's
    ``usize`` ray counter never wraps (reference src/scene.rs:21); this is
    the fixed-width-device analog.
    """

    __slots__ = ("parts",)

    def __init__(self, parts):
        self.parts = list(parts)

    def __add__(self, other):
        if isinstance(other, DeviceRayCount):
            return DeviceRayCount(self.parts + other.parts)
        if isinstance(other, (int, float)) and other == 0:
            return DeviceRayCount(self.parts)
        return DeviceRayCount(self.parts + [other])

    __radd__ = __add__

    def __int__(self):
        if not self.parts:
            return 0
        vec = np.asarray(jnp.stack(self.parts)).astype(np.int64)
        return int(vec.sum())

    __index__ = __int__


def frame_chunk(features: SceneFeatures) -> int:
    """Rays per trace_fast launch-set.

    The padded-HLO-temp blowup is driven by the 7-octave noise graph in
    XLA shading (~18 GB of lane-padded [R, 3] temps at 3.7M rays). Fused
    Pallas shading computes the noise inside the kernel on packed
    (rows, 128) planes, so only scenes still on the XLA shading path
    (image textures, `fused_shade_supported` False) need the small chunk
    when they also carry noise.
    """
    from pathtrace_tpu.ops.shade_pallas import fused_shade_supported

    if features.has_noise and not fused_shade_supported(features):
        return 1 << 20
    return 1 << 22


@functools.lru_cache(maxsize=16)
def _tile_perm_np(height: int, width: int, tile: int = 64):
    """Pixel permutation into ``tile x tile`` screen tiles (+ its inverse).

    Raster order makes a 4096-lane kernel block span the full image WIDTH
    (a wide, flat frustum that overlaps most of the scene); tile order
    makes each block a compact pixel tile whose ray frustum is narrow —
    which is what the in-kernel AABB culls prune against. Measured on the
    65k-sphere crossover scene (r5, same-window): the hierarchical cull
    goes from +17% over flat (raster) to 2.2x (tile order).
    """
    import numpy as _np

    i = _np.arange(height * width, dtype=_np.int64)
    x = i % width
    y = i // width
    tiles_x = (width + tile - 1) // tile
    key = (((y // tile) * tiles_x + (x // tile)) << 20) \
        + (y % tile) * tile + (x % tile)
    order = _np.argsort(key, kind="stable").astype(_np.int32)
    inv = _np.empty_like(order)
    inv[order] = _np.arange(order.size, dtype=_np.int32)
    return order, inv


@functools.partial(jax.jit, static_argnames=("samples",))
def _permute_rays_jit(ro, rd, t, order, samples):
    """Permute the pixel axis of a [H*W*S]-flat ray set by ``order`` with
    ONE packed row gather (per-plane lane gathers are ~13 ms/1M each on
    this device; a [hw, 7S] row gather amortizes ~5x — PERF.md)."""
    S = samples
    hw = order.shape[0]
    pack = jnp.concatenate(
        [ro.reshape(hw, S * 3), rd.reshape(hw, S * 3), t.reshape(hw, S)],
        axis=1,
    )[order]
    R = hw * S
    return (
        pack[:, : 3 * S].reshape(R, 3),
        pack[:, 3 * S: 6 * S].reshape(R, 3),
        pack[:, 6 * S:].reshape(R),
    )


@functools.partial(
    jax.jit, static_argnames=("height", "width", "samples")
)
def _unpermute_image_jit(radiance, inv, height, width, samples):
    S = samples
    hw = height * width
    rows = radiance.reshape(hw, S * 3)[inv]
    return rows.reshape(height, width, samples, 3).mean(axis=2)


def render_frame_fast(
    scene: Scene,
    camera,
    width: int,
    height: int,
    samples: int,
    max_depth: int,
    frame_key,
    seed: int,
    features: SceneFeatures,
    min_size: int = 1 << 15,
    compaction: bool = True,
    group: Optional[int] = None,
    stratify: bool = False,
    bvh=None,
    bvh_offsets=None,
    nee_lights=None,
    rr_start: int = 0,
):
    """Whole-frame render via the fast path (host-driven loop).

    ``frame_key`` drives primary-ray jitter (Threefry); ``seed`` must be
    frame-unique and drives the per-bounce counter-hash RNG.
    Returns (image [H, W, 3], ray_count as a DEVICE scalar — convert with
    ``int()`` only outside hot loops; each conversion is a tunnel round
    trip on this platform).

    Frames larger than FRAME_CHUNK rays are traced in chunks: XLA pads the
    minor dim of [R, 3] shading temps to full lane tiles, so a noise-texture
    bounce graph at 3.7M rays wants ~18 GB of padded HLO temps — chunking
    bounds it. Lane ids stay globally unique so chunking never changes the
    image.
    """
    ro, rd, t = _gen_rays_jit(camera, width, height, samples, frame_key,
                              stratify)
    R = height * width * samples
    ro = ro.reshape(R, 3)
    rd = rd.reshape(R, 3)
    t = t.reshape(R)
    # scene-scale frames trace in TILE pixel order: kernel blocks become
    # compact frusta the in-kernel AABB culls can actually prune (see
    # _tile_perm_np). Same estimator — lanes are renamed, the counter RNG
    # keys on lane ids, and the image is un-permuted after the trace.
    n_tiles = (scene.spheres.center.shape[0] + TILE_N - 1) // TILE_N
    tile_layout = (
        bvh is None and features.has_spheres and not features.has_motion
        and n_tiles >= CULL_MIN_TILES and height >= 64 and width >= 64
    )
    inv_perm = None
    if tile_layout:
        order_np, inv_np = _tile_perm_np(height, width)
        ro, rd, t = _permute_rays_jit(ro, rd, t, jnp.asarray(order_np),
                                      samples)
        inv_perm = jnp.asarray(inv_np)
    FRAME_CHUNK = frame_chunk(features)
    if R <= FRAME_CHUNK:
        radiance, ray_count = trace_fast(
            scene, ro, rd, t, seed, max_depth, features,
            min_size=min_size, compaction=compaction, group=group,
            bvh=bvh, bvh_offsets=bvh_offsets,
            nee_lights=nee_lights, rr_start=rr_start,
        )
    else:
        parts = []
        counts = []
        for lo in range(0, R, FRAME_CHUNK):
            hi = min(lo + FRAME_CHUNK, R)
            rad_c, cnt_c = trace_fast(
                scene, ro[lo:hi], rd[lo:hi], t[lo:hi], seed, max_depth,
                features, min_size=min_size, compaction=compaction,
                group=group, lane_offset=lo,
                bvh=bvh, bvh_offsets=bvh_offsets,
                nee_lights=nee_lights, rr_start=rr_start,
            )
            parts.append(rad_c)
            counts.append(cnt_c)
        # per-chunk counts stay separate device scalars: a device int32 SUM
        # across chunks wraps past ~2.1B segments (1280x720 @ 1024 spp is
        # ~10B) — DeviceRayCount sums host-side in python ints at int() time
        ray_count = DeviceRayCount(counts)
        radiance = jnp.concatenate(parts, axis=0)
    if inv_perm is not None:
        img = _unpermute_image_jit(radiance, inv_perm, height, width, samples)
    else:
        img = radiance.reshape(height, width, samples, 3).mean(axis=2)
    return img, ray_count


@functools.partial(
    jax.jit, static_argnames=("width", "height", "samples", "stratify")
)
def _gen_rays_jit(camera, width, height, samples, key, stratify=False):
    from pathtrace_tpu.render.frame import generate_primary_rays

    return generate_primary_rays(camera, width, height, samples, key,
                                 stratify=stratify)


def trace_fast(
    scene: Scene,
    ro,
    rd,
    time,
    seed: int,
    max_depth: int,
    features: SceneFeatures,
    min_size: int = 1 << 15,
    compaction: bool = True,
    group: Optional[int] = None,
    lane_offset: int = 0,
    bvh=None,
    bvh_offsets=None,
    nee_lights=None,
    rr_start: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Host-driven fast trace with stream compaction.

    ``group`` bounces run per dispatch (amortizes ~45 ms tunnel overhead
    per jit call); ``lane_offset`` keeps RNG stream ids globally unique
    when a frame is traced in chunks. Returns ``(radiance [R, 3],
    ray_count)`` where ray_count is a DEVICE int32 scalar — per-call
    magnitudes ((max_depth+1) * R segments) fit comfortably, but callers
    accumulating across many frames should convert to python ints outside
    the hot loop (lagged, like the progressive driver) rather than
    summing device scalars without bound: int32 wraps past ~2.1B
    segments.

    ``bvh``/``bvh_offsets`` (the ``-B`` analog): whole-scene BVH traversal
    replaces the brute sweeps as the intersect provider on BOTH shading
    flavors; everything else (ladder, compaction, fused shading) is shared,
    so ``-B`` rides the full fast-path machinery.
    """
    assert fastpath_supported(features, scene)
    from pathtrace_tpu.ops.shade_pallas import fused_shade_supported

    # segment counts ride device int32: one call's ceiling must fit
    # (frame-scale workloads arrive pre-chunked via render_frame_fast)
    assert ro.shape[0] * (max_depth + 1) < 2**31, (
        "trace_fast call would overflow its int32 segment counter; "
        "split the wavefront (render_frame_fast chunks automatically)"
    )

    if group is None:
        # BVH bounces are ~20x a brute bounce (serial traversal chain), so
        # grouping delays compaction at full width for the whole group:
        # measured g1 4.08 s vs g4 7.39 s on a 1M depth-10 trace
        # (tools/bvh_ladder_probe.py). Ungrouped + eager shrink wins.
        group = 1 if bvh is not None else DEFAULT_GROUP
    # same economics for the compaction trigger: traversal cost scales
    # with wavefront size, so ANY shrink pays on the BVH path, while the
    # cheap brute bounces only profit from strong (>= 1/0.35x) shrinks
    shrink = 0.9 if bvh is not None else COMPACT_SHRINK
    count_skip = BVH_COUNT_SKIP if bvh is not None else COUNT_SKIP_SIZE
    tables, sky, grad_sky = prep_tables(scene, features)
    seed_arr = jnp.asarray(seed, jnp.int32)

    # NEE and RR ride the FUSED flavor too (r5): emission scaling happens
    # in the kernel via the emit_scale attr-cube entry, and the estimator
    # itself is a plane-form tail (_fused_nee_tail) around it — --nee/
    # --rr keep the whole fast path including the fused shading kernel.
    # Image-on-boxes/media scenes take the XLA shading flavor below,
    # whose fast_bounce implements the same estimator.
    if fused_shade_supported(features):
        # fused path: plane-form state + Pallas shading (sphere/rect scenes);
        # pad to 1024-ray multiples so plane blocks satisfy the Mosaic
        # sublane-divisibility constraint (compaction rungs below 1024 are
        # powers of two and use whole-plane blocks)
        R0 = ro.shape[0]

        prims = _scene_prims(scene, features)
        atlas = _atlas_planes(scene) if features.has_image else None
        n_tiles = (scene.spheres.center.shape[0] + 127) // 128
        cull_scene = (
            bvh is None
            and features.has_spheres and not features.has_motion
            and n_tiles >= CULL_MIN_TILES
        )

        nee_scene = scene if nee_lights is not None else None

        def step(state, depth, g):
            # depth-0 state wraps caller arrays: no donation there
            fn = (_bounce_group_fused_first if depth == 0
                  else _bounce_group_fused_jit)
            return fn(
                tables, sky, grad_sky, state, seed_arr, jnp.int32(depth),
                max_depth, features, prims, group=g,
                cull_first=cull_scene and (depth == 0 or CULL_ALL_DEPTHS),
                bvh=bvh, bvh_offsets=bvh_offsets, atlas=atlas,
                bvh_first=(depth == 0),
                nee_lights=nee_lights, rr_start=rr_start,
                nee_scene=nee_scene,
            )

        def make_state(lo, hi, rp=None):
            # pad to 1024-ray multiples so plane blocks satisfy the Mosaic
            # sublane-divisibility constraint (compaction rungs below 1024
            # are powers of two and use whole-plane blocks). ``rp`` lets the
            # interleaved ladder force EVERY chunk to one padded size — a
            # short tail chunk otherwise rounds to a smaller 1024-multiple
            # and compiles a second program-shape family (minutes per shape
            # on this platform's compile service).
            n = hi - lo
            if rp is None:
                rp = ((n + 1023) // 1024) * 1024 if n >= 1024 else (
                    ((n + 127) // 128) * 128
                )

            def padp(x):
                if rp == n:
                    return x
                return jnp.concatenate(
                    [x, jnp.zeros((rp - n,) + x.shape[1:], x.dtype)]
                )

            return FastStateP(
                rox=padp(ro[lo:hi, 0]), roy=padp(ro[lo:hi, 1]),
                roz=padp(ro[lo:hi, 2]),
                rdx=padp(rd[lo:hi, 0]), rdy=padp(rd[lo:hi, 1]),
                rdz=padp(rd[lo:hi, 2]),
                time=padp(time[lo:hi]),
                rad_r=jnp.zeros(rp, ro.dtype), rad_g=jnp.zeros(rp, ro.dtype),
                rad_b=jnp.zeros(rp, ro.dtype),
                thr_r=jnp.ones(rp, ro.dtype), thr_g=jnp.ones(rp, ro.dtype),
                thr_b=jnp.ones(rp, ro.dtype),
                # padded lanes are born dead: no rays, flush zeros
                alive=jnp.arange(rp) < n,
                lane=jnp.arange(lane_offset + lo, lane_offset + lo + rp,
                                dtype=jnp.uint32),
                emit_scale=(jnp.ones(rp, ro.dtype)
                            if nee_lights is not None else None),
            )

        if compaction and R0 > INTERLEAVE_CHUNK:
            # interleaved multi-chunk ladder: sub-wavefronts stay on the
            # cheap side of the per-lane cost curve (PERF.md: ~14 ms/1M-lane
            # marginal at 1M vs ~31 at 3.7M) and counts are consumed
            # eagerly — the readback latency hides behind the other
            # chunks' queued device work
            # balance chunk sizes (vs fixed-size chunks + remainder): the
            # scheduler hides each chunk's readbacks behind the OTHERS'
            # device work, so equal chunks keep every stage covered — and
            # all chunks share ONE program shape instead of two
            n_chunks = (R0 + INTERLEAVE_CHUNK - 1) // INTERLEAVE_CHUNK
            per_chunk = (R0 + n_chunks - 1) // n_chunks
            base = ((per_chunk + 1023) // 1024) * 1024
            bounds = [
                (lo, min(lo + base, R0)) for lo in range(0, R0, base)
            ]
            chunk_states = [make_state(lo, hi, rp=base) for lo, hi in bounds]
            return _interleaved_ladder(
                step, chunk_states, [hi - lo for lo, hi in bounds],
                max_depth, max(min_size, 128), group,
                radiance_fields=("rad_r", "rad_g", "rad_b"),
                shrink=shrink if bvh is not None else None,
                count_skip=count_skip if bvh is not None else None,
            )

        # fused bounce graphs are small (no [R,3] fusion temps), so bounce
        # grouping is safe at every wavefront size
        state = make_state(0, R0)
        out_radiance, ray_count = _host_ladder(
            step, state, state.alive.shape[0],
            max_depth, max(min_size, 128), compaction, group,
            group_size_cap=None,
            radiance_fields=("rad_r", "rad_g", "rad_b"),
            shrink=shrink if bvh is not None else None,
        )
        return out_radiance[:R0], ray_count

    state = FastState(
        ro=ro,
        rd=rd,
        time=time,
        radiance=jnp.zeros(ro.shape, ro.dtype),
        throughput=jnp.ones(ro.shape, ro.dtype),
        alive=jnp.ones(ro.shape[0], bool),
        lane=jnp.arange(lane_offset, lane_offset + ro.shape[0], dtype=jnp.uint32),
        emit_scale=(jnp.ones(ro.shape[0], ro.dtype)
                    if nee_lights is not None else None),
    )

    def step(state, depth, g):
        return _bounce_group_jit(
            tables, sky, grad_sky, state, seed_arr, jnp.int32(depth),
            max_depth, features, scene, group=g,
            bvh=bvh, bvh_offsets=bvh_offsets,
            nee_lights=nee_lights, rr_start=rr_start,
        )

    # group bounces only for small wavefronts on this path: at large R the
    # XLA buffer assignment of a multi-bounce program balloons (measured
    # 21 GB at 3.7M rays x 2 bounces)
    return _host_ladder(
        step, state, ro.shape[0], max_depth, min_size, compaction, group,
        group_size_cap=1 << 19, radiance_fields=("radiance",),
        shrink=shrink if bvh is not None else None,
    )


# Above this many lanes, the ladder compacts by ROWS (cheap, eager);
# at or below it, by exact lanes. Patchable for tests.
LANE_COMPACT_MAX = 1 << 19

# Fused-path wavefronts larger than this are traced as interleaved
# sub-chunks (see _interleaved_ladder). The per-LANE fused-bounce cost is
# nonlinear in wavefront size on this device (~14.2 ms/1M-lane marginal at
# 1M lanes vs ~31 ms/1M at 3.7M — tools/ladder_trace.py), so sub-2M chunks
# win even before scheduling effects. Swept on the headline frame
# (tools/chunk_sweep.py, chunk:group): 2M:3 17.5 / 2M:4 17.0 / 1M:4 16.9 /
# 1M:3 13.5 / 2M:2 12.9 / 1M:2 12.7 / 512k:3 12.5 Mrays/s.
# Patchable for tests/sweeps.
INTERLEAVE_CHUNK = 1 << 21

# Interleaved-ladder chunks at or below this size stop reading alive
# counts: a count readback is a full tunnel round trip (~27 ms), more than
# tracing the remaining tail bounces at these sizes costs. Swept on the
# headline frame: 256k 18.3 / 512k 18.0 / 64k 13.0 Mrays/s (same epoch).
# Patchable.
COUNT_SKIP_SIZE = 1 << 18

# Interleaved-ladder compaction trigger: compact when the alive rung is at
# most this fraction of the current size. Compaction is XLA gather work at
# the OUTPUT size; bounces got ~3x cheaper with the rays-in-lanes kernel,
# so only strong shrinks pay. Swept on the headline frame (same epoch):
# 0.35 -> 33.4 Mrays/s vs 0.6 -> 23.4. Patchable.
COMPACT_SHRINK = 0.35

# Static sphere scenes spanning at least this many 128-sphere tiles use the
# in-kernel per-tile AABB cull (tools/cull_probe.py economics). Patchable.
CULL_MIN_TILES = 8

# Run the in-kernel AABB cull on EVERY bounce of big static scenes, not
# just depth 0. Pre-tile-order, bounce blocks were too divergent to skip
# tiles (tools/cull_probe.py r3: scattered 151->211 ms) — the tile-ordered
# frame layout keeps bounce blocks pixel-tile coherent and inverts the
# verdict: XL end-to-end 8.5 (primary-only) -> 9.9 Mrays/s (all depths)
# same-window (tools/xl_bench.py, r5). Patchable.
CULL_ALL_DEPTHS = True

# BVH-mode count-skip floor: traversal bounces are ~20x a brute bounce, so
# count reads (and the compactions they enable) pay down to much smaller
# rungs than on the brute path. Patchable.
BVH_COUNT_SKIP = 1 << 14

# Traversal bulk iterations for non-camera BVH bounces (None = same as
# camera bounces, models/bvh._BULK_IT). Scattered rays finish in ~8 node
# visits at p50 on SAH trees vs ~26 for camera rays, so a short bounce
# bulk looked attractive — but MEASURED WORSE (config4_bvh 23.8 -> 139.6 s
# at bulk 10): every saved full-wavefront lock-step returns as extra
# iterations in the 16 SEQUENTIAL tail slices, whose per-step cost is
# latency-floored (~2 ms at 64k) regardless of live-lane count. Left as a
# knob; the uniform bulk is the measured optimum.
BVH_BOUNCE_BULK = None

# Default bounces per dispatch. Swept repeatedly as the ladder evolved:
# g3 with the two-tier ladder (r2); after the rays-in-lanes kernel
# transpose + interleaved ladder (r3), the headline sweep
# (tools/chunk_sweep.py 2M chunks) reads g4 33.1 / g3 ~20 Mrays/s.
DEFAULT_GROUP = 4


@jax.jit
def _alive_counts_jit(alive):
    """ONE dispatch returning [alive_lanes, alive_rows] (rows = 128-lane
    groups with >= 1 live lane — the row-compaction currency)."""
    lanes = jnp.sum(alive, dtype=jnp.int32)
    if alive.shape[0] % 128 == 0:
        rows = jnp.sum(
            jnp.any(alive.reshape(-1, 128), axis=1), dtype=jnp.int32
        )
    else:
        rows = lanes
    return jnp.stack([lanes, rows])


def _lane_compact(out_radiance, state, indices, next_size, radiance_fields,
                  identity):
    """One exact-lane compaction step, shared by both ladders.

    Returns the updated ``(out_radiance, state, indices, size, identity)``
    — size is the new wavefront size and identity always False after a
    compaction (indices are re-slotted)."""
    out_radiance, state, indices = _compact(
        out_radiance, state, indices, next_size,
        radiance_fields=radiance_fields, identity=identity,
    )
    return out_radiance, state, indices, next_size, False


def _interleaved_ladder(step, chunk_states, chunk_r0s, max_depth, min_size,
                        group, radiance_fields, shrink=None,
                        count_skip=None):
    """Round-robin the compaction ladder over several sub-wavefront chunks.

    Why this beats one big ladder on this platform (all measured —
    tools/ladder_trace.py, tools/dispatch_probe.py, tools/chunk_sweep.py):

    - the fused bounce's per-LANE cost is ~2x higher at 3.7M lanes than at
      1M, so chunks of ~1M are cheaper per segment before any scheduling;
    - dispatch SUBMISSION pipelines (~1-3.5 ms/call queued), so the extra
      per-chunk dispatches are nearly free;
    - alive-count readbacks are consumed EAGERLY (each chunk's next round
      runs at its freshly compacted size — no stale full-width round as
      with the single-ladder lag), and the readback's tunnel latency hides
      behind the other chunks' already-queued device work;
    - ray counts never leave the device: per-group segment counts are
      collected and summed in one tiny program at the end, so the only
      per-round readback is the 2-int count vector.

    Returns ``(radiance [sum(chunk_r0s), 3], ray_count device scalar)``.
    """
    dtype = chunk_states[0].thr_r.dtype
    chunks = []
    for st, r0 in zip(chunk_states, chunk_r0s):
        size = st.alive.shape[0]
        chunks.append({
            "state": st, "size": size, "r0": r0,
            "out_rad": tuple(jnp.zeros(size, dtype) for _ in range(3)),
            "indices": jnp.arange(size, dtype=jnp.int32),
            "identity": True, "depth": 0, "pending": None,
            "segs": [], "done": False,
        })
    # below this size a count readback costs more than just tracing the
    # remaining bounces at the current size (tail rounds are ~ms)
    if count_skip is None:
        count_skip = COUNT_SKIP_SIZE
    count_skip = max(2 * min_size, count_skip)
    if shrink is None:
        shrink = COMPACT_SHRINK

    while not all(c["done"] for c in chunks):
        for c in chunks:
            if c["done"]:
                continue
            if c["pending"] is not None:
                lanes = int(np.asarray(c["pending"])[0])
                c["pending"] = None
                if lanes == 0:
                    c["done"] = True
                    continue
                next_size = _rung(lanes, min_size)
                if next_size <= int(c["size"] * shrink):
                    (c["out_rad"], c["state"], c["indices"], c["size"],
                     c["identity"]) = _lane_compact(
                        c["out_rad"], c["state"], c["indices"], next_size,
                        radiance_fields, c["identity"],
                    )
            g = min(group, max_depth + 1 - c["depth"])
            c["state"], segs = step(c["state"], c["depth"], g)
            c["segs"].append(segs)
            c["depth"] += g
            if c["depth"] > max_depth:
                c["done"] = True
            elif c["size"] > count_skip:
                c["pending"] = _alive_counts_jit(c["state"].alive)

    parts = []
    all_segs = []
    for c in chunks:
        planes = _final_flush(c["out_rad"], c["state"], c["indices"],
                              radiance_fields=radiance_fields,
                              identity=c["identity"])
        parts.append(jnp.stack(planes, axis=1)[:c["r0"]])
        all_segs.extend(c["segs"])
    radiance = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    ray_count = jnp.sum(jnp.stack(all_segs))
    return radiance, ray_count


def _host_ladder(step, state, R, max_depth, min_size, compaction, group,
                 group_size_cap, radiance_fields, shrink=None):
    """Host-driven bounce loop with the lagged-sync compaction ladder.

    Lagged alive counts: the device->host readback costs a full tunnel
    round-trip (~tens of ms), so each group's count is consumed one group
    LATER, by which time it has already arrived — no stall. Safe because
    the alive set only shrinks: a lagged count is an upper bound, so
    compaction to rung(lagged) can never drop a live ray, and the
    termination check is merely one group conservative.
    """
    plane_out = len(radiance_fields) == 3
    if plane_out:
        dtype = state.thr_r.dtype
        out_radiance = tuple(jnp.zeros(R, dtype) for _ in range(3))
    else:
        dtype = state.radiance.dtype
        out_radiance = jnp.zeros((R, 3), dtype)
    indices = jnp.arange(R, dtype=jnp.int32)
    identity = True  # indices untouched until the first compaction:
                     # flushes are dense adds, not scatters
    segs_list = []   # device scalars; summed in ONE program at the end
                     # (an int() per round would be a tunnel round trip)
    size = R
    pending = None   # device [lanes, rows] counts, consumed one group late
    depth = 0
    while depth <= max_depth:
        g_mem = group if (group_size_cap is None or size <= group_size_cap) else 1
        g = min(g_mem, max_depth + 1 - depth)
        state, segs = step(state, depth, g)
        segs_list.append(segs)
        depth += g
        new_pending = _alive_counts_jit(state.alive)
        if pending is not None:
            lag_lanes, lag_rows = (int(v) for v in np.asarray(pending))
            if lag_lanes == 0:
                pending = None
                break
            if compaction:
                # Two-tier ladder (tools/frame_breakdown.py economics):
                # multi-M wavefronts use ROW compaction — whole 128-lane
                # rows whose lanes are all dead are dropped; the permute
                # is built at row scale and every move is a contiguous
                # row gather, so it is near-dispatch-floor cheap and can
                # run eagerly. Once small, the exact lane compaction
                # (packed row-gather form) takes over.
                next_size = _rung(lag_lanes, min_size)
                row_thresh = 0.75 if shrink is None else shrink
                lane_thresh = COMPACT_SHRINK if shrink is None else shrink
                small_thresh = 0.6 if shrink is None else shrink
                if size > LANE_COMPACT_MAX and size % 128 == 0:
                    next_rows = _rung(lag_rows, max(min_size // 128, 1))
                    if next_rows * 128 <= int(size * row_thresh):
                        out_radiance, state, indices = _compact_rows(
                            out_radiance, state, indices, next_rows,
                            radiance_fields=radiance_fields,
                            identity=identity,
                        )
                        size = next_rows * 128
                        identity = False
                    elif next_size <= int(size * lane_thresh):
                        # rows can't shrink (deaths scattered: every
                        # 128-lane row keeps a live lane) — a strong lane
                        # shrink still pays even at multi-M sizes, and
                        # without it the ladder is stuck at full width
                        # for every remaining bounce
                        out_radiance, state, indices, size, identity = (
                            _lane_compact(out_radiance, state, indices,
                                          next_size, radiance_fields,
                                          identity)
                        )
                elif next_size <= int(size * small_thresh):
                    out_radiance, state, indices, size, identity = (
                        _lane_compact(out_radiance, state, indices,
                                      next_size, radiance_fields, identity)
                    )
        pending = new_pending

    out_radiance = _final_flush(out_radiance, state, indices,
                                radiance_fields=radiance_fields,
                                identity=identity)
    if plane_out:
        out_radiance = jnp.stack(out_radiance, axis=1)
    ray_count = (jnp.sum(jnp.stack(segs_list)) if len(segs_list) > 1
                 else segs_list[0])
    return out_radiance, ray_count
