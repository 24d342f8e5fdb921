"""The TPU path-tracing megakernel: the entire bounce loop in one Pallas kernel.

Why this exists — measured on this hardware (v5e via axon):

* a single XLA dynamic gather ``[1M] <- [512]`` costs ~13 ms; the wavefront
  bounce body needs ~25 of them (material/texture table lookups, winner
  attribute fetches) -> ~140 ms/bounce, 100x off speed-of-light;
* the Pallas ``[ray-block x sphere-tile]`` intersection kernel runs the same
  1M x 512 workload in ~0.2 ms.

So the megakernel keeps EVERYTHING on-chip: per 256-ray block it runs the
full bounce loop (intersect -> shade -> scatter -> accumulate) with

* scene data as VMEM-resident **attribute tables** (one row per primitive:
  geometry + material + resolved texture constants);
* winner-attribute extraction via **one-hot matmul on the MXU**
  (``[TILE_R x TILE_N] one-hot  @  [TILE_N x K] attrs``) — the TPU-native
  replacement for the gather;
* **in-kernel PRNG** (``pltpu.prng_*``) for scatter sampling — no HBM-
  roundtripping uniform tensors;
* an in-kernel ``while_loop`` over bounce depth with per-block early exit —
  the megakernel variant of stream compaction (a finished 256-ray block
  stops bouncing entirely).

HBM traffic per frame = primary rays in + radiance out. This is the analog
of — and the answer to — the reference's AVX2 SoA kernel
(reference ``src/collision/spheres_soa.rs:274-391``): where the CPU tiled 8
sphere lanes per instruction, the TPU tiles 256x128 per step and keeps the
whole scene in VMEM.

Scope (``features`` must satisfy ``megakernel_supported``): sphere + rect
primitives; Lambertian/metal/dielectric/diffuse-light materials;
constant/checker/noise textures (noise uses the hash-based fast Perlin —
table Perlin would need in-kernel gathers); gradient or constant sky.
Boxes, participating media and image textures fall back to the general
wavefront integrator.

RNG note: the kernel uses the TPU hardware PRNG seeded per (block, frame),
so images differ from the Threefry integrator by RNG stream only —
statistically identical, deterministic for a fixed seed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.config import MAX_T, MIN_T
from pathtrace_tpu.models.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_LAMBERTIAN,
    MAT_METAL,
    Scene,
    SceneFeatures,
    TEX_CHECKER,
    TEX_CONSTANT,
    TEX_NOISE,
)

_INF = float(MAX_T)
TILE_R = 64  # small: (TILE_R,1) columns pad to 128 lanes, so VMEM cost is TILE_R*512B per live temp
TILE_N = 128
TWO_PI = 6.283185307179586

# ---- shading attribute columns (shared by spheres and rects) ----
# geometry columns are kind-specific; shading columns are appended after.
N_SHADE = 14
# shading layout: [mat_kind, fuzz, ref_idx, tex_kind,
#                  col_r, col_g, col_b, odd_r, odd_g, odd_b,
#                  even_r, even_g, even_b, noise_scale]

N_SPHERE_GEO = 9   # cx, cy, cz, dx, dy, dz, time0, inv_dt, radius
K_SPHERE = N_SPHERE_GEO + N_SHADE          # 23
K_SPHERE_PAD = 24

N_RECT_GEO = 7     # axis, a0, a1, b0, b1, k, flip
K_RECT = N_RECT_GEO + N_SHADE              # 21
K_RECT_PAD = 24


def megakernel_supported(features: SceneFeatures) -> bool:
    return not (features.has_boxes or features.has_media or features.has_image)


def _shade_columns(scene: Scene, mat_id):
    """Resolve per-primitive shading constants ([N]-sized gathers, cheap)."""
    mats = scene.materials
    tex = scene.textures
    tid = mats.tex_id[mat_id]
    cols = [
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
    return cols


def build_sphere_table(scene: Scene) -> jnp.ndarray:
    """[N_pad, K_SPHERE_PAD] attribute table; dead rows never hit."""
    sp = scene.spheres
    n = sp.count
    cols = [
        sp.center[:, 0], sp.center[:, 1], sp.center[:, 2],
        sp.center_delta[:, 0], sp.center_delta[:, 1], sp.center_delta[:, 2],
        sp.time0, sp.inv_time_delta, sp.radius,
    ] + _shade_columns(scene, sp.mat_id)
    table = jnp.stack(cols, axis=1)                           # [n, 23]
    table = jnp.where(sp.mask[:, None], table, 0.0)
    # dead rows: push centers to infinity-ish so the quadratic never hits
    dead = jnp.logical_not(sp.mask)
    table = table.at[:, 0].set(jnp.where(dead, 1.0e18, table[:, 0]))
    n_pad = ((n + TILE_N - 1) // TILE_N) * TILE_N
    pad_rows = n_pad - n
    if pad_rows:
        pad = jnp.zeros((pad_rows, table.shape[1]), table.dtype)
        pad = pad.at[:, 0].set(1.0e18)
        table = jnp.concatenate([table, pad], axis=0)
    k_pad = K_SPHERE_PAD - table.shape[1]
    if k_pad:
        table = jnp.concatenate(
            [table, jnp.zeros((table.shape[0], k_pad), table.dtype)], axis=1
        )
    return table


def build_rect_table(scene: Scene) -> jnp.ndarray:
    """[Nr_pad(=TILE_N), K_RECT_PAD] rect attribute table."""
    rc = scene.rects
    cols = [
        rc.axis.astype(jnp.float32),
        rc.a0, rc.a1, rc.b0, rc.b1, rc.k, rc.flip,
    ] + _shade_columns(scene, rc.mat_id)
    table = jnp.stack(cols, axis=1)
    table = jnp.where(rc.mask[:, None], table, 0.0)
    dead = jnp.logical_not(rc.mask)
    # dead rects: plane at infinity AND an empty in-plane interval
    # (a0 > a1), so even axis-degenerate rays cannot phantom-hit them
    table = table.at[:, 5].set(jnp.where(dead, 1.0e18, table[:, 5]))
    table = table.at[:, 1].set(jnp.where(dead, 1.0, table[:, 1]))
    table = table.at[:, 2].set(jnp.where(dead, -1.0, table[:, 2]))
    n_pad = TILE_N
    pad_rows = n_pad - table.shape[0]
    assert pad_rows >= 0, "megakernel supports at most TILE_N rects"
    if pad_rows:
        pad = jnp.zeros((pad_rows, table.shape[1]), table.dtype)
        pad = pad.at[:, 5].set(1.0e18)
        table = jnp.concatenate([table, pad], axis=0)
    k_pad = K_RECT_PAD - table.shape[1]
    if k_pad:
        table = jnp.concatenate(
            [table, jnp.zeros((table.shape[0], k_pad), table.dtype)], axis=1
        )
    return table


# ---------------------------------------------------------------------------
# in-kernel helpers (all operate on [TILE_R, 1] column vectors)
# ---------------------------------------------------------------------------

def _mix32(h):
    """xorshift-multiply finalizer (uint32)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(2146121005)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2654435769)
    h = h ^ (h >> 13)
    return h


def _counter_uniform(lane, seed, depth, draw):
    """Counter-based uniform in [0,1): hash(lane, seed, depth, draw).

    Replaces the reference's stateful Xoshiro (src/scene.rs:96-102) with a
    stateless counter hash keyed (ray-lane, frame-seed, bounce, draw-index):
    deterministic, identical under the Mosaic compiler and the interpreter
    (pltpu.prng_random_bits is a stub off-TPU), and free of cross-lane state.
    ``lane``: [TILE_R, 1] uint32; returns [TILE_R, 1] f32.
    """
    h = lane * jnp.uint32(747796405) + seed * jnp.uint32(2891336453)
    h = h + depth.astype(jnp.uint32) * jnp.uint32(1013904223)
    h = h + jnp.uint32((draw * 374761393) & 0xFFFFFFFF)
    h = _mix32(h)
    # Mosaic has no uint32->f32 cast; values < 2^24 round-trip via int32
    return (h >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)


def _hash3(ix, iy, iz, salt):
    """Integer mix of three lattice coords -> uint32 (fast Perlin hash).

    uint32 arithmetic throughout: int32 would arithmetic-shift the sign bit
    through the mix and bias the [-1,1] mapping.
    """
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(374761393)
        + iy.astype(jnp.uint32) * jnp.uint32(668265263)
        + iz.astype(jnp.uint32) * jnp.uint32(1103515245)
        + jnp.uint32((salt * 2654435761) & 0xFFFFFFFF)
    )
    h = h ^ (h >> 13)
    h = h * jnp.uint32(1274126177)
    h = h ^ (h >> 16)
    return h


def _hash_to_unit(h):
    """uint32 -> float in [-1, 1]."""
    return (h >> 8).astype(jnp.int32).astype(jnp.float32) * (2.0 / 16777216.0) - 1.0


def _fast_noise(px, py, pz):
    """Hash-based Hermite-smoothed gradient noise (structure of reference
    src/perlin.rs:89-111, with hashed gradients replacing the tables —
    in-kernel table gathers would defeat the megakernel's purpose)."""
    fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
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
                h = _hash3(ix + di, iy + dj, iz + dk, 0)
                gx = _hash_to_unit(h)
                gy = _hash_to_unit(h * 1664525 + 1013904223)
                gz = _hash_to_unit(h * 22695477 + 1)
                dot = gx * (u - di) + gy * (v - dj) + gz * (w - dk)
                accum = accum + wu * wv * wwk * dot
    return accum


def _fast_turb(px, py, pz, octaves: int = 7):
    accum = jnp.zeros_like(px)
    weight = 1.0
    sx, sy, sz = px, py, pz
    for _ in range(octaves):
        accum = accum + weight * _fast_noise(sx, sy, sz)
        weight *= 0.5
        sx, sy, sz = sx * 2.0, sy * 2.0, sz * 2.0
    return jnp.abs(accum)


def _make_kernel(
    ns_tiles: int,
    max_depth: int,
    features: SceneFeatures,
    t_min: float = MIN_T,
):
    """Build the megakernel body for a given scene shape/feature set."""
    f = features
    has_rects = f.has_rects

    def kernel(
        seed_ref,                   # SMEM (1,2) int32: [seed, lane_offset]
        sky_ref,                    # SMEM (1,4) f32: r, g, b, use_gradient
        ox, oy, oz, dx, dy, dz, tm,  # VMEM [TILE_R, 1] ray columns
        sph_ref,                    # VMEM [Ns_pad, K_SPHERE_PAD]
        rect_ref,                   # VMEM [TILE_N, K_RECT_PAD]
        rad_out,                    # VMEM [TILE_R, 4]: rgb + segment count
    ):
        lane = (
            jax.lax.broadcasted_iota(jnp.uint32, (TILE_R, 1), 0)
            + jnp.uint32(pl.program_id(0) * TILE_R)
            + seed_ref[0, 1].astype(jnp.uint32)
        )
        seed_u = seed_ref[0, 0].astype(jnp.uint32)

        sky_r = sky_ref[0, 0]
        sky_g = sky_ref[0, 1]
        sky_b = sky_ref[0, 2]
        sky_grad = sky_ref[0, 3]

        def intersect_spheres(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, time):
            ro_d = ro_x * rd_x + ro_y * rd_y + ro_z * rd_z
            ro_ro = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z

            def tile_step(k, carry):
                best_t, best_attr = carry
                rows = sph_ref[pl.ds(k * TILE_N, TILE_N), :]      # [TILE_N, K]
                cx = rows[:, 0][None, :]
                cy = rows[:, 1][None, :]
                cz = rows[:, 2][None, :]
                if f.has_motion:
                    s = (time - rows[:, 6][None, :]) * rows[:, 7][None, :]
                    cx = cx + s * rows[:, 3][None, :]
                    cy = cy + s * rows[:, 4][None, :]
                    cz = cz + s * rows[:, 5][None, :]
                radius = rows[:, 8][None, :]
                b = ro_d - (cx * rd_x + cy * rd_y + cz * rd_z)
                c = (
                    ro_ro
                    - 2.0 * (cx * ro_x + cy * ro_y + cz * ro_z)
                    + (cx * cx + cy * cy + cz * cz)
                    - radius * radius
                )
                disc = b * b - c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = -b - sq
                t1 = -b + sq
                valid = disc > 0.0
                t0_ok = valid & (t0 > t_min)
                t1_ok = valid & (t1 > t_min)
                t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, _INF))

                tile_min = jnp.min(t, axis=1, keepdims=True)       # [TILE_R,1]
                arg = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
                lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_N), 1)
                one_hot = (lane == arg).astype(jnp.float32)
                attrs = jnp.dot(one_hot, rows, preferred_element_type=jnp.float32)
                better = tile_min < best_t
                best_t = jnp.where(better, tile_min, best_t)
                best_attr = jnp.where(better, attrs, best_attr)
                return best_t, best_attr

            init = (
                jnp.full((TILE_R, 1), _INF, jnp.float32),
                jnp.zeros((TILE_R, K_SPHERE_PAD), jnp.float32),
            )
            return jax.lax.fori_loop(0, ns_tiles, tile_step, init)

        def intersect_rects(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z):
            rows = rect_ref[:, :]                                  # [TILE_N, K]
            axis = rows[:, 0][None, :]
            a0 = rows[:, 1][None, :]
            a1 = rows[:, 2][None, :]
            b0 = rows[:, 3][None, :]
            b1 = rows[:, 4][None, :]
            kk = rows[:, 5][None, :]
            is_x = axis == 0.0
            is_y = axis == 1.0
            o_n = jnp.where(is_x, ro_x, jnp.where(is_y, ro_y, ro_z))
            d_n = jnp.where(is_x, rd_x, jnp.where(is_y, rd_y, rd_z))
            o_a = jnp.where(is_x, ro_y, ro_x)
            d_a = jnp.where(is_x, rd_y, rd_x)
            o_b = jnp.where(axis == 2.0, ro_y, ro_z)
            d_b = jnp.where(axis == 2.0, rd_y, rd_z)
            d_n = jnp.where(jnp.abs(d_n) < 1e-12, 1e-12, d_n)
            t = (kk - o_n) / d_n
            pa = o_a + t * d_a
            pb = o_b + t * d_b
            ok = (
                (t > t_min)
                & (pa >= a0) & (pa <= a1)
                & (pb >= b0) & (pb <= b1)
            )
            t = jnp.where(ok, t, _INF)
            tile_min = jnp.min(t, axis=1, keepdims=True)
            arg = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_N), 1)
            one_hot = (lane == arg).astype(jnp.float32)
            attrs = jnp.dot(one_hot, rows, preferred_element_type=jnp.float32)
            return tile_min, attrs

        def body(depth, state):
            ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, time, \
                th_r, th_g, th_b, ra_r, ra_g, ra_b, alive, segs = state

            sp_t, sp_attr = intersect_spheres(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, time)
            t = sp_t
            # shading attribute views (sphere layout by default)
            sh = sp_attr[:, 9:9 + N_SHADE]
            # geometry: normal from winner sphere
            cx = sp_attr[:, 0:1]
            cy = sp_attr[:, 1:2]
            cz = sp_attr[:, 2:3]
            if f.has_motion:
                s = (time - sp_attr[:, 6:7]) * sp_attr[:, 7:8]
                cx = cx + s * sp_attr[:, 3:4]
                cy = cy + s * sp_attr[:, 4:5]
                cz = cz + s * sp_attr[:, 5:6]
            inv_r = 1.0 / jnp.where(jnp.abs(sp_attr[:, 8:9]) < 1e-12, 1.0, sp_attr[:, 8:9])
            t_safe = jnp.where(t < _INF, t, 0.0)
            px = ro_x + t_safe * rd_x
            py = ro_y + t_safe * rd_y
            pz = ro_z + t_safe * rd_z
            n_x = (px - cx) * inv_r
            n_y = (py - cy) * inv_r
            n_z = (pz - cz) * inv_r

            if has_rects:
                rc_t, rc_attr = intersect_rects(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z)
                rect_wins = rc_t < t
                t = jnp.where(rect_wins, rc_t, t)
                t_safe = jnp.where(t < _INF, t, 0.0)
                px = ro_x + t_safe * rd_x
                py = ro_y + t_safe * rd_y
                pz = ro_z + t_safe * rd_z
                axis = rc_attr[:, 0:1]
                flip = rc_attr[:, 6:7]
                rn_x = jnp.where(axis == 0.0, flip, 0.0)
                rn_y = jnp.where(axis == 1.0, flip, 0.0)
                rn_z = jnp.where(axis == 2.0, flip, 0.0)
                n_x = jnp.where(rect_wins, rn_x, n_x)
                n_y = jnp.where(rect_wins, rn_y, n_y)
                n_z = jnp.where(rect_wins, rn_z, n_z)
                sh = jnp.where(rect_wins, rc_attr[:, 7:7 + N_SHADE], sh)

            hit = t < _INF
            alive_f = alive  # [TILE_R,1] f32 0/1

            # ---- shading attributes
            mat_kind = sh[:, 0:1]
            fuzz = sh[:, 1:2]
            ref_idx = sh[:, 2:3]
            # texture color at p (shading layout cols start at index 9/7 in
            # the original attr row; sh[:, 3] is tex_kind, sh[:, 4:7] color...)
            tex_kind = sh[:, 3:4]
            col = sh[:, 4:7]
            out_col = col
            if f.has_checker:
                sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
                checker = jnp.where(sines < 0.0, sh[:, 7:10], sh[:, 10:13])
                out_col = jnp.where(tex_kind == TEX_CHECKER, checker, out_col)
            if f.has_noise:
                marble = 0.5 * (
                    1.0 + jnp.sin(sh[:, 13:14] * pz + 10.0 * _fast_turb(px, py, pz))
                )
                out_col = jnp.where(tex_kind == TEX_NOISE, marble, out_col)
            tex_r = out_col[:, 0:1]
            tex_g = out_col[:, 1:2]
            tex_b = out_col[:, 2:3]

            # ---- emission + sky
            sky_t = 0.5 * (rd_y + 1.0)
            sk_r = jnp.where(sky_grad > 0.5, (1.0 - sky_t) + sky_t * 0.15, sky_r)
            sk_g = jnp.where(sky_grad > 0.5, (1.0 - sky_t) + sky_t * 0.21, sky_g)
            sk_b = jnp.where(sky_grad > 0.5, (1.0 - sky_t) + sky_t * 0.30, sky_b)
            is_light = mat_kind == float(MAT_DIFFUSE_LIGHT)
            em_r = jnp.where(hit, jnp.where(is_light, tex_r, 0.0), sk_r)
            em_g = jnp.where(hit, jnp.where(is_light, tex_g, 0.0), sk_g)
            em_b = jnp.where(hit, jnp.where(is_light, tex_b, 0.0), sk_b)
            ra_r = ra_r + th_r * em_r * alive_f
            ra_g = ra_g + th_g * em_g * alive_f
            ra_b = ra_b + th_b * em_b * alive_f

            # ---- scatter
            u1 = _counter_uniform(lane, seed_u, depth, 0)
            u2 = _counter_uniform(lane, seed_u, depth, 1)
            u3 = _counter_uniform(lane, seed_u, depth, 2)
            uc = _counter_uniform(lane, seed_u, depth, 3)
            # unit vector sample
            zz = u1 * 2.0 - 1.0
            aa = u2 * TWO_PI
            rr = jnp.sqrt(jnp.maximum(1.0 - zz * zz, 0.0))
            uv_x = rr * jnp.cos(aa)
            uv_y = rr * jnp.sin(aa)
            uv_z = zz

            new_dx = uv_x
            new_dy = uv_y
            new_dz = uv_z
            ok = jnp.ones((TILE_R, 1), jnp.float32)

            rdotn = rd_x * n_x + rd_y * n_y + rd_z * n_z
            refl_x = rd_x - 2.0 * rdotn * n_x
            refl_y = rd_y - 2.0 * rdotn * n_y
            refl_z = rd_z - 2.0 * rdotn * n_z

            if f.has_dielectric:
                exiting = rdotn > 0.0
                on_x = jnp.where(exiting, -n_x, n_x)
                on_y = jnp.where(exiting, -n_y, n_y)
                on_z = jnp.where(exiting, -n_z, n_z)
                ni = jnp.where(exiting, ref_idx, 1.0 / ref_idx)
                cos_in = jnp.where(exiting, rdotn, -rdotn)
                cos_exit_sq = 1.0 - ref_idx * ref_idx * (1.0 - cos_in * cos_in)
                cosine = jnp.where(
                    exiting, jnp.sqrt(jnp.maximum(cos_exit_sq, 0.0)), cos_in
                )
                dt = rd_x * on_x + rd_y * on_y + rd_z * on_z
                disc = 1.0 - ni * ni * (1.0 - dt * dt)
                refr_ok = disc > 0.0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                rf_x = ni * (rd_x - on_x * dt) - on_x * sq
                rf_y = ni * (rd_y - on_y * dt) - on_y * sq
                rf_z = ni * (rd_z - on_z * dt) - on_z * sq
                r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
                r0 = r0 * r0
                omc = 1.0 - cosine
                omc2 = omc * omc
                schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
                reflect_prob = jnp.where(refr_ok, schlick, 1.0)
                take_refr = uc > reflect_prob
                dd_x = jnp.where(take_refr, rf_x, refl_x)
                dd_y = jnp.where(take_refr, rf_y, refl_y)
                dd_z = jnp.where(take_refr, rf_z, refl_z)
                is_diel = mat_kind == float(MAT_DIELECTRIC)
                new_dx = jnp.where(is_diel, dd_x, new_dx)
                new_dy = jnp.where(is_diel, dd_y, new_dy)
                new_dz = jnp.where(is_diel, dd_z, new_dz)

            if f.has_metal:
                # fuzz * uniform-in-ball; cbrt via exp/log (Mosaic-safe)
                rad3 = jnp.exp(jnp.log(jnp.maximum(u3, 1e-30)) * (1.0 / 3.0))
                mm_x = refl_x + fuzz * rad3 * uv_x
                mm_y = refl_y + fuzz * rad3 * uv_y
                mm_z = refl_z + fuzz * rad3 * uv_z
                refl_dot_n = refl_x * n_x + refl_y * n_y + refl_z * n_z
                is_metal = mat_kind == float(MAT_METAL)
                new_dx = jnp.where(is_metal, mm_x, new_dx)
                new_dy = jnp.where(is_metal, mm_y, new_dy)
                new_dz = jnp.where(is_metal, mm_z, new_dz)
                ok = jnp.where(
                    is_metal, (refl_dot_n > 0.0).astype(jnp.float32), ok
                )

            if f.has_lambertian:
                is_lam = mat_kind == float(MAT_LAMBERTIAN)
                new_dx = jnp.where(is_lam, n_x + uv_x, new_dx)
                new_dy = jnp.where(is_lam, n_y + uv_y, new_dy)
                new_dz = jnp.where(is_lam, n_z + uv_z, new_dz)

            if f.has_light:
                ok = jnp.where(is_light, 0.0, ok)

            inv_len = jax.lax.rsqrt(
                jnp.maximum(new_dx * new_dx + new_dy * new_dy + new_dz * new_dz, 1e-38)
            )
            new_dx = new_dx * inv_len
            new_dy = new_dy * inv_len
            new_dz = new_dz * inv_len

            is_diel_att = (
                (mat_kind == float(MAT_DIELECTRIC)) if f.has_dielectric else
                jnp.zeros((TILE_R, 1), bool)
            )
            at_r = jnp.where(is_diel_att, 1.0, tex_r)
            at_g = jnp.where(is_diel_att, 1.0, tex_g)
            at_b = jnp.where(is_diel_att, 1.0, tex_b)

            can = alive_f * hit.astype(jnp.float32) * ok
            th_r = jnp.where(can > 0.5, th_r * at_r, th_r)
            th_g = jnp.where(can > 0.5, th_g * at_g, th_g)
            th_b = jnp.where(can > 0.5, th_b * at_b, th_b)
            ro_x = jnp.where(can > 0.5, px, ro_x)
            ro_y = jnp.where(can > 0.5, py, ro_y)
            ro_z = jnp.where(can > 0.5, pz, ro_z)
            rd_x = jnp.where(can > 0.5, new_dx, rd_x)
            rd_y = jnp.where(can > 0.5, new_dy, rd_y)
            rd_z = jnp.where(can > 0.5, new_dz, rd_z)
            segs = segs + jnp.sum(alive_f)
            return (ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, time,
                    th_r, th_g, th_b, ra_r, ra_g, ra_b, can, segs)

        def loop_body(state):
            depth = state[0]
            rest = body(depth, state[1:])
            return (depth + 1,) + rest

        def loop_cond(state):
            depth = state[0]
            alive = state[14]
            last_scatter_allowed = depth <= max_depth
            return last_scatter_allowed & (jnp.sum(alive) > 0.0)

        ones = jnp.ones((TILE_R, 1), jnp.float32)
        zeros = jnp.zeros((TILE_R, 1), jnp.float32)
        init = (
            jnp.int32(0),
            ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], tm[:],
            ones, ones, ones,       # throughput
            zeros, zeros, zeros,    # radiance
            ones,                   # alive
            jnp.float32(0.0),       # block segment count (scalar carry)
        )
        final = jax.lax.while_loop(loop_cond, loop_body, init)
        ra_r, ra_g, ra_b = final[11], final[12], final[13]
        # note: rays that survive max_depth scatters terminate with their
        # accumulated radiance (matching the reference: the deepest call
        # returns emitted only, which the loop added in its final iteration)
        rad_out[:, 0:1] = ra_r
        rad_out[:, 1:2] = ra_g
        rad_out[:, 2:3] = ra_b
        # block segment total, spread across lanes so a plain sum over the
        # full (unsliced) output recovers it exactly
        rad_out[:, 3:4] = jnp.full((TILE_R, 1), final[15] * (1.0 / TILE_R))

    return kernel


MK_CHUNK = 1 << 17  # rays per pallas launch (VMEM operand budget)


@functools.partial(
    jax.jit, static_argnames=("max_depth", "features", "ns_tiles")
)
def _trace_chunk(
    chunk_cols,       # tuple of 7 [C, 1] ray columns
    lane_offset,      # int32 scalar
    seed,             # int32 scalar
    sph_table,
    rect_table,
    sky_arr,
    max_depth: int,
    features: SceneFeatures,
    ns_tiles: int,
):
    C = chunk_cols[0].shape[0]
    kernel = _make_kernel(ns_tiles, max_depth, features)
    grid = (C // TILE_R,)
    ray_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    seed_arr = jnp.stack(
        [jnp.asarray(seed, jnp.int32), jnp.asarray(lane_offset, jnp.int32)]
    ).reshape(1, 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *([ray_spec] * 7),
            pl.BlockSpec(
                (sph_table.shape[0], K_SPHERE_PAD), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_N, K_RECT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((TILE_R, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 4), jnp.float32),
        # off-TPU: the TPU-semantics interpreter (supports pltpu.prng_*)
        interpret=(
            pltpu.InterpretParams() if jax.default_backend() != "tpu" else False
        ),
    )(seed_arr, sky_arr, *chunk_cols, sph_table, rect_table)


@functools.partial(jax.jit, static_argnames=("max_depth", "features"))
def _prep_tables(scene, max_depth: int, features: SceneFeatures):
    sky_arr = jnp.concatenate(
        [scene.sky.reshape(3), scene.use_gradient_sky.reshape(1)]
    ).astype(jnp.float32).reshape(1, 4)
    return build_sphere_table(scene), build_rect_table(scene), sky_arr


def trace_megakernel(
    scene: Scene,
    ro,
    rd,
    time,
    seed,
    max_depth: int,
    features: SceneFeatures,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace a wavefront entirely inside the megakernel.

    ``seed``: int32 scalar (frame-unique). Returns (radiance [R,3], ray_count).

    Launches are chunked from the host (``MK_CHUNK`` rays per pallas_call):
    the axon AOT pipeline allocates every pallas operand/result in scoped
    VMEM, so per-launch footprints must stay well under the 16 MB limit, and
    fusing the chunk loop into one XLA while (lax.map) re-aggregates the
    buffers — a plain Python dispatch loop keeps them bounded. Dispatches
    pipeline asynchronously, so the loop overhead overlaps compute.
    """
    assert megakernel_supported(features), "unsupported scene for megakernel"
    R = ro.shape[0]
    C = min(MK_CHUNK, ((R + TILE_R - 1) // TILE_R) * TILE_R)
    Rp = ((R + C - 1) // C) * C

    sph_table, rect_table, sky_arr = _prep_tables(scene, max_depth, features)
    ns_tiles = sph_table.shape[0] // TILE_N

    def pad_col(x, fill=0.0):
        col = x[:, None] if x.ndim == 1 else x
        if Rp != R:
            col = jnp.concatenate(
                [col, jnp.full((Rp - R, col.shape[1]), fill, col.dtype)], axis=0
            )
        return col

    # padded lanes: origin far outside every primitive with a zero direction
    # -> guaranteed miss, exactly one traced segment each (corrected below)
    cols = [
        pad_col(ro[:, 0], 1.0e17), pad_col(ro[:, 1], 1.0e17), pad_col(ro[:, 2], 1.0e17),
        pad_col(rd[:, 0]), pad_col(rd[:, 1]), pad_col(rd[:, 2]),
        pad_col(time),
    ]
    n_chunks = Rp // C
    outs = []
    for ci in range(n_chunks):
        chunk_cols = tuple(c[ci * C:(ci + 1) * C] for c in cols)
        outs.append(
            _trace_chunk(
                chunk_cols, ci * C, seed, sph_table, rect_table, sky_arr,
                max_depth, features, ns_tiles,
            )
        )
    rad = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=0)

    # padded lanes (far origin, zero direction) miss everything and die
    # after exactly one segment each — subtract them from the block totals
    ray_count = jnp.round(jnp.sum(rad[:, 3])).astype(jnp.int32) - (Rp - R)
    return rad[:R, :3], ray_count
