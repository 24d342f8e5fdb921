"""Pallas TPU sphere-intersection megakernel.

The TPU re-design of the reference's hand-written SIMD SoA kernel
(reference ``src/collision/spheres_soa.rs:274-391`` AVX2 path): where the CPU
broadcasts ONE ray across 8 sphere lanes, the TPU broadcasts a BLOCK of rays
(sublanes) against a TILE of spheres (lanes) on the 8x128 VPU — a
``[TILE_R x TILE_N]`` quadratic per step with a running masked (t, index)
min, exactly the vectorized analog of the AVX2 ``blend + hmin + cttz``
epilogue (``spheres_soa.rs:354-368``).

Layout: rays live in LANES as ``(1, TILE_R)`` rows of an ``[R/512, 512]``
plane (contiguous reshape of the wavefront plane — tiles HBM with no
padding); sphere SoA components are ``[N, 1]`` sublane columns, one
``(TILE_N, 1)`` tile per grid step. The pairwise quadratic is a
``[TILE_N, TILE_R]`` broadcast and the per-ray winner a sublane
min/argmin. Grid = (ray blocks, sphere tiles) with the tile axis minor:
the output block is revisited across tiles and carries the running min.
(The original orientation — rays in sublanes as ``[R, 1]`` columns — made
XLA materialize every ray operand 128x padded in T(8,128) tiling: 2 GB
per operand at 4M rays, an HBM OOM past 3.7M and the source of the
apparent wavefront-size nonlinearity; tools/size_curve.py.)

Assumes unit-length ray directions (the integrator maintains |d| == 1
wavefront-wide), so the quadratic's ``a`` term is 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.config import MAX_T, MIN_T
from pathtrace_tpu.models.types import Spheres

_INF = float(MAX_T)  # python float: jnp scalars would be captured as consts
                     # by pallas kernel tracing

TILE_R = 512   # rays per lane row (the pairwise tile's lane extent)
TILE_N = 128   # spheres per tile (sublane axis of the pairwise tile)
SUB_B = 8      # ray rows per block: Mosaic requires sublane block dims
               # divisible by 8, so a grid step carries SUB_B x TILE_R rays
               # and sweeps them as SUB_B unrolled (TILE_N, TILE_R) tiles
BLOCK_R = SUB_B * TILE_R  # rays per grid step (4096)


def _kernel_static(
    rox, roy, roz, rdx, rdy, rdz,
    cx, cy, cz, cc_m_r2, mask,
    t_out, i_out,
    *, t_min: float, t_max: float,
):
    """Static-sphere kernel body (one sphere TILE per grid step).

    Rays ride the LANE axis as (SUB_B, TILE_R) row blocks, spheres the
    SUBLANE axis as (TILE_N, 1) columns; each of the SUB_B ray rows is
    swept as a [TILE_N, TILE_R] pairwise quadratic tile (unrolled python
    loop) and the per-ray winner is a sublane min/argmin. Grid =
    (ray blocks, sphere tiles) with the tile axis minor: the output block
    is revisited across tiles and accumulates the running (t, idx) min.
    This orientation keeps every HBM operand UNPADDED — the previous
    [R, 1] ray columns were materialized by XLA in T(8,128) tiling, a
    128x padding (2 GB per operand at 4M rays, OOM at 3.7M+;
    tools/size_curve.py found it as the wavefront-size nonlinearity).
    """
    k = pl.program_id(1)
    ro_x, ro_y, ro_z = rox[:], roy[:], roz[:]            # (SUB_B, TILE_R)
    rd_x, rd_y, rd_z = rdx[:], rdy[:], rdz[:]
    ro_d = ro_x * rd_x + ro_y * rd_y + ro_z * rd_z       # (SUB_B, TILE_R)
    ro_ro = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z

    scx, scy, scz = cx[:], cy[:], cz[:]                  # (TILE_N, 1)
    sc2 = cc_m_r2[:]
    smask = mask[:] > 0

    @pl.when(k == 0)
    def _():
        t_out[:] = jnp.full((SUB_B, TILE_R), _INF, jnp.float32)
        i_out[:] = jnp.zeros((SUB_B, TILE_R), jnp.int32)

    mins, args = [], []
    for j in range(SUB_B):
        sj = slice(j, j + 1)
        b = ro_d[sj] - (scx * rd_x[sj] + scy * rd_y[sj] + scz * rd_z[sj])
        c = (ro_ro[sj]
             - 2.0 * (scx * ro_x[sj] + scy * ro_y[sj] + scz * ro_z[sj])
             + sc2)                                      # (TILE_N, TILE_R)
        disc = b * b - c
        valid = (disc > 0.0) & smask
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t0_ok = valid & (t0 > t_min) & (t0 < t_max)
        t1_ok = valid & (t1 > t_min) & (t1 < t_max)
        t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, _INF))

        mins.append(jnp.min(t, axis=0, keepdims=True))   # (1, TILE_R)
        args.append(jnp.argmin(t, axis=0).astype(jnp.int32)[None, :])

    tile_min = jnp.concatenate(mins, axis=0)             # (SUB_B, TILE_R)
    tile_arg = jnp.concatenate(args, axis=0)
    cur_t = t_out[:]
    better = tile_min < cur_t
    t_out[:] = jnp.where(better, tile_min, cur_t)
    i_out[:] = jnp.where(better, k * TILE_N + tile_arg, i_out[:])


def _kernel_static_culled(
    rox, roy, roz, rdx, rdy, rdz,
    cx, cy, cz, cc_m_r2, mask,
    tlx, tly, tlz, thx, thy, thz,
    t_out, i_out,
    *, t_min: float, t_max: float,
):
    """Static kernel with per-tile AABB culling — the in-kernel BVH level.

    Each 128-sphere tile carries a conservative AABB (SMEM scalars). Before
    running a tile's [TILE_N x TILE_R] quadratic sweep, every ray slab-tests
    the tile box against its RUNNING best t; if no ray in the block can
    improve inside the box, the whole tile body is skipped via ``pl.when``
    (a real scf.if — the VPU work never issues). This is the TPU analog of
    a 2-level BVH: node tests are per-(ray-block x tile) and amortize over
    TILE_R * TILE_N lane-ops of skipped leaf work. Skips are conservative
    (sphere ⊆ tile box, eps-padded at build), so results are bit-identical
    to :func:`_kernel_static`. Same rays-in-lanes layout and accumulating
    output blocks as :func:`_kernel_static`; the running best lives in the
    revisited output block.
    """
    k = pl.program_id(1)
    ro_x, ro_y, ro_z = rox[:], roy[:], roz[:]            # (SUB_B, TILE_R)
    rd_x, rd_y, rd_z = rdx[:], rdy[:], rdz[:]
    ro_d = ro_x * rd_x + ro_y * rd_y + ro_z * rd_z
    ro_ro = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z

    # conservative reciprocal directions: |d| ~ 0 handled by interval logic
    eps = 1e-12
    big = 1e30
    inv_x = jnp.where(jnp.abs(rd_x) > eps, 1.0 / rd_x, big)
    inv_y = jnp.where(jnp.abs(rd_y) > eps, 1.0 / rd_y, big)
    inv_z = jnp.where(jnp.abs(rd_z) > eps, 1.0 / rd_z, big)
    par_x = jnp.abs(rd_x) <= eps
    par_y = jnp.abs(rd_y) <= eps
    par_z = jnp.abs(rd_z) <= eps

    @pl.when(k == 0)
    def _():
        t_out[:] = jnp.full((SUB_B, TILE_R), _INF, jnp.float32)
        i_out[:] = jnp.zeros((SUB_B, TILE_R), jnp.int32)

    def axis_interval(lo, hi, o, inv, par):
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        tn = jnp.minimum(t0, t1)
        tx = jnp.maximum(t0, t1)
        # axis-parallel ray: inside the slab -> whole line; outside -> empty
        inside = (o >= lo) & (o <= hi)
        tn = jnp.where(par, jnp.where(inside, -big, big), tn)
        tx = jnp.where(par, jnp.where(inside, big, -big), tx)
        return tn, tx

    lox, loy, loz = tlx[k], tly[k], tlz[k]
    hix, hiy, hiz = thx[k], thy[k], thz[k]
    tnx, txx = axis_interval(lox, hix, ro_x, inv_x, par_x)
    tny, txy = axis_interval(loy, hiy, ro_y, inv_y, par_y)
    tnz, txz = axis_interval(loz, hiz, ro_z, inv_z, par_z)
    tenter = jnp.maximum(jnp.maximum(tnx, tny), tnz)   # (SUB_B, TILE_R)
    texit = jnp.minimum(jnp.minimum(txx, txy), txz)
    cur = t_out[:]
    want = (
        (texit >= tenter) & (texit > t_min)
        & (tenter < jnp.minimum(cur, t_max))
    )
    # skip decisions per SUB_B ROW (512 rays), not the whole 4096-ray
    # block: a coherent row skips a tile even when a divergent sibling row
    # in the same block wants it. (Padded tail lanes ride with ro = 1e30 —
    # set by the caller for the cull variant only — so their slab interval
    # is empty and they never force a row's sweep.)
    wantf = want.astype(jnp.float32)
    scx, scy, scz = cx[:], cy[:], cz[:]                  # (TILE_N, 1)
    sc2 = cc_m_r2[:]
    smask = mask[:] > 0

    for j in range(SUB_B):
        row_want = jnp.sum(wantf[j]) > 0.0

        @pl.when(row_want)
        def _(j=j):
            sj = slice(j, j + 1)
            b = ro_d[sj] - (scx * rd_x[sj] + scy * rd_y[sj] + scz * rd_z[sj])
            c = (ro_ro[sj]
                 - 2.0 * (scx * ro_x[sj] + scy * ro_y[sj] + scz * ro_z[sj])
                 + sc2)
            disc = b * b - c
            valid = (disc > 0.0) & smask
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -b - sq
            t1 = -b + sq
            t0_ok = valid & (t0 > t_min) & (t0 < t_max)
            t1_ok = valid & (t1 > t_min) & (t1 < t_max)
            t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, _INF))
            row_min = jnp.min(t, axis=0, keepdims=True)  # (1, TILE_R)
            row_arg = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
            cur_t = t_out[sj]
            better = row_min < cur_t
            t_out[sj] = jnp.where(better, row_min, cur_t)
            i_out[sj] = jnp.where(better, k * TILE_N + row_arg, i_out[sj])


def _kernel_static_culled2(
    rox, roy, roz, rdx, rdy, rdz,
    cx, cy, cz, cc_m_r2, mask,
    slx, sly, slz, shx, shy, shz,
    tlx, tly, tlz, thx, thy, thz,
    t_out, i_out,
    super_ok,
    *, t_min: float, t_max: float, s_tiles: int,
):
    """Two-level hierarchical tile cull — the scene-scale answer.

    The flat cull (:func:`_kernel_static_culled`) slab-tests EVERY
    128-sphere tile box per ray block: linear in tile count, and the r4
    crossover table shows it decaying ~linearly (4.23 -> 2.56 -> 1.20
    Mrays/s from 16k -> 65k -> 262k spheres). This kernel adds a coarse
    level: the grid becomes (ray blocks, supertiles, member tiles); at
    member step 0 the block slab-tests the SUPERTILE box (the union of
    ``s_tiles`` member tile boxes) once and caches the verdict in SMEM
    scratch (scratch persists across the sequential grid); every member
    step gates its whole body — tile box test AND sweep — on that bit. A
    block that prunes a supertile pays ONE slab test for ``s_tiles``
    tiles, dropping the cull machinery's slope by ``s_tiles``. This is
    the in-kernel re-design of the reference BVH's log-scaling purpose
    (``src/collision/bvh.rs:37-62``) in the shape this device rewards:
    dense per-block box tests on the VPU instead of per-ray pointer
    chases. Results are bit-identical to the brute kernel (skips are
    conservative: sphere ⊆ tile box ⊆ supertile box, eps-padded).

    Two designs measured and rejected on the way here (r5, TPU A/B at
    16k/65k spheres): per-ROW (1, TILE_R) slab tests use 1/8 of the VPU
    sublanes (1.7x slower end-to-end), and fetching the whole supertile
    as ONE (s_tiles*TILE_N, 1) column block explodes VMEM 128x (the
    [N, 1] lane-padding trap) — hence the 3D grid keeping flat's
    (TILE_N, 1) blocks.
    """
    ks = pl.program_id(1)
    km = pl.program_id(2)
    ro_x, ro_y, ro_z = rox[:], roy[:], roz[:]            # (SUB_B, TILE_R)
    rd_x, rd_y, rd_z = rdx[:], rdy[:], rdz[:]
    ro_d = ro_x * rd_x + ro_y * rd_y + ro_z * rd_z
    ro_ro = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z

    eps = 1e-12
    big = 1e30
    inv_x = jnp.where(jnp.abs(rd_x) > eps, 1.0 / rd_x, big)
    inv_y = jnp.where(jnp.abs(rd_y) > eps, 1.0 / rd_y, big)
    inv_z = jnp.where(jnp.abs(rd_z) > eps, 1.0 / rd_z, big)
    par_x = jnp.abs(rd_x) <= eps
    par_y = jnp.abs(rd_y) <= eps
    par_z = jnp.abs(rd_z) <= eps

    @pl.when((ks == 0) & (km == 0))
    def _():
        t_out[:] = jnp.full((SUB_B, TILE_R), _INF, jnp.float32)
        i_out[:] = jnp.zeros((SUB_B, TILE_R), jnp.int32)

    def axis_interval(lo, hi, o, inv, par):
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        tn = jnp.minimum(t0, t1)
        tx = jnp.maximum(t0, t1)
        inside = (o >= lo) & (o <= hi)
        tn = jnp.where(par, jnp.where(inside, -big, big), tn)
        tx = jnp.where(par, jnp.where(inside, big, -big), tx)
        return tn, tx

    def box_want_block(lo3, hi3, cur):
        """Slab interval vs running best, full (SUB_B, TILE_R) block."""
        tnx, txx = axis_interval(lo3[0], hi3[0], ro_x, inv_x, par_x)
        tny, txy = axis_interval(lo3[1], hi3[1], ro_y, inv_y, par_y)
        tnz, txz = axis_interval(lo3[2], hi3[2], ro_z, inv_z, par_z)
        tenter = jnp.maximum(jnp.maximum(tnx, tny), tnz)
        texit = jnp.minimum(jnp.minimum(txx, txy), txz)
        return (
            (texit >= tenter) & (texit > t_min)
            & (tenter < jnp.minimum(cur, t_max))
        )

    @pl.when(km == 0)
    def _():
        sw = box_want_block(
            (slx[ks], sly[ks], slz[ks]), (shx[ks], shy[ks], shz[ks]),
            t_out[:],
        )
        super_ok[0, 0] = jnp.sum(sw.astype(jnp.float32)).astype(jnp.int32)

    @pl.when(super_ok[0, 0] > 0)
    def _():
        tile_id = ks * s_tiles + km
        scx, scy, scz = cx[:], cy[:], cz[:]              # (TILE_N, 1)
        sc2 = cc_m_r2[:]
        smask = mask[:] > 0
        cur = t_out[:]
        want = box_want_block(
            (tlx[tile_id], tly[tile_id], tlz[tile_id]),
            (thx[tile_id], thy[tile_id], thz[tile_id]), cur,
        )
        wantf = want.astype(jnp.float32)
        for j in range(SUB_B):
            row_want = jnp.sum(wantf[j]) > 0.0

            @pl.when(row_want)
            def _(j=j, tile_id=tile_id):
                sj = slice(j, j + 1)
                b = ro_d[sj] - (scx * rd_x[sj] + scy * rd_y[sj]
                                + scz * rd_z[sj])
                c = (ro_ro[sj]
                     - 2.0 * (scx * ro_x[sj] + scy * ro_y[sj]
                              + scz * ro_z[sj])
                     + sc2)
                disc = b * b - c
                valid = (disc > 0.0) & smask
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = -b - sq
                t1 = -b + sq
                t0_ok = valid & (t0 > t_min) & (t0 < t_max)
                t1_ok = valid & (t1 > t_min) & (t1 < t_max)
                t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, _INF))
                row_min = jnp.min(t, axis=0, keepdims=True)
                row_arg = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
                cur_r = t_out[sj]
                better = row_min < cur_r
                t_out[sj] = jnp.where(better, row_min, cur_r)
                i_out[sj] = jnp.where(
                    better, tile_id * TILE_N + row_arg, i_out[sj]
                )


def _kernel_moving(
    rox, roy, roz, rdx, rdy, rdz, rtime,
    cx, cy, cz, cc_m_r2, mask,
    dx, dy, dz, st0, sinvdt, c_dot_d, d2,
    t_out, i_out,
    *, t_min: float, t_max: float,
):
    """Moving-sphere kernel: center lerped by per-ray time
    (reference src/collision/moving_sphere.rs:28-30).

    c_eff = c0 + s*delta with s = (time - t0)*inv_dt, expanded so the
    per-pair terms reuse the static precomputations:
      b     = ro.d - c0.d - s*(delta.d)
      cterm = |ro|^2 - 2 ro.c0 + (|c0|^2 - r^2) - 2 s (ro.delta)
              + 2 s (c0.delta) + s^2 |delta|^2
    Same rays-in-lanes layout and grid as :func:`_kernel_static`.
    """
    k = pl.program_id(1)
    ro_x, ro_y, ro_z = rox[:], roy[:], roz[:]            # (SUB_B, TILE_R)
    rd_x, rd_y, rd_z = rdx[:], rdy[:], rdz[:]
    tm = rtime[:]
    ro_d = ro_x * rd_x + ro_y * rd_y + ro_z * rd_z
    ro_ro = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z

    scx, scy, scz = cx[:], cy[:], cz[:]                  # (TILE_N, 1)
    sc2 = cc_m_r2[:]
    smask = mask[:] > 0
    sdx, sdy, sdz = dx[:], dy[:], dz[:]
    t0s = st0[:]
    invdt = sinvdt[:]
    cdd = c_dot_d[:]
    sd2 = d2[:]

    @pl.when(k == 0)
    def _():
        t_out[:] = jnp.full((SUB_B, TILE_R), _INF, jnp.float32)
        i_out[:] = jnp.zeros((SUB_B, TILE_R), jnp.int32)

    mins, args = [], []
    for j in range(SUB_B):
        sj = slice(j, j + 1)
        s = (tm[sj] - t0s) * invdt                       # (TILE_N, TILE_R)
        delta_dot_rd = sdx * rd_x[sj] + sdy * rd_y[sj] + sdz * rd_z[sj]
        delta_dot_ro = sdx * ro_x[sj] + sdy * ro_y[sj] + sdz * ro_z[sj]
        b = (ro_d[sj] - (scx * rd_x[sj] + scy * rd_y[sj] + scz * rd_z[sj])
             - s * delta_dot_rd)
        c = (
            ro_ro[sj]
            - 2.0 * (scx * ro_x[sj] + scy * ro_y[sj] + scz * ro_z[sj])
            + sc2
            - 2.0 * s * delta_dot_ro
            + 2.0 * s * cdd
            + s * s * sd2
        )
        disc = b * b - c
        valid = (disc > 0.0) & smask
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t0_ok = valid & (t0 > t_min) & (t0 < t_max)
        t1_ok = valid & (t1 > t_min) & (t1 < t_max)
        t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, _INF))
        mins.append(jnp.min(t, axis=0, keepdims=True))
        args.append(jnp.argmin(t, axis=0).astype(jnp.int32)[None, :])

    tile_min = jnp.concatenate(mins, axis=0)             # (SUB_B, TILE_R)
    tile_arg = jnp.concatenate(args, axis=0)
    cur_t = t_out[:]
    better = tile_min < cur_t
    t_out[:] = jnp.where(better, tile_min, cur_t)
    i_out[:] = jnp.where(better, k * TILE_N + tile_arg, i_out[:])


def _pad_rays(x, rp, fill=0.0):
    r = x.shape[0]
    if rp == r:
        return x
    return jnp.concatenate(
        [x, jnp.full((rp - r,) + x.shape[1:], fill, x.dtype)], axis=0
    )


SUPER_TILES = 16  # member tiles per supertile in the hierarchical cull


@functools.partial(
    jax.jit,
    static_argnames=("has_motion", "t_min", "t_max", "cull", "s_tiles"),
)
def sphere_nearest_pallas_cols(spheres: Spheres, rox, roy, roz, rdx, rdy, rdz,
                               time, t_min=MIN_T, t_max=MAX_T,
                               has_motion: bool = True, cull=False,
                               s_tiles: int = SUPER_TILES):
    """Column-plane entry: same kernel, ray components as six [R] arrays.

    Used by the fused fast path, whose wavefront state lives in lane-packed
    planes — skips the [R, 3] column extracts of the array entry (the values
    are identical either way). ``cull`` (static scenes only) enables the
    in-kernel AABB cull — bit-identical results: ``"flat"`` = per-tile
    boxes only; ``"hier"`` = two-level supertile hierarchy (``s_tiles``
    member tiles per coarse box); ``True`` = hier when the scene has
    enough tiles to amortize a coarse level, flat otherwise."""
    if cull is True:
        n_tiles = (spheres.center.shape[0] + TILE_N - 1) // TILE_N
        if n_tiles > 1024:
            # r5 sweep at 262k spheres (2048 tiles): s32 2.45 / s16 2.36 /
            # s64 2.23 Mrays/s vs flat 1.35; at 65k (512 tiles) s16 wins
            # (4.54 vs s32 3.1). Bigger scenes amortize a coarser level.
            s_tiles = max(s_tiles, 32)
        cull = "hier" if n_tiles >= 2 * s_tiles else "flat"
    return _sphere_nearest_call(
        spheres, [rox, roy, roz, rdx, rdy, rdz], time,
        float(t_min), float(t_max), bool(has_motion), cull=cull,
        s_tiles=int(s_tiles),
    )


@functools.partial(jax.jit, static_argnames=("has_motion", "t_min", "t_max"))
def _sphere_nearest_pallas_impl(spheres: Spheres, ro, rd, time, t_min, t_max, has_motion):
    planes = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]]
    return _sphere_nearest_call(spheres, planes, time, t_min, t_max, has_motion)


def _sphere_nearest_call(spheres: Spheres, ray_planes, time, t_min, t_max,
                         has_motion, cull=False, s_tiles: int = SUPER_TILES):
    R = ray_planes[0].shape[0]
    N = spheres.center.shape[0]
    hier = cull == "hier" and not has_motion
    tile_mult = TILE_N * (s_tiles if hier else 1)
    n_pad = ((N + tile_mult - 1) // tile_mult) * tile_mult
    n_tiles = n_pad // TILE_N
    Rp = ((R + BLOCK_R - 1) // BLOCK_R) * BLOCK_R
    rb = Rp // TILE_R
    # grid: (ray blocks, sphere tiles), tile axis MINOR — the out block is
    # revisited across tiles and carries the running (t, idx) min. The
    # hier cull splits the tile axis into (supertiles, member tiles).
    if hier:
        grid = (rb // SUB_B, n_tiles // s_tiles, s_tiles)
    else:
        grid = (rb // SUB_B, n_tiles)
    cull = bool(cull) and not has_motion and n_tiles > 1

    def pad_n(x, fill=0.0):
        # sphere SoA as [n_pad, 1] COLUMNS (sublane axis) — tiny arrays,
        # the T(8,128) padding is n_pad*512B of HBM, nothing like the old
        # [R, 1] ray columns (2 GB/operand at 4M rays)
        if x.shape[0] != n_pad:
            pad = jnp.full((n_pad - x.shape[0],), fill, jnp.float32)
            x = jnp.concatenate([x.astype(jnp.float32), pad])
        return x.astype(jnp.float32)[:, None]

    cx = pad_n(spheres.center[:, 0], 1.0e18)
    cy = pad_n(spheres.center[:, 1], 1.0e18)
    cz = pad_n(spheres.center[:, 2], 1.0e18)
    r2 = spheres.radius * spheres.radius
    cc_m_r2 = pad_n(
        jnp.sum(spheres.center * spheres.center, axis=-1) - r2, 1.0e30
    )
    mask = pad_n(spheres.mask.astype(jnp.float32), 0.0)

    # ray planes as [rb, TILE_R] row matrices: contiguous reshape that
    # tiles HBM/VMEM with NO padding. The block index map ignores the
    # tile axis, so Mosaic keeps the ray block resident across the whole
    # sphere sweep. Cull variant: padded tail lanes get ro = 1e30 (empty
    # slab interval) so they never force a row's tile sweep; rd stays 0.
    # (Padded lanes' outputs are sliced off either way.)
    ro_fill = 1.0e30 if cull else 0.0
    ray_rows = [
        _pad_rays(c, Rp, fill=(ro_fill if i < 3 else 0.0)).reshape(rb, TILE_R)
        for i, c in enumerate(ray_planes)
    ]

    ray_spec = pl.BlockSpec((SUB_B, TILE_R), lambda i, k: (i, 0),
                            memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((TILE_N, 1), lambda i, k: (k, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUB_B, TILE_R), lambda i, k: (i, 0),
                            memory_space=pltpu.VMEM)
    if cull:
        # per-tile conservative AABBs (masked min/max over each 128-sphere
        # tile; hollow spheres have negative radius -> use |r|), eps-padded.
        # Empty (fully padded) tiles get an inverted box and always cull.
        r_abs = jnp.abs(spheres.radius).astype(jnp.float32)

        def tile_lo(c):
            v = jnp.where(spheres.mask, c.astype(jnp.float32) - r_abs, _INF)
            v = jnp.concatenate([v, jnp.full((n_pad - N,), _INF, jnp.float32)]) \
                if n_pad != N else v
            return v.reshape(n_tiles, TILE_N).min(axis=1) - 1e-3

        def tile_hi(c):
            v = jnp.where(spheres.mask, c.astype(jnp.float32) + r_abs, -_INF)
            v = jnp.concatenate([v, jnp.full((n_pad - N,), -_INF, jnp.float32)]) \
                if n_pad != N else v
            return v.reshape(n_tiles, TILE_N).max(axis=1) + 1e-3

        tlx = tile_lo(spheres.center[:, 0])
        tly = tile_lo(spheres.center[:, 1])
        tlz = tile_lo(spheres.center[:, 2])
        thx = tile_hi(spheres.center[:, 0])
        thy = tile_hi(spheres.center[:, 1])
        thz = tile_hi(spheres.center[:, 2])
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        if hier:
            # coarse level: supertile boxes = union of member tile boxes
            def sup(lo_or_hi, fn):
                return fn(lo_or_hi.reshape(-1, s_tiles), axis=1)

            slx, sly, slz = (sup(v, jnp.min) for v in (tlx, tly, tlz))
            shx_, shy_, shz_ = (sup(v, jnp.max) for v in (thx, thy, thz))
            ray_spec3 = pl.BlockSpec((SUB_B, TILE_R),
                                     lambda i, ks, km: (i, 0),
                                     memory_space=pltpu.VMEM)
            sph_spec3 = pl.BlockSpec(
                (TILE_N, 1), lambda i, ks, km: (ks * s_tiles + km, 0),
                memory_space=pltpu.VMEM,
            )
            smem_spec3 = pl.BlockSpec(memory_space=pltpu.SMEM)
            kernel = functools.partial(
                _kernel_static_culled2,
                t_min=float(t_min), t_max=float(t_max),
                s_tiles=int(s_tiles),
            )
            in_specs = [ray_spec3] * 6 + [sph_spec3] * 5 + [smem_spec3] * 12
            args = ray_rows + [cx, cy, cz, cc_m_r2, mask,
                               slx, sly, slz, shx_, shy_, shz_,
                               tlx, tly, tlz, thx, thy, thz]
        else:
            kernel = functools.partial(
                _kernel_static_culled,
                t_min=float(t_min), t_max=float(t_max),
            )
            in_specs = [ray_spec] * 6 + [sph_spec] * 5 + [smem_spec] * 6
            args = ray_rows + [cx, cy, cz, cc_m_r2, mask,
                               tlx, tly, tlz, thx, thy, thz]
    elif not has_motion:
        kernel = functools.partial(
            _kernel_static, t_min=float(t_min), t_max=float(t_max)
        )
        in_specs = [ray_spec] * 6 + [sph_spec] * 5
        args = ray_rows + [cx, cy, cz, cc_m_r2, mask]
    else:
        dx = pad_n(spheres.center_delta[:, 0])
        dy = pad_n(spheres.center_delta[:, 1])
        dz = pad_n(spheres.center_delta[:, 2])
        st0 = pad_n(spheres.time0)
        sinvdt = pad_n(spheres.inv_time_delta)
        c_dot_d = pad_n(jnp.sum(spheres.center * spheres.center_delta, axis=-1))
        d2 = pad_n(jnp.sum(spheres.center_delta * spheres.center_delta, axis=-1))
        kernel = functools.partial(
            _kernel_moving, t_min=float(t_min), t_max=float(t_max)
        )
        in_specs = [ray_spec] * 7 + [sph_spec] * 12
        args = (
            ray_rows + [_pad_rays(time, Rp).reshape(rb, TILE_R)]
            + [cx, cy, cz, cc_m_r2, mask, dx, dy, dz, st0, sinvdt, c_dot_d, d2]
        )

    if hier:
        out_spec = pl.BlockSpec((SUB_B, TILE_R), lambda i, ks, km: (i, 0),
                                memory_space=pltpu.VMEM)
        scratch = [pltpu.SMEM((1, 1), jnp.int32)]
    else:
        scratch = []
    t_out, i_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rb, TILE_R), jnp.float32),
            jax.ShapeDtypeStruct((rb, TILE_R), jnp.int32),
        ),
        scratch_shapes=scratch,
        # interpreter mode off-TPU so the kernel is testable on the CPU suite
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=Rp * n_pad * (30 if has_motion else 15),
            bytes_accessed=Rp * 4 * 8 + n_pad * 4 * (12 if has_motion else 5),
            transcendentals=Rp * n_pad,
        ),
    )(*args)
    return t_out.reshape(Rp)[:R], i_out.reshape(Rp)[:R]


def sphere_nearest_pallas(spheres: Spheres, ro, rd, time, t_min=MIN_T, t_max=MAX_T,
                          has_motion: bool = True):
    """Drop-in replacement for ``intersect.sphere_nearest`` on TPU.

    Custom VJP: the backward pass reuses the (cheap) gathered-winner
    recomputation instead of differentiating through the kernel — the
    gradient of a min-reduction flows only through the winning sphere, so
    d(t)/d(params) is recomputed from the quadratic at the winner
    (O(R) work) outside Pallas.
    """
    return _sphere_nearest_vjp(spheres, ro, rd, time, float(t_min), float(t_max),
                               bool(has_motion))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _sphere_nearest_vjp(spheres, ro, rd, time, t_min, t_max, has_motion):
    return _sphere_nearest_pallas_impl(spheres, ro, rd, time, t_min, t_max, has_motion)


def _vjp_fwd(spheres, ro, rd, time, t_min, t_max, has_motion):
    t, idx = _sphere_nearest_pallas_impl(spheres, ro, rd, time, t_min, t_max, has_motion)
    return (t, idx), (spheres, ro, rd, time, t, idx)


def _winner_t(spheres, ro, rd, time, idx, t_min, t_max):
    """Recompute the winning hit distance differentiably (O(R) gathers).

    Must mirror the kernel's root selection, including the caller's
    t_min/t_max window, or gradients flow through the wrong root."""
    c0 = spheres.center[idx]
    s = (time - spheres.time0[idx]) * spheres.inv_time_delta[idx]
    center = c0 + s[..., None] * spheres.center_delta[idx]
    radius = spheres.radius[idx]
    oc = ro - center
    b = jnp.sum(oc * rd, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    t0 = -b - sq
    t1 = -b + sq
    # same root selection as the kernel: prefer the near root if valid
    use_t0 = (disc > 0.0) & (t0 > t_min) & (t0 < t_max)
    return jnp.where(use_t0, t0, t1)


def _vjp_bwd(t_min, t_max, has_motion, res, grads):
    spheres, ro, rd, time, t, idx = res
    g_t, _ = grads
    hit = t < _INF
    g_t = jnp.where(hit, g_t, 0.0)

    def t_of(sph, ro_, rd_, time_):
        return _winner_t(sph, ro_, rd_, time_, idx, t_min, t_max)

    _, vjp = jax.vjp(t_of, spheres, ro, rd, time)
    return vjp(g_t)


_sphere_nearest_vjp.defvjp(_vjp_fwd, _vjp_bwd)
