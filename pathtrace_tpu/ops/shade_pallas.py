"""Fused Pallas shading kernel — the whole per-bounce shade/scatter pass in
ONE kernel on lane-packed ray planes.

Why: the measured per-bounce budget on this device (tools/bounce_breakdown.py)
is hit-kernel 15 ms + winner row gather 3 ms + **XLA shading ~44 ms** +
dispatch ~40 ms per 1M rays. The XLA shading cost is not the arithmetic —
a fused elementwise chain is nearly free — it is the two dozen strided
column reads of the ``[R, 24]`` winner-attribute rows and the ``[R, 3]``
fusion-boundary materializations (XLA pads the minor dim to 128 lanes).
This kernel takes the winner attributes as ONE ``(rows, K, 128)`` array —
the row-gathered ``[R, K]`` attrs after a single minor-dim transpose, which
measures ~5x cheaper than K strided column extracts (tools/split_probe.py) —
plus the ray-state planes, and runs the entire texture/emission/BSDF/scatter
computation at full VPU lane occupancy: every computed array in the kernel
is a dense ``(rows, 128)`` f32 tile.

The math MIRRORS :func:`pathtrace_tpu.ops.fastpath.fast_bounce` operation
for operation (same RNG, same select order, same guards), so the fused and
XLA shading paths are bit-identical — `tests/test_shade_pallas.py` enforces
it. Covers every scene class: image textures ride an XLA pre-pass
(`fastpath._image_rgb_planes` — UV + ONE atlas row gather on [R] planes)
whose texel planes the kernel selects where ``tex_kind == IMAGE``; only
image-on-boxes/media scenes stay on the XLA shading path (see
``fused_shade_supported``).

Reference role: this is the shading half of the reference's innermost
loop — the part of ``src/collision/spheres_soa.rs`` + ``src/material.rs``
economics where owning the runtime in one kernel is the whole game.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.config import MAX_T
from pathtrace_tpu.models.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneFeatures,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
)
from pathtrace_tpu.ops.fastpath import (
    COL_KIND,
    GEO,
    KIND_BOX,
    KIND_MEDIUM,
    KIND_RECT,
    TWO_PI,
    attr_width,
    cbrt_pos,
    counter_uniform,
    fast_turb_c,
)

_INF = float(MAX_T)

_STATE_FIELDS = (
    "rox", "roy", "roz", "rdx", "rdy", "rdz", "time",
    "thr_r", "thr_g", "thr_b", "rad_r", "rad_g", "rad_b",
    "alive", "lane",
)


def fused_shade_supported(features: SceneFeatures) -> bool:
    """Every scene class except image-on-boxes/media.

    Image scenes ride the fused kernel via the plane-form pre-pass
    (``fastpath._image_rgb_planes``: winner UV + one gather on the
    TRANSPOSED [3, N] atlas so nothing materializes 128x-padded). The r4
    measurement that kept image scenes on the XLA branch (~12 Mrays/s XLA
    vs ~7 fused) was dominated by the r4 pre-pass's own layout sins —
    strided ``attrs[:, k]`` column extracts and a padded [R, 3] gather
    result; with those fixed, the r5 same-window earth probe reads the
    XLA flavor at 10.2 Mrays/s vs the fused flavor at 21.8 on identical
    geometry (tools/earth_probe.py). Image-on-boxes/media still shades in
    XLA: the pre-pass has no box-UV branch (mirror fast_bounce's before
    flipping that too)."""
    if features.has_image and (features.has_boxes or features.has_media):
        return False
    return True


def _shade_kernel(*refs, f: SceneFeatures, max_depth: int, n_attr: int,
                  nee: bool = False):
    si = refs[0]           # SMEM (1,2) i32: seed, depth
    sf = refs[1]           # SMEM (1,4) f32: sky r/g/b, use_gradient_sky
    t = refs[2][...]
    # winner attrs arrive as ONE (bs, K, 128) block; attr k is a static
    # middle-dim slice (sublane-strided read — measured far cheaper than
    # K strided column extracts in XLA, tools/split_probe.py)
    a = [refs[3][:, k, :] for k in range(n_attr)]
    base = 4
    (rox, roy, roz, rdx, rdy, rdz, time,
     thr_r, thr_g, thr_b, rad_r, rad_g, rad_b,
     alive_f, lane_i) = [refs[base + k][...] for k in range(len(_STATE_FIELDS))]
    base += len(_STATE_FIELDS)
    img_rgb = None
    esc = None
    pos = n_attr
    if nee:
        # MIS emit_scale (the BSDF strategy's share of this vertex's
        # emission when the previous vertex ran NEE) rides the last cube
        # entry; the NEE estimator itself is a plane-form tail outside
        # the kernel (fastpath._fused_nee_tail)
        esc = a[pos - 1]
        pos -= 1
    if f.has_image:
        # atlas texels pre-fetched by the XLA pre-pass (the one gather the
        # kernel cannot do) ride trailing attr-cube entries — adding
        # them as separate operands instead measurably slowed the whole
        # kernel (r5 earth probes; extra refs shift Mosaic's pipelining)
        img_rgb = [a[pos - 3], a[pos - 2], a[pos - 1]]
        pos -= 3
    outs = refs[base:]

    seed = si[0, 0]
    depth = si[0, 1]
    lane = lane_i.astype(jnp.uint32)

    hit = t < _INF
    t_safe = jnp.where(hit, t, 0.0)
    px = rox + t_safe * rdx
    py = roy + t_safe * rdy
    pz = roz + t_safe * rdz

    kind = a[COL_KIND]
    cx, cy, cz = a[GEO], a[GEO + 1], a[GEO + 2]
    if f.has_motion:
        s = (time - a[GEO + 6]) * a[GEO + 7]
        cx = cx + s * a[GEO + 3]
        cy = cy + s * a[GEO + 4]
        cz = cz + s * a[GEO + 5]
    inv_r = 1.0 / jnp.where(jnp.abs(a[GEO + 8]) < 1e-12, 1.0, a[GEO + 8])
    nx = (px - cx) * inv_r
    ny = (py - cy) * inv_r
    nz = (pz - cz) * inv_r
    if f.has_rects:
        axis = a[GEO + 0]
        flip = a[GEO + 6]
        is_rect = kind == KIND_RECT
        nx = jnp.where(is_rect, (axis == 0.0).astype(px.dtype) * flip, nx)
        ny = jnp.where(is_rect, (axis == 1.0).astype(px.dtype) * flip, ny)
        nz = jnp.where(is_rect, (axis == 2.0).astype(px.dtype) * flip, nz)
    if f.has_boxes:
        # box normal: redo the slab test in object space from the winner's
        # affine columns (mirrors fast_bounce's box branch, which mirrors
        # ops.intersect.box_record)
        ofw = lambda r, c: a[GEO + 6 + r * 4 + c]
        ro_o = [
            ofw(r, 0) * rox + ofw(r, 1) * roy + ofw(r, 2) * roz + ofw(r, 3)
            for r in range(3)
        ]
        rd_o = [
            ofw(r, 0) * rdx + ofw(r, 1) * rdy + ofw(r, 2) * rdz
            for r in range(3)
        ]
        rd_o = [jnp.where(jnp.abs(v) < 1e-12, 1e-12, v) for v in rd_o]
        tn3, tf3 = [], []
        for r in range(3):
            rcp = 1.0 / rd_o[r]
            d0 = (a[GEO + r] - ro_o[r]) * rcp
            d1 = (a[GEO + 3 + r] - ro_o[r]) * rcp
            tn3.append(jnp.minimum(d0, d1))
            tf3.append(jnp.maximum(d0, d1))
        t_enter = jnp.maximum(jnp.maximum(tn3[0], tn3[1]), tn3[2])
        # first-max / first-min semantics match jnp.argmax/argmin
        enter_axis = jnp.where(tn3[1] > tn3[0], 1, 0)
        enter_axis = jnp.where(
            tn3[2] > jnp.maximum(tn3[0], tn3[1]), 2, enter_axis
        )
        exit_axis = jnp.where(tf3[1] < tf3[0], 1, 0)
        exit_axis = jnp.where(
            tf3[2] < jnp.minimum(tf3[0], tf3[1]), 2, exit_axis
        )
        is_entry = jnp.abs(t_safe - t_enter) < 1e-4 * jnp.maximum(
            jnp.abs(t_safe), 1.0
        )
        face_axis = jnp.where(is_entry, enter_axis, exit_axis)
        fa0 = (face_axis == 0).astype(px.dtype)
        fa1 = (face_axis == 1).astype(px.dtype)
        fa2 = (face_axis == 2).astype(px.dtype)
        rd_sel = fa0 * rd_o[0] + fa1 * rd_o[1] + fa2 * rd_o[2]
        sign_d = jnp.sign(rd_sel)
        n_sign = jnp.where(is_entry, -sign_d, sign_d)
        n_obj = [fa0 * n_sign, fa1 * n_sign, fa2 * n_sign]
        wfo = lambda r, c: a[GEO + 18 + r * 3 + c]
        is_box = kind == KIND_BOX
        for r, nc in ((0, "x"), (1, "y"), (2, "z")):
            bn = wfo(r, 0) * n_obj[0] + wfo(r, 1) * n_obj[1] + wfo(r, 2) * n_obj[2]
            if r == 0:
                nx = jnp.where(is_box, bn, nx)
            elif r == 1:
                ny = jnp.where(is_box, bn, ny)
            else:
                nz = jnp.where(is_box, bn, nz)
    if f.has_media:
        # arbitrary normal; the isotropic phase function ignores it
        is_med = kind == KIND_MEDIUM
        nx = jnp.where(is_med, 1.0, nx)
        ny = jnp.where(is_med, 0.0, ny)
        nz = jnp.where(is_med, 0.0, nz)

    tex_kind = a[3]
    rgb_r, rgb_g, rgb_b = a[4], a[5], a[6]
    if f.has_checker:
        sines = (
            jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
        )
        is_chk = tex_kind == float(TEX_CHECKER)
        neg = sines < 0.0
        rgb_r = jnp.where(is_chk, jnp.where(neg, a[7], a[10]), rgb_r)
        rgb_g = jnp.where(is_chk, jnp.where(neg, a[8], a[11]), rgb_g)
        rgb_b = jnp.where(is_chk, jnp.where(neg, a[9], a[12]), rgb_b)
    if f.has_noise:
        marble = 0.5 * (
            1.0 + jnp.sin(a[13] * pz + 10.0 * fast_turb_c(px, py, pz))
        )
        is_noise = tex_kind == float(TEX_NOISE)
        rgb_r = jnp.where(is_noise, marble, rgb_r)
        rgb_g = jnp.where(is_noise, marble, rgb_g)
        rgb_b = jnp.where(is_noise, marble, rgb_b)
    if f.has_image:
        # mirrors fast_bounce's image branch order (applied after noise)
        is_img = tex_kind == float(TEX_IMAGE)
        rgb_r = jnp.where(is_img, img_rgb[0], rgb_r)
        rgb_g = jnp.where(is_img, img_rgb[1], rgb_g)
        rgb_b = jnp.where(is_img, img_rgb[2], rgb_b)

    mat_kind = a[0]
    sky_t = 0.5 * (rdy + 1.0)
    use_grad = sf[0, 3]
    sky_consts = (0.15, 0.21, 0.30)
    is_light = mat_kind == float(MAT_DIFFUSE_LIGHT)
    rads = []
    for c, (rgb_c, thr_c, rad_c) in enumerate(
        ((rgb_r, thr_r, rad_r), (rgb_g, thr_g, rad_g), (rgb_b, thr_b, rad_b))
    ):
        grad_c = (1.0 - sky_t) + sky_t * sky_consts[c]
        sky_c = jnp.where(use_grad > 0.5, grad_c, sf[0, c])
        prim_c = jnp.where(is_light, rgb_c, 0.0)
        if nee:
            prim_c = prim_c * esc
        emit_c = jnp.where(hit, prim_c, sky_c)
        rads.append(rad_c + thr_c * emit_c * alive_f)
    rad_r, rad_g, rad_b = rads

    u1 = counter_uniform(lane, seed, depth, 0)
    u2 = counter_uniform(lane, seed, depth, 1)
    u3 = counter_uniform(lane, seed, depth, 2)
    uc = counter_uniform(lane, seed, depth, 3)
    zz = u1 * 2.0 - 1.0
    aa = u2 * TWO_PI
    rr = jnp.sqrt(jnp.maximum(1.0 - zz * zz, 0.0))
    ux = rr * jnp.cos(aa)
    uy = rr * jnp.sin(aa)
    uz = zz

    rdotn = rdx * nx + rdy * ny + rdz * nz
    refl_x = rdx - 2.0 * rdotn * nx
    refl_y = rdy - 2.0 * rdotn * ny
    refl_z = rdz - 2.0 * rdotn * nz

    dir_x, dir_y, dir_z = ux, uy, uz
    # scatter-ok mask as f32 0/1 — Mosaic cannot select between i1 vectors
    ok = jnp.ones_like(t)

    if f.has_dielectric:
        ref_idx = a[2]
        exiting = rdotn > 0.0
        sgn = jnp.where(exiting, -1.0, 1.0)
        ox, oy, oz = sgn * nx, sgn * ny, sgn * nz
        ni = jnp.where(exiting, ref_idx, 1.0 / ref_idx)
        cos_in = jnp.where(exiting, rdotn, -rdotn)
        ces = 1.0 - ref_idx * ref_idx * (1.0 - cos_in * cos_in)
        cosine = jnp.where(
            exiting, jnp.sqrt(jnp.where(ces > 0.0, ces, 1.0)), cos_in
        )
        dt_ = rdx * ox + rdy * oy + rdz * oz
        disc = 1.0 - ni * ni * (1.0 - dt_ * dt_)
        refr_ok = disc > 0.0
        sq = jnp.sqrt(jnp.where(refr_ok, disc, 1.0))
        refr_x = ni * (rdx - ox * dt_) - ox * sq
        refr_y = ni * (rdy - oy * dt_) - oy * sq
        refr_z = ni * (rdz - oz * dt_) - oz * sq
        r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
        r0 = r0 * r0
        omc = 1.0 - cosine
        omc2 = omc * omc
        schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
        reflect_prob = jnp.where(refr_ok, schlick, 1.0)
        tr = uc > reflect_prob
        diel_x = jnp.where(tr, refr_x, refl_x)
        diel_y = jnp.where(tr, refr_y, refl_y)
        diel_z = jnp.where(tr, refr_z, refl_z)
        is_diel = mat_kind == float(MAT_DIELECTRIC)
        dir_x = jnp.where(is_diel, diel_x, dir_x)
        dir_y = jnp.where(is_diel, diel_y, dir_y)
        dir_z = jnp.where(is_diel, diel_z, dir_z)

    if f.has_metal:
        fuzz = a[1]
        rad3 = cbrt_pos(u3)
        fr = fuzz * rad3
        is_metal = mat_kind == float(MAT_METAL)
        dir_x = jnp.where(is_metal, refl_x + fr * ux, dir_x)
        dir_y = jnp.where(is_metal, refl_y + fr * uy, dir_y)
        dir_z = jnp.where(is_metal, refl_z + fr * uz, dir_z)
        ok = jnp.where(is_metal, jnp.where(rdotn < 0.0, 1.0, 0.0), ok)

    if f.has_lambertian:
        is_lam = mat_kind == float(MAT_LAMBERTIAN)
        dir_x = jnp.where(is_lam, nx + ux, dir_x)
        dir_y = jnp.where(is_lam, ny + uy, dir_y)
        dir_z = jnp.where(is_lam, nz + uz, dir_z)

    if f.has_light:
        ok = jnp.where(is_light, 0.0, ok)  # lights never scatter

    inv_len = jax.lax.rsqrt(
        jnp.maximum(dir_x * dir_x + dir_y * dir_y + dir_z * dir_z, 1e-38)
    )
    dir_x = dir_x * inv_len
    dir_y = dir_y * inv_len
    dir_z = dir_z * inv_len

    if f.has_dielectric:
        at_r = jnp.where(is_diel, 1.0, rgb_r)
        at_g = jnp.where(is_diel, 1.0, rgb_g)
        at_b = jnp.where(is_diel, 1.0, rgb_b)
    else:
        at_r, at_g, at_b = rgb_r, rgb_g, rgb_b

    can = (alive_f > 0.5) & hit & (ok > 0.5) & (depth < max_depth)
    outs[0][...] = jnp.where(can, px, rox)
    outs[1][...] = jnp.where(can, py, roy)
    outs[2][...] = jnp.where(can, pz, roz)
    outs[3][...] = jnp.where(can, dir_x, rdx)
    outs[4][...] = jnp.where(can, dir_y, rdy)
    outs[5][...] = jnp.where(can, dir_z, rdz)
    outs[6][...] = rad_r
    outs[7][...] = rad_g
    outs[8][...] = rad_b
    outs[9][...] = jnp.where(can, thr_r * at_r, thr_r)
    outs[10][...] = jnp.where(can, thr_g * at_g, thr_g)
    outs[11][...] = jnp.where(can, thr_b * at_b, thr_b)
    outs[12][...] = jnp.where(can, 1.0, 0.0).astype(jnp.float32)


def shade_bounce_planes(t, attrs3, state_planes, seed, depth,
                        sky, use_gradient_sky, features: SceneFeatures,
                        max_depth: int, img_planes=None, emit_scale=None):
    """Run the fused shade/scatter kernel on one wavefront.

    ``t``: [R] hit distances. ``attrs3``: (R//128, K, 128) winner-attribute
    array — the row-gathered ``[R, K]`` attrs reshaped to lane planes and
    minor-transposed so the kernel slices attr k statically (one XLA
    transpose instead of K strided column extracts).
    ``state_planes``: dict with keys ``_STATE_FIELDS`` ([R] planes;
    ``alive`` f32 0/1, ``lane`` int32 bit-pattern of the uint32 lane ids).
    ``img_planes``: 3 [R] texel planes from the XLA atlas pre-pass,
    required when ``features.has_image``.
    Returns 13 output planes: ro xyz, rd xyz, radiance rgb, throughput rgb,
    alive (f32 0/1).
    """
    R = t.shape[0]
    assert R % 128 == 0, "fused shading needs R % 128 == 0 (caller pads)"
    rows = R // 128

    def plane(x):
        return x.reshape(rows, 128)

    if features.has_image:
        # texels join the attr cube as 3 extra entries (see _shade_kernel)
        assert img_planes is not None and len(img_planes) == 3
        img_cube = jnp.stack([plane(p) for p in img_planes], axis=1)
        attrs3 = jnp.concatenate([attrs3, img_cube], axis=1)
    nee = emit_scale is not None
    if nee:
        attrs3 = jnp.concatenate([attrs3, plane(emit_scale)[:, None, :]],
                                 axis=1)
    n_attr = attrs3.shape[1]
    assert attrs3.shape == (rows, n_attr, 128), attrs3.shape
    # Mosaic block constraint: sublane dim divisible by 8, or whole-array.
    # Callers pad wavefronts to 1024-ray multiples (rows % 8 == 0) except
    # sub-1024 compaction rungs, whose whole-plane blocks are tiny anyway.
    if rows % 8 == 0:
        bs = next(b for b in (64, 32, 16, 8) if rows % b == 0)
    else:
        assert rows < 8, f"pad wavefronts to 1024-ray multiples (rows={rows})"
        bs = rows
    grid = (rows // bs,)

    si = jnp.stack(
        [jnp.asarray(seed, jnp.int32), jnp.asarray(depth, jnp.int32)]
    ).reshape(1, 2)
    sf = jnp.concatenate(
        [jnp.asarray(sky, jnp.float32).reshape(3),
         jnp.asarray(use_gradient_sky, jnp.float32).reshape(1)]
    ).reshape(1, 4)

    inputs = [si, sf, plane(t), attrs3]
    for name in _STATE_FIELDS:
        inputs.append(plane(state_planes[name]))
    n_extra = 0

    smem_spec = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    smem_spec4 = pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)
    pspec = pl.BlockSpec((bs, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(
        (bs, n_attr, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    n_state = len(_STATE_FIELDS)
    ospec = pl.BlockSpec((bs, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 13

    kernel = functools.partial(_shade_kernel, f=features, max_depth=max_depth,
                               n_attr=n_attr, nee=nee)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem_spec, smem_spec4, pspec, aspec]
        + [pspec] * (n_state + n_extra),
        out_specs=tuple([ospec] * 13),
        out_shape=tuple(out_shape),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=R * 250,
            bytes_accessed=R * 4 * (n_attr + n_state + 14),
            transcendentals=R * 10,
        ),
    )(*inputs)
    return [o.reshape(R) for o in outs]
