"""Host-side scene construction: a builder that emits the flat Scene pytree.

Replaces the reference's ``Storage`` arenas + preset closures
(reference ``src/storage.rs:12-97``, ``src/presets.rs``): presets call
``add_*`` methods; ``finish()`` pads every kind to a static capacity and
returns a :class:`pathtrace_tpu.models.types.Scene` of numpy arrays ready for
``jax.device_put``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

from pathtrace_tpu.models import types as T

Vec3 = Union[Tuple[float, float, float], Sequence[float], np.ndarray]


def _v3(v: Vec3) -> np.ndarray:
    return np.asarray(v, dtype=np.float32).reshape(3)


def _pad_to(n: int, multiple: int) -> int:
    """Pad counts to a friendly static capacity (>=1 entry, lane-aligned)."""
    n = max(n, 1)
    return ((n + multiple - 1) // multiple) * multiple


def make_perlin_tables(rng: np.random.Generator) -> T.PerlinTables:
    """Generate Perlin tables the same way the reference does.

    256 normalized uniform-in-cube gradients (reference src/perlin.rs:15-26)
    and three Fisher-Yates permutations (src/perlin.rs:28-42).
    """
    v = rng.random((256, 3), dtype=np.float32) * 2.0 - 1.0
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    perms = []
    for _ in range(3):
        p = np.arange(256, dtype=np.int32)
        # Fisher-Yates with float-derived index, mirroring src/perlin.rs:29-33
        for i in range(255, -1, -1):
            tgt = int(rng.random() * (i + 1))
            p[i], p[tgt] = p[tgt], p[i]
        perms.append(p)
    return T.PerlinTables(
        randvec=v.astype(np.float32),
        perm_x=perms[0],
        perm_y=perms[1],
        perm_z=perms[2],
    )


def _morton3(q: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized xyz columns into 30-bit Morton codes."""

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(16))) & np.uint64(0x030000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x0300F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x030C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x09249249)
        return v

    return (
        spread(q[:, 0])
        | (spread(q[:, 1]) << np.uint64(1))
        | (spread(q[:, 2]) << np.uint64(2))
    )


def identity_affine() -> np.ndarray:
    return np.concatenate(
        [np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)], axis=1
    )


def affine_from_rotation_y_translation(degrees: float, translation: Vec3) -> np.ndarray:
    """3x4 affine: rotate about +Y then translate.

    The only transform kind the presets use
    (reference src/presets.rs:407-414).
    """
    th = np.deg2rad(degrees)
    c, s = np.cos(th), np.sin(th)
    rot = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], dtype=np.float32)
    m = np.zeros((3, 4), dtype=np.float32)
    m[:, :3] = rot
    m[:, 3] = _v3(translation)
    return m


def affine_from_axis_angle(axis: Vec3, degrees: float,
                           translation: Vec3 = (0.0, 0.0, 0.0),
                           scale: float = 1.0) -> np.ndarray:
    """3x4 affine: uniform scale, rotate about an arbitrary axis, translate.

    Convenience constructor for the generic-instance API (reference
    ``src/collision/instance.rs:16-22`` stores an arbitrary affine); any
    3x4 matrix works everywhere a ``transform=`` argument is accepted —
    compose richer ones with :func:`affine_compose`.
    """
    a = _v3(axis).astype(np.float64)
    a = a / np.linalg.norm(a)
    th = np.deg2rad(degrees)
    c, s = np.cos(th), np.sin(th)
    x, y, z = a
    rot = np.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
    ])
    m = np.zeros((3, 4), np.float32)
    m[:, :3] = (rot * scale).astype(np.float32)
    m[:, 3] = _v3(translation)
    return m


def affine_compose(*ms: np.ndarray) -> np.ndarray:
    """Compose 3x4 affines left-to-right in application order:
    ``affine_compose(a, b)`` applies ``a`` first, then ``b``."""
    out = identity_affine().astype(np.float64)
    for m in ms:
        m = np.asarray(m, np.float64)
        lin = m[:, :3] @ out[:, :3]
        t = m[:, :3] @ out[:, 3] + m[:, 3]
        out = np.concatenate([lin, t[:, None]], axis=1)
    return out.astype(np.float32)


def invert_affine(m: np.ndarray) -> np.ndarray:
    """Invert a 3x4 affine (assumes invertible linear part)."""
    lin = m[:, :3]
    t = m[:, 3]
    inv_lin = np.linalg.inv(lin)
    out = np.zeros((3, 4), dtype=np.float32)
    out[:, :3] = inv_lin
    out[:, 3] = -inv_lin @ t
    return out


def _opt_affine(m: Optional[np.ndarray]) -> Optional[np.ndarray]:
    if m is None:
        return None
    m = np.asarray(m, np.float32)
    assert m.shape == (3, 4), f"transform must be 3x4 affine, got {m.shape}"
    return m


class SceneBuilder:
    """Accumulates primitives/materials/textures, then emits a Scene pytree."""

    def __init__(self, perlin_rng: Optional[np.random.Generator] = None):
        # spheres
        self._sph = []
        # rects: (axis, a0, a1, b0, b1, k, flip, mat)
        self._rects = []
        # boxes: (p0, p1, world_from_obj, mat)
        self._boxes = []
        # media: (kind, p0, p1, radius, world_from_obj, density, mat)
        self._media = []
        # materials: (kind, tex, fuzz, ref_idx)
        self._mats = []
        # textures: (kind, color, odd, even, scale, image)
        self._texs = []
        self._images = []  # list of [h, w, 3] float arrays
        self.sky: Optional[Vec3] = None  # None => gradient sky
        self._perlin_rng = perlin_rng or np.random.default_rng(0)

    # ---- textures ----
    def constant_texture(self, color: Vec3) -> int:
        self._texs.append((T.TEX_CONSTANT, _v3(color), 0, 0, 0.0, 0))
        return len(self._texs) - 1

    def checker_texture(self, odd_id: int, even_id: int) -> int:
        self._texs.append((T.TEX_CHECKER, np.zeros(3, np.float32), odd_id, even_id, 0.0, 0))
        return len(self._texs) - 1

    def noise_texture(self, scale: float) -> int:
        self._texs.append((T.TEX_NOISE, np.zeros(3, np.float32), 0, 0, float(scale), 0))
        return len(self._texs) - 1

    def image_texture(self, image) -> int:
        """Image texture from an [h, w, 3] float array in [0, 1] or a
        PNG/JPEG file path (loaded at build time, the analog of the
        reference's runtime ``RgbImage::open`` — src/texture.rs:14-36,
        whose own asset is earthmap.jpg; like the reference, raw 8-bit
        values map to [0,1] with no sRGB decode)."""
        if isinstance(image, (str, bytes)) or hasattr(image, "__fspath__"):
            from pathtrace_tpu.render.film import read_image

            image = read_image(str(image)).astype(np.float32) / 255.0
        img_id = len(self._images)
        self._images.append(np.asarray(image, dtype=np.float32))
        self._texs.append((T.TEX_IMAGE, np.zeros(3, np.float32), 0, 0, 0.0, img_id))
        return len(self._texs) - 1

    # ---- materials ----
    def _mat(self, kind: int, tex_id: int, fuzz: float = 0.0, ref_idx: float = 1.0) -> int:
        self._mats.append((kind, tex_id, float(fuzz), float(ref_idx)))
        return len(self._mats) - 1

    def lambertian(self, tex_id: int) -> int:
        return self._mat(T.MAT_LAMBERTIAN, tex_id)

    def lambertian_color(self, color: Vec3) -> int:
        return self.lambertian(self.constant_texture(color))

    def metal(self, albedo: Vec3, fuzz: float) -> int:
        return self._mat(T.MAT_METAL, self.constant_texture(albedo), fuzz=fuzz)

    def dielectric(self, ref_idx: float) -> int:
        return self._mat(T.MAT_DIELECTRIC, self.constant_texture((1.0, 1.0, 1.0)), ref_idx=ref_idx)

    def diffuse_light(self, tex_id: int) -> int:
        return self._mat(T.MAT_DIFFUSE_LIGHT, tex_id)

    def diffuse_light_color(self, color: Vec3) -> int:
        return self.diffuse_light(self.constant_texture(color))

    def isotropic(self, tex_id: int) -> int:
        return self._mat(T.MAT_ISOTROPIC, tex_id)

    # ---- primitives ----
    def sphere(self, center: Vec3, radius: float, mat_id: int,
               transform: Optional[np.ndarray] = None) -> None:
        """``transform``: optional 3x4 world_from_obj affine — the generic
        Instance wrapper (reference src/collision/instance.rs:16-47). The
        sphere's center/radius are then object-space; any affine works,
        including non-uniform scale (an ellipsoid)."""
        self._sph.append((_v3(center), np.zeros(3, np.float32), 0.0, 0.0,
                          float(radius), mat_id, _opt_affine(transform)))

    def moving_sphere(
        self,
        center0: Vec3,
        center1: Vec3,
        time0: float,
        time1: float,
        radius: float,
        mat_id: int,
        transform: Optional[np.ndarray] = None,
    ) -> None:
        c0, c1 = _v3(center0), _v3(center1)
        self._sph.append(
            (c0, c1 - c0, float(time0), 1.0 / (time1 - time0), float(radius),
             mat_id, _opt_affine(transform))
        )

    def rect_xy(self, x0, x1, y0, y1, k, flip: bool, mat_id: int,
                transform: Optional[np.ndarray] = None) -> None:
        self._rects.append((2, x0, x1, y0, y1, k, -1.0 if flip else 1.0,
                            mat_id, _opt_affine(transform)))

    def rect_xz(self, x0, x1, z0, z1, k, flip: bool, mat_id: int,
                transform: Optional[np.ndarray] = None) -> None:
        self._rects.append((1, x0, x1, z0, z1, k, -1.0 if flip else 1.0,
                            mat_id, _opt_affine(transform)))

    def rect_yz(self, y0, y1, z0, z1, k, flip: bool, mat_id: int,
                transform: Optional[np.ndarray] = None) -> None:
        self._rects.append((0, y0, y1, z0, z1, k, -1.0 if flip else 1.0,
                            mat_id, _opt_affine(transform)))

    def box(
        self,
        p0: Vec3,
        p1: Vec3,
        mat_id: int,
        world_from_obj: Optional[np.ndarray] = None,
    ) -> None:
        m = identity_affine() if world_from_obj is None else np.asarray(world_from_obj, np.float32)
        self._boxes.append((_v3(p0), _v3(p1), m, mat_id))

    def medium_box(
        self,
        p0: Vec3,
        p1: Vec3,
        density: float,
        albedo_tex: int,
        world_from_obj: Optional[np.ndarray] = None,
    ) -> None:
        m = identity_affine() if world_from_obj is None else np.asarray(world_from_obj, np.float32)
        mat = self.isotropic(albedo_tex)
        self._media.append((T.MEDIUM_BOX, _v3(p0), _v3(p1), 0.0, m, float(density), mat))

    def medium_sphere(self, center: Vec3, radius: float, density: float, albedo_tex: int) -> None:
        mat = self.isotropic(albedo_tex)
        self._media.append(
            (T.MEDIUM_SPHERE, _v3(center), np.zeros(3, np.float32), float(radius),
             identity_affine(), float(density), mat)
        )

    # ---- finish ----
    def finish(self, pad_multiple: int = 1, spatial_sort: bool = False) -> T.Scene:
        """Pad every kind to static capacity and emit numpy Scene arrays.

        ``pad_multiple`` rounds per-kind capacities up (use 128/256 to keep a
        stable compiled program across scenes of similar size and to align the
        sphere axis for the Pallas kernel).

        ``spatial_sort`` reorders spheres by the Morton code of their
        (mid-shutter) centers before padding, so each 128-sphere Pallas tile
        covers a spatially compact region — the property the in-kernel
        per-tile AABB cull (``intersect_pallas``, ``cull=True``) needs to
        skip work. Winner selection is a min over t, so sphere order never
        changes the rendered image (exact-t ties aside); this is the TPU
        analog of the reference BVH's recursive spatial partition
        (src/collision/bvh.rs:64-94) applied as a one-shot data layout.
        """
        f32, i32 = np.float32, np.int32

        if spatial_sort and len(self._sph) > 2:
            centers = np.stack(
                [c + 0.5 * d for (c, d, _t0, _invdt, _r, _m, _x) in self._sph]
            )
            lo = centers.min(axis=0)
            ext = np.maximum(centers.max(axis=0) - lo, 1e-9)
            q = np.clip((centers - lo) / ext * 1023.0, 0.0, 1023.0)
            codes = _morton3(q.astype(np.uint32))
            order = np.argsort(codes, kind="stable")
            self._sph = [self._sph[i] for i in order]

        ns = _pad_to(len(self._sph), pad_multiple)
        sp_center = np.zeros((ns, 3), f32)
        sp_delta = np.zeros((ns, 3), f32)
        sp_t0 = np.zeros(ns, f32)
        sp_invdt = np.zeros(ns, f32)
        # Padding spheres mirror the reference's SoA padding trick: huge
        # far-away centers so they never hit (src/collision/spheres_soa.rs:53-61).
        sp_center[:, :] = 1.0e18
        sp_radius = np.zeros(ns, f32)
        sp_mat = np.zeros(ns, i32)
        sp_mask = np.zeros(ns, bool)
        sp_any_xf = any(x is not None for (*_, x) in self._sph)
        sp_wfo = np.tile(identity_affine()[None], (ns, 1, 1)) if sp_any_xf else None
        sp_ofw = np.tile(identity_affine()[None], (ns, 1, 1)) if sp_any_xf else None
        for i, (c, d, t0, invdt, r, m, xf) in enumerate(self._sph):
            sp_center[i] = c
            sp_delta[i] = d
            sp_t0[i] = t0
            sp_invdt[i] = invdt
            sp_radius[i] = r
            sp_mat[i] = m
            sp_mask[i] = True
            if xf is not None:
                sp_wfo[i] = xf
                sp_ofw[i] = invert_affine(xf)

        nr = _pad_to(len(self._rects), 1)
        re_axis = np.zeros(nr, i32)
        re_a0 = np.zeros(nr, f32)
        re_a1 = np.zeros(nr, f32)
        re_b0 = np.zeros(nr, f32)
        re_b1 = np.zeros(nr, f32)
        re_k = np.full(nr, 1.0e18, f32)
        re_flip = np.ones(nr, f32)
        re_mat = np.zeros(nr, i32)
        re_mask = np.zeros(nr, bool)
        re_any_xf = any(x is not None for (*_, x) in self._rects)
        re_wfo = np.tile(identity_affine()[None], (nr, 1, 1)) if re_any_xf else None
        re_ofw = np.tile(identity_affine()[None], (nr, 1, 1)) if re_any_xf else None
        for i, (ax, a0, a1, b0, b1, k, fl, m, xf) in enumerate(self._rects):
            re_axis[i] = ax
            re_a0[i], re_a1[i], re_b0[i], re_b1[i], re_k[i] = a0, a1, b0, b1, k
            re_flip[i] = fl
            re_mat[i] = m
            re_mask[i] = True
            if xf is not None:
                re_wfo[i] = xf
                re_ofw[i] = invert_affine(xf)

        nb = _pad_to(len(self._boxes), 1)
        bx_p0 = np.full((nb, 3), 1.0e18, f32)
        bx_p1 = np.full((nb, 3), 1.0e18, f32)
        bx_wfo = np.tile(identity_affine()[None], (nb, 1, 1))
        bx_ofw = np.tile(identity_affine()[None], (nb, 1, 1))
        bx_mat = np.zeros(nb, i32)
        bx_mask = np.zeros(nb, bool)
        for i, (p0, p1, m, mat) in enumerate(self._boxes):
            bx_p0[i], bx_p1[i] = p0, p1
            bx_wfo[i] = m
            bx_ofw[i] = invert_affine(m)
            bx_mat[i] = mat
            bx_mask[i] = True

        nm = _pad_to(len(self._media), 1)
        md_kind = np.zeros(nm, i32)
        md_p0 = np.full((nm, 3), 1.0e18, f32)
        md_p1 = np.full((nm, 3), 1.0e18, f32)
        md_rad = np.zeros(nm, f32)
        md_wfo = np.tile(identity_affine()[None], (nm, 1, 1))
        md_ofw = np.tile(identity_affine()[None], (nm, 1, 1))
        md_den = np.ones(nm, f32)
        md_mat = np.zeros(nm, i32)
        md_mask = np.zeros(nm, bool)
        for i, (kind, p0, p1, rad, m, den, mat) in enumerate(self._media):
            md_kind[i] = kind
            md_p0[i], md_p1[i], md_rad[i] = p0, p1, rad
            md_wfo[i] = m
            md_ofw[i] = invert_affine(m)
            md_den[i] = den
            md_mat[i] = mat
            md_mask[i] = True

        nmat = max(len(self._mats), 1)
        ma_kind = np.zeros(nmat, i32)
        ma_tex = np.zeros(nmat, i32)
        ma_fuzz = np.zeros(nmat, f32)
        ma_ref = np.ones(nmat, f32)
        for i, (kind, tex, fuzz, ref_idx) in enumerate(self._mats):
            ma_kind[i], ma_tex[i], ma_fuzz[i], ma_ref[i] = kind, tex, fuzz, ref_idx

        ntex = max(len(self._texs), 1)
        tx_kind = np.zeros(ntex, i32)
        tx_color = np.zeros((ntex, 3), f32)
        tx_odd = np.zeros(ntex, i32)
        tx_even = np.zeros(ntex, i32)
        tx_scale = np.zeros(ntex, f32)
        tx_img = np.zeros(ntex, i32)
        for i, (kind, color, odd, even, scale, img) in enumerate(self._texs):
            tx_kind[i] = kind
            tx_color[i] = color
            tx_odd[i], tx_even[i] = odd, even
            tx_scale[i] = scale
            tx_img[i] = img

        # image atlas: stack images vertically, left-aligned
        if self._images:
            wmax = max(im.shape[1] for im in self._images)
            htot = sum(im.shape[0] for im in self._images)
            atlas = np.zeros((htot, wmax, 3), f32)
            yoffs, hs, ws = [], [], []
            y = 0
            for im in self._images:
                h, w = im.shape[:2]
                atlas[y : y + h, :w] = im
                yoffs.append(y)
                hs.append(h)
                ws.append(w)
                y += h
            at = T.ImageAtlas(
                data=atlas,
                y_offset=np.asarray(yoffs, i32),
                height=np.asarray(hs, i32),
                width=np.asarray(ws, i32),
                data_planes=np.ascontiguousarray(atlas.reshape(-1, 3).T),
            )
        else:
            at = T.ImageAtlas(
                data=np.zeros((1, 1, 3), f32),
                y_offset=np.zeros(1, i32),
                height=np.ones(1, i32),
                width=np.ones(1, i32),
                data_planes=np.zeros((3, 1), f32),
            )

        sky = np.zeros(3, f32) if self.sky is None else _v3(self.sky)
        return T.Scene(
            spheres=T.Spheres(sp_center, sp_delta, sp_t0, sp_invdt, sp_radius,
                              sp_mat, sp_mask, sp_wfo, sp_ofw),
            rects=T.Rects(re_axis, re_a0, re_a1, re_b0, re_b1, re_k, re_flip,
                          re_mat, re_mask, re_wfo, re_ofw),
            boxes=T.Boxes(bx_p0, bx_p1, bx_wfo, bx_ofw, bx_mat, bx_mask),
            media=T.Media(md_kind, md_p0, md_p1, md_rad, md_wfo, md_ofw, md_den, md_mat, md_mask),
            materials=T.Materials(ma_kind, ma_tex, ma_fuzz, ma_ref),
            textures=T.Textures(tx_kind, tx_color, tx_odd, tx_even, tx_scale, tx_img),
            perlin=make_perlin_tables(self._perlin_rng),
            atlas=at,
            sky=sky,
            use_gradient_sky=np.float32(1.0 if self.sky is None else 0.0),
        )
