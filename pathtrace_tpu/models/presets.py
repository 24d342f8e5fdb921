"""The 10 preset scenes (reference ``src/presets.rs:24-37``), plus two the
reference left unfinished: ``final_full`` (the completed 'Next Week' final
scene, stubbed at ``presets.rs:40-71``) and ``aras`` (the ToyPathTracer
scene, shipped commented-out at ``presets.rs:595-851``).

Each builder returns ``(Scene, Camera)`` — the flat-array analog of the
reference's ``(Vec<Hitable>, Camera, Option<sky>)``. Deterministic: the
``random``/``random_spheres`` scatter uses a seeded numpy generator standing
in for the reference's seed-0 Xoshiro (bitwise RNG parity is impossible
across implementations; determinism *within* this framework is what the
golden tests rely on, see SURVEY.md §7f).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

from pathtrace_tpu.camera import Camera, make_camera
from pathtrace_tpu.models.build import (
    SceneBuilder,
    affine_from_rotation_y_translation,
)
from pathtrace_tpu.models.types import Scene

PresetFn = Callable[..., Tuple[Scene, Camera]]


def _standard_camera(aspect: float, time1: float = 1.0, aperture: float = 0.1) -> Camera:
    """The 13,2,3 -> origin camera most presets share (src/presets.rs:95-109)."""
    return make_camera(
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        vup=(0.0, 1.0, 0.0),
        vfov_degrees=20.0,
        aspect=aspect,
        aperture=aperture,
        focus_dist=10.0,
        time0=0.0,
        time1=time1,
    )


def _random_impl(aspect: float, only_spheres: bool, seed: int,
                 half_extent: int = 11) -> Tuple[Scene, Camera]:
    """Shirley cover scene, ~488 spheres (reference src/presets.rs:89-215).

    ``half_extent`` scales the small-sphere grid (11 -> the reference's
    22x22; larger values build the XL stress scenes for the tiled-cull /
    BVH scaling path)."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))

    checker = b.checker_texture(
        b.constant_texture((0.2, 0.3, 0.1)), b.constant_texture((0.9, 0.9, 0.9))
    )
    b.sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian(checker))

    for a in range(-half_extent, half_extent):
        for c in range(-half_extent, half_extent):
            choose = rng.random()
            centre = np.array(
                [a + 0.9 * rng.random(), 0.2, c + 0.9 * rng.random()], np.float32
            )
            if choose < 0.8:
                albedo = (
                    rng.random() * rng.random(),
                    rng.random() * rng.random(),
                    rng.random() * rng.random(),
                )
                centre1 = centre + np.array([0.0, 0.5 * rng.random(), 0.0], np.float32)
                if only_spheres:
                    b.sphere(centre, 0.2, b.lambertian_color(albedo))
                else:
                    b.moving_sphere(centre, centre1, 0.0, 1.0, 0.2, b.lambertian_color(albedo))
            elif choose < 0.95:
                albedo = (
                    0.5 * (1.0 + rng.random()),
                    0.5 * (1.0 + rng.random()),
                    0.5 * (1.0 + rng.random()),
                )
                b.sphere(centre, 0.2, b.metal(albedo, 0.5 * rng.random()))
            else:
                b.sphere(centre, 0.2, b.dielectric(1.5))

    b.sphere((0.0, 1.0, 0.0), 1.0, b.dielectric(1.5))
    b.sphere((-4.0, 1.0, 0.0), 1.0, b.lambertian_color((0.4, 0.2, 0.1)))
    b.sphere((4.0, 1.0, 0.0), 1.0, b.metal((0.7, 0.6, 0.5), 0.0))

    return (
        b.finish(pad_multiple=128, spatial_sort=True),
        _standard_camera(aspect),
    )


def random(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """Cover scene with motion-blurred diffuse spheres (src/presets.rs:73-79)."""
    return _random_impl(aspect, only_spheres=False, seed=seed)


def random_spheres(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """Cover scene, static spheres only (src/presets.rs:81-87)."""
    return _random_impl(aspect, only_spheres=True, seed=seed)


def random_spheres_xl(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """TPU extension preset: the cover scene at a 64x64 grid (~4100
    spheres). Not in the reference — a stress fixture for the in-kernel
    tile-cull and BVH scaling paths (the reference's flat list stops
    paying long before this size; its BVH exists for exactly this reason,
    src/collision/bvh.rs)."""
    return _random_impl(aspect, only_spheres=True, seed=seed, half_extent=32)


def small(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """5-sphere scene with a hollow glass shell (src/presets.rs:217-269)."""
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))
    b.sphere((0.0, 0.0, -1.0), 0.5, b.lambertian_color((0.1, 0.2, 0.5)))
    b.sphere((0.0, -100.5, -1.0), 100.0, b.lambertian_color((0.8, 0.8, 0.0)))
    b.sphere((1.0, 0.0, -1.0), 0.5, b.metal((0.8, 0.6, 0.2), 0.0))
    b.sphere((-1.0, 0.0, -1.0), 0.5, b.dielectric(1.5))
    b.sphere((-1.0, 0.0, -1.0), -0.45, b.dielectric(1.5))
    lookfrom = np.array([3.0, 3.0, 2.0])
    lookat = np.array([0.0, 0.0, -1.0])
    cam = make_camera(
        lookfrom, lookat, (0.0, 1.0, 0.0), 20.0, aspect,
        aperture=0.1, focus_dist=float(np.linalg.norm(lookfrom - lookat)),
        time0=0.0, time1=1.0,
    )
    return b.finish(), cam


def two_perlin_spheres(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """Default preset: marble ground + marble sphere (src/presets.rs:271-315)."""
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))
    noise = b.noise_texture(4.0)
    b.sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian(noise))
    b.sphere((0.0, 2.0, 0.0), 2.0, b.lambertian(noise))
    return b.finish(), _standard_camera(aspect, time1=0.0, aperture=0.0)


def simple_light(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """Emissive sphere + rect over marble, black sky (src/presets.rs:317-371)."""
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))
    noise = b.noise_texture(4.0)
    light_tex = b.constant_texture((4.0, 4.0, 4.0))
    b.sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian(noise))
    b.sphere((0.0, 2.0, 0.0), 2.0, b.lambertian(noise))
    b.sphere((0.0, 7.0, 0.0), 2.0, b.diffuse_light(light_tex))
    b.rect_xy(3.0, 5.0, 1.0, 3.0, -2.0, False, b.diffuse_light(light_tex))
    b.sky = (0.0, 0.0, 0.0)
    cam = make_camera(
        (50.0, 2.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 20.0, aspect,
        aperture=0.0, focus_dist=10.0, time0=0.0, time1=0.0,
    )
    return b.finish(), cam


def _cornell_camera(aspect: float) -> Camera:
    return make_camera(
        (278.0, 278.0, -800.0), (278.0, 278.0, 0.0), (0.0, 1.0, 0.0), 40.0,
        aspect, aperture=0.0, focus_dist=10.0, time0=0.0, time1=1.0,
    )


def _cornell_walls(b: SceneBuilder, light_color, light_rect) -> None:
    red = b.lambertian_color((0.65, 0.05, 0.05))
    white = b.lambertian_color((0.73, 0.73, 0.73))
    green = b.lambertian_color((0.12, 0.45, 0.15))
    light = b.diffuse_light_color(light_color)
    b.rect_yz(0.0, 555.0, 0.0, 555.0, 555.0, True, green)
    b.rect_yz(0.0, 555.0, 0.0, 555.0, 0.0, False, red)
    b.rect_xz(*light_rect, False, light)
    b.rect_xz(0.0, 555.0, 0.0, 555.0, 555.0, True, white)
    b.rect_xz(0.0, 555.0, 0.0, 555.0, 0.0, False, white)
    b.rect_xy(0.0, 555.0, 0.0, 555.0, 555.0, True, white)


_BOX1_XFORM = lambda: affine_from_rotation_y_translation(-18.0, (130.0, 0.0, 65.0))
_BOX2_XFORM = lambda: affine_from_rotation_y_translation(15.0, (265.0, 0.0, 295.0))


def cornell(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """Cornell box with two rotated boxes (src/presets.rs:373-458)."""
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))
    _cornell_walls(b, (15.0, 15.0, 15.0), (213.0, 343.0, 227.0, 332.0, 554.0))
    white = b.lambertian_color((0.73, 0.73, 0.73))
    b.box((0.0, 0.0, 0.0), (165.0, 165.0, 165.0), white, _BOX1_XFORM())
    b.box((0.0, 0.0, 0.0), (165.0, 330.0, 165.0), white, _BOX2_XFORM())
    b.sky = (0.0, 0.0, 0.0)
    return b.finish(), _cornell_camera(aspect)


def cornell_smoke(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """Cornell box with smoke/fog media boxes (src/presets.rs:460-553)."""
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))
    _cornell_walls(b, (7.0, 7.0, 7.0), (113.0, 443.0, 127.0, 432.0, 554.0))
    b.medium_box(
        (0.0, 0.0, 0.0), (165.0, 165.0, 165.0), 0.01,
        b.constant_texture((1.0, 1.0, 1.0)), _BOX1_XFORM(),
    )
    b.medium_box(
        (0.0, 0.0, 0.0), (165.0, 330.0, 165.0), 0.01,
        b.constant_texture((0.0, 0.0, 0.0)), _BOX2_XFORM(),
    )
    b.sky = (0.0, 0.0, 0.0)
    return b.finish(), _cornell_camera(aspect)


def _procedural_earth_image(size: int = 256, seed: int = 7) -> np.ndarray:
    """Deterministic stand-in for media/earthmap.jpg.

    The reference loads an image file that is NOT in its repository
    (src/presets.rs:583 would panic); we synthesize a continent-ish texture
    from value noise so the preset runs out of the box.
    """
    rng = np.random.default_rng(seed)
    h, w = size, size * 2
    # smooth multi-octave value noise
    acc = np.zeros((h, w), np.float32)
    for octave in range(4):
        n = 2 ** (octave + 2)
        coarse = rng.random((n, n + n)).astype(np.float32)
        yy = np.linspace(0, n - 1, h, dtype=np.float32)
        xx = np.linspace(0, 2 * n - 1, w, dtype=np.float32)
        y0 = np.floor(yy).astype(int)
        x0 = np.floor(xx).astype(int)
        fy = (yy - y0)[:, None]
        fx = (xx - x0)[None, :]
        y1 = np.minimum(y0 + 1, n - 1)
        x1 = np.minimum(x0 + 1, 2 * n - 1)
        v = (
            coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + coarse[np.ix_(y1, x0)] * fy * (1 - fx)
            + coarse[np.ix_(y0, x1)] * (1 - fy) * fx
            + coarse[np.ix_(y1, x1)] * fy * fx
        )
        acc += v * (0.5 ** octave)
    acc /= acc.max()
    land = acc > 0.55
    img = np.empty((h, w, 3), np.float32)
    img[..., 0] = np.where(land, 0.35 + 0.3 * acc, 0.05)
    img[..., 1] = np.where(land, 0.45 + 0.3 * acc, 0.15 + 0.2 * acc)
    img[..., 2] = np.where(land, 0.25, 0.45 + 0.3 * acc)
    return img


def earth(aspect: float, seed: int = 0, image_path: str = None) -> Tuple[Scene, Camera]:
    """Image-textured globe (src/presets.rs:555-593).

    ``image_path``: optional user-supplied PNG (the reference loads
    ``media/earthmap.jpg`` at runtime — a file its repo doesn't ship);
    defaults to the synthesized stand-in so the preset runs out of the box.
    """
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))
    tex = b.image_texture(image_path if image_path else _procedural_earth_image())
    b.sphere((0.0, 0.0, 0.0), 2.0, b.lambertian(tex))
    return b.finish(), _standard_camera(aspect, time1=0.0, aperture=0.0)


def smallpt(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """smallpt's sphere-walled Cornell box (src/presets.rs:853-930)."""
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))
    b.sphere((1e3 + 1.0, 40.8, 81.6), 1e3, b.lambertian_color((0.75, 0.25, 0.25)))
    b.sphere((-1e3 + 99.0, 40.8, 81.6), 1e3, b.lambertian_color((0.25, 0.25, 0.75)))
    b.sphere((50.0, 40.8, 1e3), 1e3, b.lambertian_color((0.75, 0.75, 0.75)))
    b.sphere((50.0, 1e3, 81.6), 1e3, b.lambertian_color((0.75, 0.75, 0.75)))
    b.sphere((50.0, -1e3 + 81.6, 81.6), 1e3, b.lambertian_color((0.75, 0.75, 0.75)))
    b.sphere((27.0, 16.5, 47.0), 16.5, b.metal((0.999, 0.999, 0.999), 0.0))
    b.sphere((73.0, 16.5, 78.0), 16.5, b.dielectric(1.5))
    b.sphere((50.0, 81.6 - 16.5, 81.6), 1.5, b.diffuse_light_color((400.0, 400.0, 400.0)))
    b.sky = (0.0, 0.0, 0.0)
    cam = make_camera(
        (50.0, 52.0, 295.6), (50.0, 33.0, 0.0), (0.0, 1.0, 0.0), 30.0, aspect,
        aperture=0.05, focus_dist=100.0, time0=0.0, time1=1.0,
    )
    return b.finish(), cam


def final(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """'final' preset — a stub in the reference too (src/presets.rs:40-71):
    empty world, standard camera."""
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))
    return b.finish(), _standard_camera(aspect)


def final_full(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """The COMPLETED 'Next Week' final scene the reference abandoned.

    Reference ``src/presets.rs:40-71`` creates the white/ground materials
    of this scene and returns an empty world; this builds the whole thing
    (every subsystem in one scene): a 20x20 field of random-height ground
    boxes, the big ceiling light, a motion-blurred sphere, glass and fuzzy
    metal spheres, a subsurface glass ball (dielectric boundary + dense
    interior medium), whole-scene fog (a 5000-radius boundary medium), the
    image-textured earth, a Perlin marble ball, and a rotated cluster of
    1000 small white spheres.
    """
    rng = np.random.default_rng(seed)
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))

    ground = b.lambertian_color((0.48, 0.83, 0.53))
    for i in range(20):
        for j in range(20):
            w = 100.0
            x0, z0 = -1000.0 + i * w, -1000.0 + j * w
            y1 = 1.0 + 100.0 * rng.random()
            b.box((x0, 0.0, z0), (x0 + w, y1, z0 + w), ground)

    b.rect_xz(123.0, 423.0, 147.0, 412.0, 554.0, False,
              b.diffuse_light_color((7.0, 7.0, 7.0)))

    c0 = np.array([400.0, 400.0, 200.0], np.float32)
    b.moving_sphere(c0, c0 + np.array([30.0, 0.0, 0.0], np.float32),
                    0.0, 1.0, 50.0, b.lambertian_color((0.7, 0.3, 0.1)))
    b.sphere((260.0, 150.0, 45.0), 50.0, b.dielectric(1.5))
    b.sphere((0.0, 150.0, 145.0), 50.0, b.metal((0.8, 0.8, 0.9), 1.0))

    # subsurface ball: glass boundary + dense blue interior medium
    b.sphere((360.0, 150.0, 145.0), 70.0, b.dielectric(1.5))
    b.medium_sphere((360.0, 150.0, 145.0), 70.0, 0.2,
                    b.constant_texture((0.2, 0.4, 0.9)))
    # whole-scene haze
    b.medium_sphere((0.0, 0.0, 0.0), 5000.0, 1e-4,
                    b.constant_texture((1.0, 1.0, 1.0)))

    b.sphere((400.0, 200.0, 400.0), 100.0,
             b.lambertian(b.image_texture(_procedural_earth_image())))
    b.sphere((220.0, 280.0, 300.0), 80.0,
             b.lambertian(b.noise_texture(0.1)))

    # 1000-sphere cluster: the book rotates/translates an instance; spheres
    # are rotation-invariant, so the transform is baked into the centers
    white = b.lambertian_color((0.73, 0.73, 0.73))
    pts = rng.random((1000, 3)).astype(np.float32) * 165.0
    th = np.deg2rad(15.0)
    rot = np.array([[np.cos(th), 0.0, np.sin(th)],
                    [0.0, 1.0, 0.0],
                    [-np.sin(th), 0.0, np.cos(th)]], np.float32)
    pts = pts @ rot.T + np.array([-100.0, 270.0, 395.0], np.float32)
    for p in pts:
        b.sphere(p, 10.0, white)

    b.sky = (0.0, 0.0, 0.0)
    cam = make_camera(
        (478.0, 278.0, -600.0), (278.0, 278.0, 0.0), (0.0, 1.0, 0.0), 40.0,
        aspect, aperture=0.0, focus_dist=10.0, time0=0.0, time1=1.0,
    )
    return b.finish(pad_multiple=128, spatial_sort=True), cam


def aras(aspect: float, seed: int = 0) -> Tuple[Scene, Camera]:
    """Aras Pranckevicius's ToyPathTracer scene (reference ``src/presets.rs:
    595-851``, shipped commented-out): 46 spheres — a big gray ground ball,
    a mixed foreground group, a glass ball, two bright emissives, and four
    9-sphere rows sweeping grayscale/colored lambertian and mirror metals.
    """
    b = SceneBuilder(perlin_rng=np.random.default_rng(seed))

    b.sphere((0.0, -100.5, -1.0), 100.0, b.lambertian_color((0.8, 0.8, 0.8)))
    b.sphere((2.0, 0.0, -1.0), 0.5, b.lambertian_color((0.8, 0.4, 0.4)))
    b.sphere((0.0, 0.0, -1.0), 0.5, b.lambertian_color((0.4, 0.8, 0.4)))
    b.sphere((-2.0, 0.0, -1.0), 0.5, b.metal((0.4, 0.4, 0.8), 0.0))
    b.sphere((2.0, 0.0, 1.0), 0.5, b.metal((0.4, 0.8, 0.4), 0.0))
    b.sphere((0.0, 0.0, 1.0), 0.5, b.metal((0.4, 0.8, 0.4), 0.2))
    b.sphere((-2.0, 0.0, 1.0), 0.5, b.metal((0.4, 0.8, 0.4), 0.6))
    b.sphere((0.5, 1.0, 0.5), 0.5, b.dielectric(1.5))
    b.sphere((-1.5, 1.5, 0.0), 0.3,
             b.diffuse_light_color((30.0, 25.0, 15.0)))

    # four 9-sphere rows, x = 4..-4 at z = -3/-4/-5/-6
    grays = [(0.1 * g,) * 3 for g in range(1, 10)]
    hues = [(0.8, 0.1, 0.1), (0.8, 0.5, 0.1), (0.8, 0.8, 0.1),
            (0.4, 0.8, 0.1), (0.1, 0.8, 0.1), (0.1, 0.8, 0.5),
            (0.1, 0.8, 0.8), (0.1, 0.1, 0.8), (0.5, 0.1, 0.8)]
    for i, x in enumerate(range(4, -5, -1)):
        b.sphere((x, 0.0, -3.0), 0.5, b.lambertian_color(grays[i]))
        b.sphere((x, 0.0, -4.0), 0.5, b.metal(grays[i], 0.0))
        b.sphere((x, 0.0, -5.0), 0.5, b.metal(hues[i], 0.0))
        # the z=-6 row is lambertian except its final (x=-4) metal sphere
        mat = (b.metal(hues[i], 0.0) if x == -4
               else b.lambertian_color(hues[i]))
        b.sphere((x, 0.0, -6.0), 0.5, mat)

    b.sphere((1.5, 1.5, -2.0), 0.3, b.diffuse_light_color((3.0, 10.0, 20.0)))

    cam = make_camera(
        (0.0, 2.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 60.0,
        aspect, aperture=0.02, focus_dist=3.0, time0=0.0, time1=1.0,
    )
    return b.finish(), cam


_REGISTRY: Dict[str, PresetFn] = {
    "random": random,
    "random_spheres": random_spheres,
    "random_spheres_xl": random_spheres_xl,
    "small": small,
    "smallpt": smallpt,
    "cornell": cornell,
    "cornell_smoke": cornell_smoke,
    "two_perlin_spheres": two_perlin_spheres,
    "simple_light": simple_light,
    "earth": earth,
    "final": final,
    "final_full": final_full,
    "aras": aras,
}


def names():
    return sorted(_REGISTRY)


def from_name(name: str, aspect: float, seed: int = 0,
              image_path: str = None) -> Optional[Tuple[Scene, Camera]]:
    """Preset registry lookup (reference src/presets.rs:13-38).

    ``image_path`` feeds presets with image textures (``earth``)."""
    fn = _REGISTRY.get(name)
    if fn is None:
        return None
    if name == "earth" and image_path:
        return fn(aspect, seed=seed, image_path=image_path)
    return fn(aspect, seed=seed)
