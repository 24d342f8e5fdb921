"""AOV (arbitrary output variable) rendering: normals, albedo, depth.

Production-renderer feature with no reference analog: one primary-ray
intersection pass per pixel yields the geometry buffers that denoisers and
compositing pipelines expect (and that :mod:`render/denoise` uses as edge
guides). Cheap by construction — a single wavefront intersection, no bounce
loop.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from pathtrace_tpu.models.types import Scene, SceneFeatures
from pathtrace_tpu.ops import intersect as isect
from pathtrace_tpu.ops.texture import texture_value
from pathtrace_tpu.render.frame import generate_primary_rays


def render_aovs(
    scene: Scene,
    camera,
    width: int,
    height: int,
    key,
    features: SceneFeatures = None,
    samples: int = 1,
) -> Dict[str, jnp.ndarray]:
    """First-hit AOVs, averaged over ``samples`` jittered primaries.

    Returns a dict of [H, W, ...] arrays:
      * ``normal``: shading normal, zero where no hit
      * ``albedo``: first-hit texture color (lights return their emission
        color; media their phase albedo), sky color where no hit
      * ``depth``:  hit distance t (0 where no hit)
      * ``hit``:    hit-mask coverage in [0, 1]
    """
    features = features or SceneFeatures.from_scene(scene)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    kray, kmed = jax.random.split(key)
    ro, rd, time = generate_primary_rays(camera, width, height, samples, kray)
    R = height * width * samples
    ro, rd, time = ro.reshape(R, 3), rd.reshape(R, 3), time.reshape(R)

    med_u = None
    if features.has_media:
        med_u = jax.random.uniform(kmed, (R, scene.media.count))
    rec = isect.intersect_scene(scene, ro, rd, time, med_u, features=features)

    mats = scene.materials
    tex_id = mats.tex_id[rec.mat_id]
    safe_p = jnp.where(rec.hit[..., None], rec.point, jnp.zeros_like(rec.point))
    albedo = texture_value(scene, tex_id, rec.u, rec.v, safe_p,
                           features=features)
    from pathtrace_tpu.render.integrator import sky_color

    albedo = jnp.where(rec.hit[..., None], albedo, sky_color(scene, rd))
    normal = jnp.where(rec.hit[..., None], rec.normal,
                       jnp.zeros_like(rec.normal))
    depth = jnp.where(rec.hit, rec.t, 0.0)

    def avg(x):
        return x.reshape((height, width, samples) + x.shape[1:]).mean(axis=2)

    return {
        "normal": avg(normal),
        "albedo": avg(albedo),
        "depth": avg(depth),
        "hit": avg(rec.hit.astype(ro.dtype)),
    }


def save_aov_pngs(aovs: Dict[str, jnp.ndarray], out_prefix: str) -> None:
    """Write the AOV dict as PNGs next to ``out_prefix`` (driver hook)."""
    import numpy as np

    from pathtrace_tpu.render import film

    normal = (np.asarray(aovs["normal"]) * 0.5 + 0.5).clip(0.0, 1.0)
    film.save_frame_png(f"{out_prefix}.normal.png", normal ** 2.2)  # undo sRGB
    film.save_frame_png(f"{out_prefix}.albedo.png", np.asarray(aovs["albedo"]))
    d = np.asarray(aovs["depth"])
    dmax = d.max() or 1.0
    dn = (d / dmax)[..., None].repeat(3, axis=-1)
    film.save_frame_png(f"{out_prefix}.depth.png", dn ** 2.2)
