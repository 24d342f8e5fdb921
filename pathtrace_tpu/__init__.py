"""pathtrace_tpu — a TPU-native differentiable wavefront path tracer in JAX/Pallas.

A from-scratch re-design of the capabilities of ``bitshifter/pathtrace-rs``
(Shirley "Ray Tracing in One Weekend / The Next Week"): spheres, moving
spheres, axis-aligned rects, boxes, instanced transforms, constant-density
media, BVH, Lambertian/metal/dielectric/emissive/isotropic materials,
constant/checker/Perlin-noise/image textures, thin-lens camera with defocus
and motion blur, 10 preset scenes, progressive refinement, offline PNG
rendering and Mrays/s instrumentation — architected for TPUs:

* the reference's per-pixel recursive trace (reference ``src/scene.rs:49-71``)
  becomes a **wavefront** sweep: one big ``[R]`` ray-state array advanced by a
  bounded ``lax.while_loop`` over bounce depth with masked (dead) lanes and
  whole-wavefront early exit;
* its SSE/AVX SoA sphere kernel (``src/collision/spheres_soa.rs``) becomes a
  Pallas ``[ray-block x sphere-tile]`` intersection kernel on the VPU;
* its rayon pixel parallelism (``src/scene.rs:90``) becomes pixel/sample
  sharding over a ``jax.sharding.Mesh`` with ``psum`` reductions;
* its per-pixel Xoshiro seeds (``src/scene.rs:96-102``) become counter-based
  Threefry keyed by (pixel, frame, bounce);
* everything is differentiable: pixel gradients flow to sphere positions,
  radii, albedos, fuzz, IOR and emission.
"""

__version__ = "0.1.0"

# the render/ subpackage owns the name `render` at package scope, so the
# one-call facade exports as `render_image` (also `pathtrace_tpu.api.render`)
from pathtrace_tpu.api import preset_names  # noqa: F401
from pathtrace_tpu.api import render as render_image  # noqa: F401
from pathtrace_tpu.camera import make_camera  # noqa: F401
from pathtrace_tpu.config import Params  # noqa: F401
from pathtrace_tpu.models.build import SceneBuilder  # noqa: F401
