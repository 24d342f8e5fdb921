from pathtrace_tpu.models.types import (  # noqa: F401
    Scene,
    Spheres,
    Rects,
    Boxes,
    Media,
    Materials,
    Textures,
    PerlinTables,
    ImageAtlas,
    MAT_LAMBERTIAN,
    MAT_METAL,
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    TEX_CONSTANT,
    TEX_CHECKER,
    TEX_NOISE,
    TEX_IMAGE,
)
from pathtrace_tpu.models.build import SceneBuilder  # noqa: F401
from pathtrace_tpu.models import presets  # noqa: F401
