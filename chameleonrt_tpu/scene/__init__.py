from chameleonrt_tpu.scene.types import (  # noqa: F401
    Camera,
    ColorSpace,
    DisneyMaterial,
    Geometry,
    Image,
    Instance,
    MaterialMode,
    Mesh,
    ParameterizedMesh,
    QuadLight,
    Scene,
)
from chameleonrt_tpu.scene.loader import load_scene  # noqa: F401
