"""ChameleonRT-TPU: a TPU-native interactive progressive Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ChameleonRT
(/root/reference): one shared scene/asset/CLI core plus interchangeable
ray-tracing backends implementing the identical rendering algorithm
(perspective camera -> path loop with Disney BSDF + MIS next-event estimation
on quad lights -> progressive accumulation).

Where the reference's backends wrap hardware RT APIs (Embree/OptiX/DXR/...),
this framework's flagship backend is a TPU wavefront engine: on-device LBVH
build from Morton codes, vectorized BVH traversal, fused Disney shading, and
sharded pixel wavefronts over a `jax.sharding.Mesh` for multi-chip scaling.
"""

__version__ = "0.1.0"

from chameleonrt_tpu.core.backend import RenderBackend, RenderStats  # noqa: F401
from chameleonrt_tpu.core.registry import get_backend, register_backend, list_backends  # noqa: F401
from chameleonrt_tpu.scene.types import (  # noqa: F401
    Camera,
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
