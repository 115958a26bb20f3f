"""The flagship `tpu` backend: LBVH wavefront path tracer.

set_scene flattens the scene and builds per-mesh LBVHs on device
(SURVEY.md §7 steps 3-4); render runs the shared wavefront algorithm with
the lockstep BVH traversal kernels. Single-chip here; the sharded multi-chip
variant lives in chameleonrt_tpu.parallel.
"""

from __future__ import annotations

from chameleonrt_tpu.engine.backend_base import JaxRenderBackend
from chameleonrt_tpu.engine.device_scene import build_device_scene
from chameleonrt_tpu.engine.trace_bvh import (
    build_blas_set,
    compute_instance_aabbs,
    make_trace_fns,
)
from chameleonrt_tpu.scene.types import Scene


class TpuBackend(JaxRenderBackend):
    @property
    def name(self) -> str:
        return "TPU wavefront (LBVH)"

    def prepare_scene(self, scene: Scene):
        flat, meta = build_device_scene(scene)
        flat = flat._replace(blas=build_blas_set(flat, meta))
        flat = flat._replace(inst_aabb=compute_instance_aabbs(flat, meta))
        return flat, meta

    def make_trace_fns(self, meta):
        return make_trace_fns(meta)
