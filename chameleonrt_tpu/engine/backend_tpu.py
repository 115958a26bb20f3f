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
        # want_host: the BVH builds from the host-side triangle arrays —
        # reading them back from the device costs ~20 s/array through the
        # axon tunnel (measured 96 s of a 99 s set_scene).
        # The CPU-bound native SAH build starts on a worker thread the
        # moment the host triangle arrays exist (ctypes releases the
        # GIL), overlapping the tunnel-bound uploads + device assembly:
        # set_scene ~ max(build, upload) instead of build + upload
        # (VERDICT r4 #4). CHAMELEONRT_BLAS_OVERLAP=0 restores the
        # serial order.
        import concurrent.futures as cf
        import os

        from chameleonrt_tpu.engine.trace_bvh import prebuild_blas_native

        overlap = os.environ.get("CHAMELEONRT_BLAS_OVERLAP", "1") not in (
            "0", "false", "off",
        )
        fut = {}
        ex = cf.ThreadPoolExecutor(max_workers=1)
        try:
            def cb(v0, e1, e2, ranges):
                fut["blas"] = ex.submit(
                    prebuild_blas_native, v0, e1, e2, ranges,
                    len(scene.instances),
                )

            flat, meta, host_tris = build_device_scene(
                scene, want_host=True, host_tris_cb=cb if overlap else None
            )
            prebuilt = fut["blas"].result() if "blas" in fut else None
            flat = flat._replace(
                blas=build_blas_set(flat, meta, host_tris, prebuilt=prebuilt)
            )
            flat = flat._replace(
                inst_aabb=compute_instance_aabbs(flat, meta, host_tris)
            )
            return flat, meta
        finally:
            ex.shutdown(wait=False)

    def make_trace_fns(self, meta):
        return make_trace_fns(meta)
