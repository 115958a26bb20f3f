"""BVH-accelerated scene traversal: per-mesh packed BLAS + instance loop.

The traversal layer of the flagship TPU backend (SURVEY.md §7 steps 3-4):
each mesh's triangle range gets an on-device LBVH (BLAS) fused into the
gather-optimized PackedBvh layout; rays are transformed into each instance's
object space and traverse that BLAS with the lockstep wavefront kernel in
ops/traverse. Closest hits across instances merge by t (the object-space
parameterization preserves world t).

For the common single-instance case (e.g. every OBJ scene,
reference util/scene.cpp:182-186) the loop collapses to one BLAS traversal.
A BVH TLAS over instance world AABBs is the planned upgrade for scenes with
many instances.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from chameleonrt_tpu.engine.device_scene import FlatScene, SceneMeta
from chameleonrt_tpu.ops.intersect import Hit, T_MAX
from chameleonrt_tpu.ops.lbvh import PackedBvh, build_bvh, pack_bvh, triangle_aabbs
from chameleonrt_tpu.ops.math import EPSILON, transform_point, transform_vector
from chameleonrt_tpu.ops.traverse import traverse_any_blocked, traverse_closest_blocked


def _bucket_size(n: int) -> int:
    """Round a triangle count up to a bucketed size (~12.5% granularity) so
    the jitted BVH build compiles once per bucket instead of once per mesh —
    fresh compiles through the TPU tunnel run minutes each, so a multi-mesh
    glTF would otherwise pay one per distinct mesh size
    (SURVEY.md §7 'pad to bucketed sizes')."""
    if n <= 256:
        return 256
    step = max(1 << (n.bit_length() - 4), 1)
    return ((n + step - 1) // step) * step


def build_blas_set(flat: FlatScene, meta: SceneMeta) -> Tuple[PackedBvh, ...]:
    """Build one packed LBVH per mesh over its triangle range (the set_scene
    BLAS-build phase, reference render_optix.cpp:134-172, minus vendor
    APIs). Leaf prim ids are LOCAL to the mesh range.

    Triangle ranges are padded to bucketed sizes with duplicates of the last
    triangle (harmless: a padded hit reports a prim id that the caller clamps
    back onto the identical real triangle)."""

    @jax.jit
    def build(v0, e1, e2):
        tmin, tmax = triangle_aabbs(v0, e1, e2)
        bvh = build_bvh(tmin, tmax)
        return pack_bvh(bvh, v0, e1, e2)

    blas = []
    for start, count in meta.mesh_tri_ranges:
        padded = _bucket_size(count)
        idx = jnp.minimum(jnp.arange(padded), count - 1) + start
        v0 = flat.tri_v0[idx]
        e1 = flat.tri_e1[idx]
        e2 = flat.tri_e2[idx]
        blas.append(jax.block_until_ready(build(v0, e1, e2)))
    return tuple(blas)


def make_trace_fns(meta: SceneMeta):
    """(trace_closest, trace_any) using per-mesh BLAS traversal with a
    statically unrolled instance loop. The packed BVHs ride in flat.blas
    (jit arguments, not closure constants — see FlatScene.blas)."""

    def _object_rays(flat: FlatScene, inst_id: int, orig, dir):
        inv = flat.inst_inv[inst_id]
        return (
            transform_point(inv[None], orig),
            transform_vector(inv[None], dir),
        )

    def trace_closest(flat: FlatScene, orig, dir, t_min, active):
        best = Hit.none(orig.shape[:1])
        for inst_id, mesh_id in enumerate(meta.inst_mesh):
            start, count = meta.mesh_tri_ranges[mesh_id]
            if count == 0:
                continue
            o, d = _object_rays(flat, inst_id, orig, dir)
            t, prim, u, v = traverse_closest_blocked(
                flat.blas[mesh_id],
                o,
                d,
                jnp.broadcast_to(jnp.float32(t_min), o.shape[:1]),
                active,
                t_max=best.t,
            )
            found = prim >= 0
            cand = Hit(
                t=jnp.where(found, t, T_MAX),
                # clamp: padded duplicates of the last triangle map back
                # onto the real one (see build_blas_set bucketing)
                tri=jnp.where(found, jnp.minimum(prim, count - 1) + start, -1),
                inst=jnp.where(found, inst_id, -1),
                u=u,
                v=v,
            )
            best = best.merge(cand)
        return Hit(
            t=jnp.where(active, best.t, T_MAX),
            tri=jnp.where(active, best.tri, -1),
            inst=jnp.where(active, best.inst, -1),
            u=best.u,
            v=best.v,
        )

    def trace_any(flat: FlatScene, orig, dir, t_max, mask):
        occluded = jnp.zeros(orig.shape[:1], bool)
        for inst_id, mesh_id in enumerate(meta.inst_mesh):
            start, count = meta.mesh_tri_ranges[mesh_id]
            if count == 0:
                continue
            o, d = _object_rays(flat, inst_id, orig, dir)
            occluded = occluded | traverse_any_blocked(
                flat.blas[mesh_id],
                o,
                d,
                jnp.broadcast_to(jnp.float32(EPSILON), o.shape[:1]),
                t_max,
                mask & ~occluded,
            )
        return occluded & mask

    return trace_closest, trace_any
