"""Brute-force scene traversal: all-triangles intersection per instance.

The correctness oracle for BVH traversal (SURVEY.md §4, §7 step 2): plays the
role the Embree CPU backend plays for the reference's GPU backends. Rays are
transformed into each instance's object space (the parameterization preserves
t, so world-space closest-hit compares directly across instances), intersected
against that mesh's triangle range, and the nearest hit wins.
"""

from __future__ import annotations

import jax.numpy as jnp

from chameleonrt_tpu.engine.device_scene import FlatScene, SceneMeta
from chameleonrt_tpu.ops.intersect import (
    Hit,
    T_MAX,
    brute_force_any,
    brute_force_closest,
)
from chameleonrt_tpu.ops.math import EPSILON, transform_point, transform_vector


def _instance_rays(flat: FlatScene, inst_id: int, orig, dir):
    inv = flat.inst_inv[inst_id]
    o = transform_point(inv[None], orig)
    d = transform_vector(inv[None], dir)
    return o, d


def make_trace_fns(meta: SceneMeta):
    """Build (trace_closest, trace_any) closures for this scene's static
    structure (instance list and per-mesh triangle ranges are unrolled)."""

    def trace_closest(flat: FlatScene, orig, dir, t_min, active):
        best = Hit.none(orig.shape[:1])
        for inst_id, mesh_id in enumerate(meta.inst_mesh):
            start, count = meta.mesh_tri_ranges[mesh_id]
            if count == 0:
                continue
            o, d = _instance_rays(flat, inst_id, orig, dir)
            t, tri, u, v = brute_force_closest(
                o,
                d,
                flat.tri_v0[start : start + count],
                flat.tri_e1[start : start + count],
                flat.tri_e2[start : start + count],
                t_min=t_min,
            )
            cand = Hit(
                t=t,
                tri=jnp.where(tri >= 0, tri + start, -1),
                inst=jnp.where(tri >= 0, inst_id, -1),
                u=u,
                v=v,
            )
            best = best.merge(cand)
        # Masked lanes report no hit
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
            o, d = _instance_rays(flat, inst_id, orig, dir)
            occluded = occluded | brute_force_any(
                o,
                d,
                flat.tri_v0[start : start + count],
                flat.tri_e1[start : start + count],
                flat.tri_e2[start : start + count],
                t_min=EPSILON,
                t_max=t_max,
            )
        return occluded & mask

    return trace_closest, trace_any
