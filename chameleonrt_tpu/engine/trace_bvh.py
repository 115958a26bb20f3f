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
from chameleonrt_tpu.ops.lbvh import (
    BlasPair,
    PackedBvh,
    UnifiedBvh,
    UnifiedPair,
    build_bvh,
    pack_bvh,
    triangle_aabbs,
)
from chameleonrt_tpu.ops.math import EPSILON, transform_point, transform_vector
from chameleonrt_tpu.ops.traverse import (
    traverse_any_blocked,
    traverse_closest_blocked,
)
from chameleonrt_tpu.ops.traverse_packet import (
    packet_eligible,
    persistent_eligible,
    persistent_stream_eligible,
    traverse_any_packet,
    traverse_any_persistent,
    traverse_closest_packet,
    traverse_closest_persistent,
)
from chameleonrt_tpu.ops.traverse_slotlane import (
    slotlane_eligible,
    slotlane_stream_eligible,
    traverse_any_slotlane,
    traverse_closest_slotlane,
)


def _slotlane_enabled() -> bool:
    """Slot-lane group-barrier kernels (ops/traverse_slotlane.py) for FLAT
    scenes: full-density (S,K) vector work. Default ON where the packet
    kernels run — measured on the hall wavefronts (v5e, S=128 + leaf
    FIFO, net of readback): coherent closest 38.7 vs 58.5 ms (-34%),
    incoherent bounce 78.3 vs 114.8 ms (-32%) against the work-queue
    persistent kernels, 100.000% prim parity.
    Env CHAMELEONRT_SLOTLANE=0/1 overrides."""
    import os

    ov = os.environ.get("CHAMELEONRT_SLOTLANE")
    if ov is not None:
        return ov not in ("0", "false", "off")
    return _packet_enabled()


def _packet_enabled() -> bool:
    """Use the Pallas packet kernels when running on real TPU hardware
    (platform 'tpu' or the tunneled 'axon'). The XLA lockstep path remains
    the portable fallback (CPU tests, interpret-mode coverage lives in
    tests/test_traverse_packet.py). Env CHAMELEONRT_PACKET=0/1 overrides."""
    import os

    ov = os.environ.get("CHAMELEONRT_PACKET")
    if ov is not None:
        return ov not in ("0", "false", "off")
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _unified_persistent_enabled() -> bool:
    """Default ON wherever the packet kernels run (round 3). The round-2
    compiled-image divergence was root-caused to STALE CACHED LEAF ROWS
    surviving ray-space changes (ADVICE.md r2 #1): the leaf phase re-runs
    Moller-Trumbore unguarded on every slot's cached row, which is only
    idempotent within one ray space; after an object->world restore or a
    packet swap the old object-space triangles were tested against the new
    rays. Fixed by zero-poisoning the cached row on every ray-space change
    (_make_persistent_kernel); verified compiled-at-bench-scale 100.0000%
    prim/inst/t/occlusion match vs the XLA unified traversal on the 921K-ray
    instanced wavefront, 3.7x closest / 5.0x occlusion speedups
    (scripts/unified_check.py). Env CHAMELEONRT_UNIFIED_PERSISTENT=0
    disables."""
    import os

    ov = os.environ.get("CHAMELEONRT_UNIFIED_PERSISTENT")
    if ov is not None:
        return ov not in ("0", "false", "off")
    return _packet_enabled()


def _closest_table(pair):
    """Node table for closest-hit traversal: the wide (BVH4) table by
    default (round 3 A/B on the textured hall: 1138 vs 1326 ms/frame —
    4 children per row halve the row fetches per ray; note the saving does
    NOT extrapolate to BVH8, whose 256-byte rows double the fetched bytes
    and slab/sort work — see _wide_arity). 0.011% of pixels flip
    coincident-surface ties vs the binary descent order, the same class
    the cross-backend tolerance covers. Env CHAMELEONRT_CLOSEST_ARITY=2
    restores the binary table (the any slot shares the same leaf rows)."""
    import os

    if os.environ.get("CHAMELEONRT_CLOSEST_ARITY") == "2":
        return pair.closest
    return pair.any


def _wide_arity() -> int:
    """Children per wide node row for native SAH builds (the packet
    kernels' production table). Default 4: the BVH8 hypothesis (wider rows
    cut rows-touched per ray) was measured and REFUTED on the v5e hall
    (224K tris, 921K-ray wavefronts, gross packet ms closest/any —
    W4: 154/85, W8: 212/106 at leaf 4; 64-float rows double the fetched
    bytes and the slab+sort VPU work per iteration, and SAH binary
    collapse leaves many empty slots, outweighing the row-count saving).
    Env CHAMELEONRT_WIDE_ARITY=8 keeps the capability for re-measurement
    on other scenes/hardware."""
    import os

    try:
        w = int(os.environ.get("CHAMELEONRT_WIDE_ARITY", "4"))
    except ValueError:
        raise ValueError("CHAMELEONRT_WIDE_ARITY must be an integer") from None
    if w not in (4, 8):
        raise ValueError("CHAMELEONRT_WIDE_ARITY must be 4 or 8")
    return w


def _native_leaf_size() -> int:
    """Triangles per leaf row for native SAH builds. Default 4: measured
    on the v5e hall (gross packet ms closest/any at W=4 — leaf4: 154/85,
    leaf8: 171/90; fatter leaves fetch more bytes per leaf visit than the
    saved visits return). Env CHAMELEONRT_LEAF_SIZE overrides. The
    on-device LBVH fallback keeps lbvh.LEAF_SIZE."""
    import os

    try:
        s = int(os.environ.get("CHAMELEONRT_LEAF_SIZE", "4"))
    except ValueError:
        raise ValueError("CHAMELEONRT_LEAF_SIZE must be an integer") from None
    if not (2 <= s <= 12):
        raise ValueError("CHAMELEONRT_LEAF_SIZE must be in [2, 12]")
    return s


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


def _pad_rows(a, n: int):
    """Pad a 2D array to n rows with zeros. Padded BVH rows are never
    referenced (no child pointer reaches them); padding exists only so the
    render graph compiles once per bucketed shape instead of once per exact
    mesh size."""
    import numpy as np

    if a.shape[0] >= n:
        return a
    return np.pad(a, ((0, n - a.shape[0]), (0, 0)))


def prebuild_blas_native(v0, e1, e2, mesh_ranges, n_instances):
    """Run the native SAH builds for every mesh range — the CPU-bound
    part of build_blas_set, split out so backend set_scene can run it on
    a worker thread concurrently with the device uploads (the ctypes
    call releases the GIL). Returns the per-range native results for
    build_blas_set(prebuilt=...), or None when the native lib is
    unavailable (callers fall back to the normal path)."""
    from chameleonrt_tpu import native

    if native.get_lib() is None:
        return None
    out = []
    for start, count in mesh_ranges:
        if count == 0:
            out.append(None)
            continue
        kw = dict(wide_arity=_wide_arity())
        if n_instances <= 1:
            kw["pad_to"] = _bucket_size
        out.append(
            native.build_bvh_pair_native(
                v0[start : start + count],
                e1[start : start + count],
                e2[start : start + count],
                _native_leaf_size(),
                **kw,
            )
        )
    return out


def build_blas_set(
    flat: FlatScene, meta: SceneMeta, host_tris=None, prebuilt=None
) -> Tuple[BlasPair, ...]:
    """Build one packed BVH pair per mesh over its triangle range (the
    set_scene BLAS-build phase, reference render_optix.cpp:134-172, minus
    vendor APIs). Leaf prim ids are LOCAL to the mesh range.

    Default path: host-side native binned-SAH build (native/bvhbuilder.cpp —
    the role of rtcCommitScene's SAH build, embree_utils.cpp:63-83) + one
    upload, emitting BOTH the binary layout (closest-hit) and the collapsed
    BVH4 layout (occlusion) from the same tree; no device compile at all,
    and stack need is certified below the traversal stack. Fallback (native
    lib unavailable): on-device LBVH, binary layout for both slots.

    Row counts / triangle ranges are padded to bucketed sizes so the render
    graph compiles once per bucket instead of once per mesh size — fresh
    compiles through the TPU tunnel run minutes each.

    host_tris: optional host-side (v0, e1, e2) numpy triple from
    build_device_scene(want_host=True). Without it the triangles are read
    back from the device — ~20 s per array through the axon tunnel, so
    every perf-relevant caller must pass it."""
    import numpy as np

    from chameleonrt_tpu import native

    if meta.num_instances > 1:
        unified = build_unified_set(flat, meta, host_tris, prebuilt=prebuilt)
        if unified is not None:
            return (unified,)

    build_jit = None
    blas = []
    for mesh_i, (start, count) in enumerate(meta.mesh_tri_ranges):
        if native.get_lib() is not None and count > 0:
            if prebuilt is not None:
                res = prebuilt[mesh_i]
            else:
                if host_tris is None:
                    host_tris = (
                        np.asarray(flat.tri_v0),
                        np.asarray(flat.tri_e1),
                        np.asarray(flat.tri_e2),
                    )
                res = native.build_bvh_pair_native(
                    host_tris[0][start : start + count],
                    host_tris[1][start : start + count],
                    host_tris[2][start : start + count],
                    _native_leaf_size(),
                    wide_arity=_wide_arity(),
                    pad_to=_bucket_size,
                )
            if res is not None:
                nodes2, nodes4, leaf_rows, depth2, stack4 = res
                leaf_rows = jnp.asarray(leaf_rows)
                blas.append(
                    BlasPair(
                        closest=PackedBvh(
                            nodes=jnp.asarray(nodes2),
                            leaf_rows=leaf_rows,
                            max_depth=depth2,
                        ),
                        any=PackedBvh(
                            nodes=jnp.asarray(nodes4),
                            leaf_rows=leaf_rows,
                            max_depth=stack4,
                        ),
                    )
                )
                continue

        if build_jit is None:

            @jax.jit
            def build_jit(v0, e1, e2):
                tmin, tmax = triangle_aabbs(v0, e1, e2)
                bvh = build_bvh(tmin, tmax)
                return pack_bvh(bvh, v0, e1, e2)

        padded = _bucket_size(count)
        idx = jnp.minimum(jnp.arange(padded), count - 1) + start
        v0 = flat.tri_v0[idx]
        e1 = flat.tri_e1[idx]
        e2 = flat.tri_e2[idx]
        packed = jax.block_until_ready(build_jit(v0, e1, e2))
        blas.append(BlasPair(closest=packed, any=packed))
    return tuple(blas)


def _rebase_codes(nodes: "np.ndarray", arity: int, node_off: int, leaf_map):
    """Rebase child codes of a packed node table in place: internal codes
    shift by node_off; leaf codes c < 0 map through leaf_map(leaf_id)."""
    import numpy as np

    cols = slice(12, 14) if arity == 2 else slice(6 * arity, 7 * arity)
    codes = nodes[:, cols].view(np.int32)
    internal = codes >= 0
    codes[internal] += node_off
    leaves = ~internal
    codes[leaves] = leaf_map(-codes[leaves] - 1)
    nodes[:, cols] = codes.view(np.float32)


def build_unified_set(flat: FlatScene, meta: SceneMeta, host_tris=None,
                      prebuilt=None):
    """Assemble the two-level UnifiedBvh pair for a multi-instance scene:
    native SAH BLAS per mesh + native SAH TLAS over instance world AABBs
    (leaf_size=1, built over degenerate 'box triangles'), all fused into
    one node table + one leaf table per traversal kind. Returns a
    UnifiedPair, or None when the native builder is unavailable (callers
    fall back to the unrolled per-instance loop). Role: the reference's
    TopLevelBVH build (embree_utils.cpp:121-136, render_optix.cpp:216-225)."""
    import numpy as np

    from chameleonrt_tpu import native
    if native.get_lib() is None:
        return None

    LEAF_SIZE = _native_leaf_size()
    WIDE = _wide_arity()

    if host_tris is not None:
        v0, e1, e2 = host_tris[:3]
    else:
        v0 = np.asarray(flat.tri_v0)
        e1 = np.asarray(flat.tri_e1)
        e2 = np.asarray(flat.tri_e2)

    # --- per-mesh BLAS builds
    mesh_parts = []  # (nodes2, nodes4, leaf_rows, depth2, stack4)
    for mesh_i, (start, count) in enumerate(meta.mesh_tri_ranges):
        if count == 0:
            mesh_parts.append(None)
            continue
        if prebuilt is not None:
            res = prebuilt[mesh_i]
        else:
            res = native.build_bvh_pair_native(
                v0[start : start + count],
                e1[start : start + count],
                e2[start : start + count],
                LEAF_SIZE,
                wide_arity=WIDE,
            )
        if res is None:
            return None
        nodes2, nodes4, leaf_rows, depth2, stack4 = res
        leaf_rows = leaf_rows.copy()
        # globalize triangle ids
        ids = leaf_rows[:, 9 * LEAF_SIZE : 10 * LEAF_SIZE].view(np.int32)
        ids[ids >= 0] += start
        mesh_parts.append((nodes2.copy(), nodes4.copy(), leaf_rows, depth2, stack4))

    # --- concatenate BLAS tables with offsets
    out = {}
    I = meta.num_instances
    leaf_rows_cat = []
    leaf_off = []
    off = 0
    for part in mesh_parts:
        leaf_off.append(off)
        if part is not None:
            leaf_rows_cat.append(part[2])
            off += part[2].shape[0]
    n_tri_leaves = off

    # instance AABBs from per-mesh root boxes pushed through transforms
    from chameleonrt_tpu.engine.device_scene import HostScene

    if isinstance(host_tris, HostScene):
        inst_tf = host_tris.inst_transform
        inst_inv = host_tris.inst_inv
    else:
        inst_tf = np.asarray(flat.inst_transform)
        inst_inv = np.asarray(flat.inst_inv)
    inst_aabb = np.zeros((I, 6), np.float32)
    for i, mesh_id in enumerate(meta.inst_mesh):
        part = mesh_parts[mesh_id]
        root = part[0][0]
        lo = np.minimum(root[0:3], root[6:9])
        hi = np.maximum(root[3:6], root[9:12])
        lo = np.where(np.isfinite(lo), lo, np.minimum(root[0:3], root[3:6]))
        hi = np.where(np.isfinite(hi), hi, np.maximum(root[0:3], root[3:6]))
        corners = np.array(
            [
                [x, y, z]
                for x in (lo[0], hi[0])
                for y in (lo[1], hi[1])
                for z in (lo[2], hi[2])
            ],
            np.float32,
        )
        m = inst_tf[i]
        wc = corners @ m[:3, :3].T + m[:3, 3]
        inst_aabb[i, 0:3] = wc.min(axis=0)
        inst_aabb[i, 3:6] = wc.max(axis=0)

    # instance-entry leaf rows (appended after all triangle leaves)
    ent = np.zeros((I, 10 * LEAF_SIZE), np.float32)
    # poison the prim-id slots with -1 bits: Moller-Trumbore on an entry
    # row can then never report a hit (prim >= 0 is part of the hit test),
    # so kernels may run the triangle interpretation over entry rows
    # unguarded (the packet kernels rely on this; the XLA path gates by
    # is_tri anyway)
    ent[:, 9 * LEAF_SIZE : 10 * LEAF_SIZE].view(np.int32)[:] = -1
    for i, mesh_id in enumerate(meta.inst_mesh):
        ent[i, 0:12] = inst_inv[i][:3, :].reshape(12)
        ent[i, 13] = np.int32(i).view(np.float32)
    # ent[:, 12] (BLAS root) is filled per arity below

    # TLAS over instance boxes: degenerate triangles v0=lo, e1=hi-lo, e2=0
    tres = native.build_bvh_pair_native(
        inst_aabb[:, 0:3],
        inst_aabb[:, 3:6] - inst_aabb[:, 0:3],
        np.zeros((I, 3), np.float32),
        1,
        wide_arity=WIDE,
    )
    if tres is None:
        return None
    tnodes2, tnodes4, tleaf, tdepth2, tstack4 = tres
    tleaf_inst = tleaf[:, 9].view(np.int32)  # TLAS leaf k -> instance id

    for arity, nsel, tnodes, tstack in (
        (2, 0, tnodes2.copy(), tdepth2),
        (WIDE, 1, tnodes4.copy(), tstack4),
    ):
        node_cat = []
        node_off = []
        off = 0
        for mi, part in enumerate(mesh_parts):
            node_off.append(off)
            if part is not None:
                tbl = part[nsel].copy()
                # rebase this mesh's child codes into the unified namespace
                _rebase_codes(
                    tbl,
                    arity,
                    off,
                    lambda leaf_ids, base=leaf_off[mi]: -(leaf_ids + base) - 1,
                )
                node_cat.append(tbl)
                off += tbl.shape[0]
        tlas_lo = off

        # rebase TLAS codes: internals shift to tlas_lo; leaves -> instance
        # entries at n_tri_leaves + instance id
        def tlas_leaf_map(leaf_ids):
            import numpy as np

            inst = tleaf_inst[leaf_ids]
            return -(n_tri_leaves + inst) - 1

        _rebase_codes(tnodes, arity, tlas_lo, tlas_leaf_map)

        nodes_all = np.concatenate(node_cat + [tnodes], axis=0)
        ent_a = ent.copy()
        for i, mesh_id in enumerate(meta.inst_mesh):
            ent_a[i, 12] = np.int32(node_off[mesh_id]).view(np.float32)
        leaf_all = np.concatenate(leaf_rows_cat + [ent_a], axis=0)

        blas_depth = max(p[3] if arity == 2 else p[4] for p in mesh_parts if p)
        stack_bound = int(tstack) + int(blas_depth) + 2

        out[arity] = UnifiedBvh(
            nodes=jnp.asarray(_pad_rows(nodes_all, _bucket_size(nodes_all.shape[0]))),
            leaf_rows=jnp.asarray(
                _pad_rows(leaf_all, _bucket_size(leaf_all.shape[0]))
            ),
            n_tri_leaves=n_tri_leaves,
            tlas_lo=tlas_lo,
            stack_bound=stack_bound,
        )

    return UnifiedPair(
        closest=out[2], any=out[WIDE], inst_aabb=jnp.asarray(inst_aabb)
    )


def compute_instance_aabbs(
    flat: FlatScene, meta: SceneMeta, host_tris=None
) -> jnp.ndarray:
    """World-space AABB per instance (I, 6): the mesh bound (BLAS root box)
    pushed through the instance transform via its 8 corners. Used for
    per-ray instance culling.

    With host_tris (the numpy triple from build_device_scene) the mesh
    bounds come from the host triangles — identical to the BLAS root box
    and avoids a per-mesh device readback + slice-op compile (~3 s through
    the axon tunnel even for one row)."""
    import numpy as np

    if flat.blas and isinstance(flat.blas[0], UnifiedPair):
        return flat.blas[0].inst_aabb

    out = np.zeros((meta.num_instances, 6), np.float32)
    if host_tris is not None:
        v0, e1, e2 = host_tris[:3]
        mesh_box = {}
        for mesh_id, (start, count) in enumerate(meta.mesh_tri_ranges):
            if count == 0:
                mesh_box[mesh_id] = (np.zeros(3, np.float32), np.zeros(3, np.float32))
                continue
            a = v0[start : start + count]
            b = a + e1[start : start + count]
            c = a + e2[start : start + count]
            lo = np.minimum(np.minimum(a.min(0), b.min(0)), c.min(0))
            hi = np.maximum(np.maximum(a.max(0), b.max(0)), c.max(0))
            mesh_box[mesh_id] = (lo, hi)
        from chameleonrt_tpu.engine.device_scene import HostScene

        if isinstance(host_tris, HostScene):
            tf = host_tris.inst_transform
        else:
            tf = np.asarray(flat.inst_transform)
        for inst_id, mesh_id in enumerate(meta.inst_mesh):
            lo, hi = mesh_box[mesh_id]
            corners = np.array(
                [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
                np.float32,
            )
            m = tf[inst_id]
            wc = corners @ m[:3, :3].T + m[:3, 3]
            out[inst_id, 0:3] = wc.min(axis=0)
            out[inst_id, 3:6] = wc.max(axis=0)
        return jnp.asarray(out)

    for inst_id, mesh_id in enumerate(meta.inst_mesh):
        pbvh = flat.blas[mesh_id].closest
        root = np.asarray(pbvh.nodes[0])
        # union the root row's child boxes, skipping empty slots (binary
        # layout marks them inf/-inf; BVH4 marks them lo = hi = 1e30)
        lo = np.full(3, np.inf, np.float32)
        hi = np.full(3, -np.inf, np.float32)
        for c in range(pbvh.arity):
            clo = root[6 * c : 6 * c + 3]
            chi = root[6 * c + 3 : 6 * c + 6]
            if not np.isfinite(clo).all() or not np.isfinite(chi).all():
                continue
            if clo[0] >= 1e29 and chi[0] >= 1e29:
                continue
            lo = np.minimum(lo, clo)
            hi = np.maximum(hi, chi)
        if not np.isfinite(lo).all():  # single-leaf binary tree: only slot 0
            lo = np.minimum(root[0:3], root[3:6])
            hi = np.maximum(root[0:3], root[3:6])
        corners = np.array(
            [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
            np.float32,
        )
        m = np.asarray(flat.inst_transform[inst_id])
        wc = corners @ m[:3, :3].T + m[:3, 3]
        out[inst_id, 0:3] = wc.min(axis=0)
        out[inst_id, 3:6] = wc.max(axis=0)
    return jnp.asarray(out)


def _instance_cull(flat: FlatScene, inst_id: int, orig, dir, t_min, t_max):
    """Ray vs instance world-AABB slab test: lanes that miss the box skip
    that instance's whole BLAS traversal (their while-loop lanes start
    done)."""
    box = flat.inst_aabb[inst_id]
    inv = 1.0 / dir
    entry = t_min
    exit_ = t_max
    for axis in range(3):
        t0 = (box[axis] - orig[:, axis]) * inv[:, axis]
        t1 = (box[axis + 3] - orig[:, axis]) * inv[:, axis]
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
        hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
        entry = jnp.maximum(entry, lo)
        exit_ = jnp.minimum(exit_, hi)
    return entry <= exit_


def make_trace_fns(meta: SceneMeta):
    """(trace_closest, trace_any) using per-mesh BLAS traversal with a
    statically unrolled instance loop + per-ray instance AABB culling.
    The packed BVHs ride in flat.blas (jit arguments, not closure
    constants — see FlatScene.blas)."""

    def _object_rays(flat: FlatScene, inst_id: int, orig, dir):
        inv = flat.inst_inv[inst_id]
        return (
            transform_point(inv[None], orig),
            transform_vector(inv[None], dir),
        )

    multi = meta.num_instances > 1

    def trace_closest(flat: FlatScene, orig, dir, t_min, active):
        # Rays arrive PRE-SORTED (active-first, octant, origin Morton): the
        # path tracer re-sorts its whole wavefront state once per bounce
        # (path_tracer._sort_wavefront) so no per-call permutation gathers
        # are paid here — XLA:TPU gathers cost ~12 ns per row, and the
        # old per-call sort/unsort was ~35% of the frame.
        if flat.blas and isinstance(flat.blas[0], UnifiedPair):
            return _trace_closest_unified(flat, orig, dir, t_min, active)
        best = Hit.none(orig.shape[:1])
        ovf = jnp.zeros(orig.shape[:1], bool)
        for inst_id, mesh_id in enumerate(meta.inst_mesh):
            start, count = meta.mesh_tri_ranges[mesh_id]
            if count == 0:
                continue
            inst_active = active
            if multi:
                inst_active = active & _instance_cull(
                    flat, inst_id, orig, dir, jnp.float32(t_min), best.t
                )
            o, d = _object_rays(flat, inst_id, orig, dir)
            pbvh_c = _closest_table(flat.blas[mesh_id])
            if (
                _packet_enabled()
                and _slotlane_enabled()
                and slotlane_eligible(pbvh_c, o.shape[0])
            ):
                t, prim, u, v = traverse_closest_slotlane(
                    pbvh_c,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(t_min), o.shape[:1]),
                    inst_active,
                    t_max=best.t,
                )
            elif _packet_enabled() and persistent_eligible(pbvh_c, o.shape[0]):
                t, prim, u, v = traverse_closest_persistent(
                    pbvh_c,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(t_min), o.shape[:1]),
                    inst_active,
                    t_max=best.t,
                )
            elif (
                _packet_enabled()
                and _slotlane_enabled()
                and slotlane_stream_eligible(pbvh_c, o.shape[0])
            ):
                # tables too big for VMEM: HBM tables, per-slot row DMAs
                t, prim, u, v = traverse_closest_slotlane(
                    pbvh_c,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(t_min), o.shape[:1]),
                    inst_active,
                    t_max=best.t,
                    stream=True,
                )
            elif _packet_enabled() and persistent_stream_eligible(
                pbvh_c, o.shape[0]
            ):
                # tables too big for VMEM: DMA-streamed variant (HBM tables)
                t, prim, u, v = traverse_closest_persistent(
                    pbvh_c,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(t_min), o.shape[:1]),
                    inst_active,
                    t_max=best.t,
                    stream=True,
                )
            elif _packet_enabled() and packet_eligible(pbvh_c):
                t, prim, u, v = traverse_closest_packet(
                    pbvh_c,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(t_min), o.shape[:1]),
                    inst_active,
                    t_max=best.t,
                )
            else:
                t, prim, u, v = traverse_closest_blocked(
                    pbvh_c,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(t_min), o.shape[:1]),
                    inst_active,
                    t_max=best.t,
                )
            found = prim >= 0
            # prim == -2 marks traversal stack overflow (reachable only on
            # the uncertified-depth LBVH path): the lane's result may have
            # dropped subtrees anywhere, so poison the whole lane below.
            ovf = ovf | (prim == -2)
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
        ok = active & ~ovf
        return Hit(
            t=jnp.where(ok, best.t, T_MAX),
            tri=jnp.where(ok, best.tri, jnp.where(active & ovf, -2, -1)),
            inst=jnp.where(ok, best.inst, -1),
            u=best.u,
            v=best.v,
        )

    def _trace_closest_unified(flat: FlatScene, orig, dir, t_min, active):
        from chameleonrt_tpu.ops.traverse import traverse_closest_unified_blocked
        from chameleonrt_tpu.ops.traverse_packet import (
            traverse_closest_unified_persistent,
            unified_persistent_eligible,
        )

        from chameleonrt_tpu.ops.traverse_slotlane import (
            slotlane_unified_eligible,
            slotlane_unified_stream_eligible,
            traverse_closest_unified_slotlane,
        )

        ubvh = _closest_table(flat.blas[0])
        if (
            _unified_persistent_enabled()
            and _slotlane_enabled()
            and slotlane_unified_eligible(ubvh, orig.shape[0])
        ):
            t, prim, inst, u, v = traverse_closest_unified_slotlane(
                ubvh,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(t_min), orig.shape[:1]),
                active,
            )
        elif (
            _unified_persistent_enabled()
            and unified_persistent_eligible(ubvh, orig.shape[0])
        ):
            t, prim, inst, u, v = traverse_closest_unified_persistent(
                ubvh,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(t_min), orig.shape[:1]),
                active,
            )
        elif (
            _unified_persistent_enabled()
            and _slotlane_enabled()
            and slotlane_unified_stream_eligible(ubvh, orig.shape[0])
        ):
            t, prim, inst, u, v = traverse_closest_unified_slotlane(
                ubvh,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(t_min), orig.shape[:1]),
                active,
                stream=True,
            )
        elif _unified_persistent_enabled() and persistent_stream_eligible(
            ubvh, orig.shape[0]
        ):
            t, prim, inst, u, v = traverse_closest_unified_persistent(
                ubvh,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(t_min), orig.shape[:1]),
                active,
                stream=True,
            )
        else:
            t, prim, inst, u, v = traverse_closest_unified_blocked(
                ubvh,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(t_min), orig.shape[:1]),
                active,
            )
        found = active & (prim >= 0)
        ovf = active & (prim == -2)
        return Hit(
            t=jnp.where(found, t, T_MAX),
            tri=jnp.where(found, prim, jnp.where(ovf, -2, -1)),
            inst=jnp.where(found, inst, -1),
            u=u,
            v=v,
        )

    def trace_any(flat: FlatScene, orig, dir, t_max, mask):
        if flat.blas and isinstance(flat.blas[0], UnifiedPair):
            return _trace_any_unified(flat, orig, dir, t_max, mask)
        t_max = jnp.broadcast_to(t_max, orig.shape[:1])
        occluded = jnp.zeros(orig.shape[:1], bool)
        for inst_id, mesh_id in enumerate(meta.inst_mesh):
            start, count = meta.mesh_tri_ranges[mesh_id]
            if count == 0:
                continue
            inst_mask = mask & ~occluded
            if multi:
                inst_mask = inst_mask & _instance_cull(
                    flat, inst_id, orig, dir, jnp.float32(EPSILON), t_max
                )
            o, d = _object_rays(flat, inst_id, orig, dir)
            # persistent any-hit rides the BVH4 slot: ~half the node
            # iterations for the 10 occlusion launches per frame; the
            # grid fallback remains binary-only
            pbvh_a = flat.blas[mesh_id].any
            pbvh_c = flat.blas[mesh_id].closest
            if (
                _packet_enabled()
                and _slotlane_enabled()
                and slotlane_eligible(pbvh_a, o.shape[0], closest=False)
            ):
                occluded = occluded | traverse_any_slotlane(
                    pbvh_a,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(EPSILON), o.shape[:1]),
                    t_max,
                    inst_mask,
                )
            elif _packet_enabled() and persistent_eligible(
                pbvh_a, o.shape[0], closest=False
            ):
                occluded = occluded | traverse_any_persistent(
                    pbvh_a,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(EPSILON), o.shape[:1]),
                    t_max,
                    inst_mask,
                )
            elif (
                _packet_enabled()
                and _slotlane_enabled()
                and slotlane_stream_eligible(pbvh_a, o.shape[0], closest=False)
            ):
                occluded = occluded | traverse_any_slotlane(
                    pbvh_a,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(EPSILON), o.shape[:1]),
                    t_max,
                    inst_mask,
                    stream=True,
                )
            elif _packet_enabled() and persistent_stream_eligible(
                pbvh_a, o.shape[0], closest=False
            ):
                occluded = occluded | traverse_any_persistent(
                    pbvh_a,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(EPSILON), o.shape[:1]),
                    t_max,
                    inst_mask,
                    stream=True,
                )
            elif _packet_enabled() and packet_eligible(pbvh_c):
                occluded = occluded | traverse_any_packet(
                    pbvh_c,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(EPSILON), o.shape[:1]),
                    t_max,
                    inst_mask,
                )
            else:
                occluded = occluded | traverse_any_blocked(
                    flat.blas[mesh_id].any,
                    o,
                    d,
                    jnp.broadcast_to(jnp.float32(EPSILON), o.shape[:1]),
                    t_max,
                    inst_mask,
                )
        return occluded & mask

    def _trace_any_unified(flat: FlatScene, orig, dir, t_max, mask):
        from chameleonrt_tpu.ops.traverse import traverse_any_unified_blocked
        from chameleonrt_tpu.ops.traverse_packet import (
            traverse_any_unified_persistent,
            unified_persistent_eligible,
        )

        from chameleonrt_tpu.ops.traverse_slotlane import (
            slotlane_unified_eligible,
            slotlane_unified_stream_eligible,
            traverse_any_unified_slotlane,
        )

        # persistent any-hit rides the BVH4 slot (~half the node visits)
        ubvh_bin = flat.blas[0].any
        if (
            _unified_persistent_enabled()
            and _slotlane_enabled()
            and slotlane_unified_eligible(ubvh_bin, orig.shape[0], closest=False)
        ):
            occ = traverse_any_unified_slotlane(
                ubvh_bin,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(EPSILON), orig.shape[:1]),
                jnp.broadcast_to(t_max, orig.shape[:1]),
                mask,
            )
        elif (
            _unified_persistent_enabled()
            and unified_persistent_eligible(ubvh_bin, orig.shape[0], closest=False)
        ):
            occ = traverse_any_unified_persistent(
                ubvh_bin,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(EPSILON), orig.shape[:1]),
                jnp.broadcast_to(t_max, orig.shape[:1]),
                mask,
            )
        elif (
            _unified_persistent_enabled()
            and _slotlane_enabled()
            and slotlane_unified_stream_eligible(
                ubvh_bin, orig.shape[0], closest=False
            )
        ):
            occ = traverse_any_unified_slotlane(
                ubvh_bin,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(EPSILON), orig.shape[:1]),
                jnp.broadcast_to(t_max, orig.shape[:1]),
                mask,
                stream=True,
            )
        elif _unified_persistent_enabled() and persistent_stream_eligible(
            ubvh_bin, orig.shape[0], closest=False
        ):
            occ = traverse_any_unified_persistent(
                ubvh_bin,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(EPSILON), orig.shape[:1]),
                jnp.broadcast_to(t_max, orig.shape[:1]),
                mask,
                stream=True,
            )
        else:
            occ = traverse_any_unified_blocked(
                flat.blas[0].any,
                orig,
                dir,
                jnp.broadcast_to(jnp.float32(EPSILON), orig.shape[:1]),
                jnp.broadcast_to(t_max, orig.shape[:1]),
                mask,
            )
        return occ & mask

    return trace_closest, trace_any
