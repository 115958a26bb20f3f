"""Pallas packet-traversal kernels — the TPU-native replacement for hardware
ray traversal (the role of rtcIntersectV / optixTrace in the reference
backends, e.g. backends/embree/render_embree.ispc:245).

Architecture (v5e-measured, see docs/ARCHITECTURE.md):

Mosaic cannot lower per-lane dynamic gathers (``ref[int_array]`` et al fail
on this toolchain), which rules out a straight port of the XLA lockstep
form. Instead the kernel runs **shared-stack packet traversal**: a packet
of P_SUB*128 coherent rays shares ONE traversal stack, so every node fetch
is a *scalar-indexed* dynamic slice — a form Mosaic lowers natively — and
all per-ray math is dense VPU work. Ray sorting (ops/traverse.ray_sort_perm)
makes packets coherent enough that the union of per-ray node visits stays
within a few x of the per-ray average (measured: ~3x at 256-ray packets on
the hall camera wavefront).

One packet per kernel would serialize on the vector->scalar round trip of
the push/pop decisions (~275 ns/step measured). The kernel therefore keeps
**K=64 packets resident** and advances all of them together per while
iteration: the K decision reductions batch into one (K,) vector, the K
scalar stack updates are an unrolled scalar loop, and the vector math for
all packets issues as one (K*P_SUB,128) block. Measured: ~26 ns per
packet-step for the node phase at P_SUB=8 (vs ~275 single-packet).
Packet height is a parameter; P_SUB=2 (256-ray packets) measures best on
both coherent and incoherent hall wavefronts — the smaller packet unions
beat the extra iterations (sweep: scripts/packet_sweep.py).

Iterations are PHASE-ALTERNATED: a while iteration is either a node phase
(slab tests only; slots waiting at leaves stall) or a leaf phase (Moller-
Trumbore only, batched across every waiting slot), selected by a scalar
slot census through a real Mosaic branch (lax.cond). This avoids paying
the ~180-op leaf math on node steps and vice versa (~2x vector-work saving
at the typical 2:1 internal:leaf visit ratio).

Leaf handling exploits idempotence: closest-hit state (best_t/prim/u/v)
only improves on strict t decrease and occlusion state is a sticky OR, so
re-evaluating a STALE leaf row (slots not at a leaf keep their last-fetched
row) is a no-op. That removes all per-ray masking from the leaf phase; the
only guards are scalar-side.

Grid pipelining: packets are processed in groups of K; the Pallas grid
iterates over groups and the BlockSpec pipeline double-buffers the next
group's ray blocks against the current group's compute. Node/leaf tables
ride in VMEM untiled (size-gated by the caller; scenes too big for VMEM
stay on the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chameleonrt_tpu.ops.intersect import T_MAX, UV_EPS
from chameleonrt_tpu.ops.lbvh import PackedBvh

import os as _os

K = int(_os.environ.get("CHAMELEONRT_PACKET_K", "64"))  # resident packets
P_LANE = 128
DEFAULT_P_SUB = 2  # sublane rows per packet (packet = P_SUB * 128 rays)

# Minimum number of slots waiting at a leaf before a leaf phase runs (a
# leaf phase always runs when no slot can do a node step). Low values
# waste leaf-phase batching; high values stall too many slots through
# node phases. (Both knobs env-overridable for sweeps.)
LEAF_THRESH = int(_os.environ.get("CHAMELEONRT_LEAF_THRESH", "16"))

_DONE = -(1 << 30)  # scalar sentinel: slot finished (any leaf code > _DONE)
# persistent kernels: slot just retired its packet and awaits the batched
# swap block (same body iteration). Collides with leaf id (1<<30)-2 only,
# far beyond any real leaf-table size.
_RETIRE = _DONE + 1
# unified kernels: slot hit an instance-entry leaf (awaits the batched
# transform-and-jump block) / slot pops back to TLAS rows from object
# space (awaits the batched world-ray restore block). Same body-local
# lifetime as _RETIRE.
_ENTRY = _DONE + 2
_RESTORE = _DONE + 3
# flat deferred-leaf kernels: slot's traversal is exhausted but its leaf
# queue still holds pending leaf codes — PERSISTS across iterations until
# a leaf phase drains the queue (unlike the body-local sentinels above).
# at-leaf tests in the deferred kernels use cur > _PARKED so this state
# is never mistaken for a real leaf code.
_PARKED = _DONE + 4
_MT_EPS = 1e-9
_BIG = 1e30

# Deferred leaf queues (flat kernels, round 4): node iterations never
# stall a slot at a leaf — the slot pushes the leaf code into a small
# per-slot FIFO and keeps popping, so EVERY live slot advances every node
# iteration (the two-phase alternation measured 36-47% of slot-steps idle
# at the opposite phase's state). Leaf phases drain one queue head per
# slot across all slots at once. Deferral only LOOSENS best-t culling
# (extra visits), so the final best t is identical: any extra leaf was
# culled because its slab entry exceeded a best-t that only ever
# decreases — its hits satisfy t >= entry > final best, so they can
# never win (strict <) the t comparison. Scope caveat: enqueue-at-push
# puts a node's leaf children into the FIFO AHEAD of the descended
# internal subtree's leaves, whereas eager DFS visits the nearer
# internal subtree's leaves first — so on EXACT cross-leaf t ties
# (coplanar/duplicate triangles in different leaves) the winning
# prim/u/v may differ from the eager order and the XLA oracle. Final t
# is bit-identical either way; the parity gates pass because the bench
# scenes have no such exact ties. CHAMELEONRT_LEAFQ sets the FIFO depth
# (0 disables, restoring phase alternation); CHAMELEONRT_LEAFQ_SLOTS is
# the minimum count of non-empty queues that triggers a leaf phase.
LEAFQ_CAP = int(_os.environ.get("CHAMELEONRT_LEAFQ", "32"))
if LEAFQ_CAP < 0:
    raise ValueError(
        f"CHAMELEONRT_LEAFQ must be >= 0 (got {LEAFQ_CAP}); negative FIFO "
        "depths have no meaning (0 disables deferred leaf queues)"
    )
LEAFQ_SLOTS = int(_os.environ.get("CHAMELEONRT_LEAFQ_SLOTS", "0")) or None


def _leafq_for(arity: int, leafq: int) -> int:
    """Clamp a leaf-FIFO depth against the node arity. A depth in
    1..arity-1 would deadlock the scheduler: the near-full test
    (lqn > leafq - arity) is already true at lqn == 0, so every iteration
    runs a leaf phase that dequeues nothing while node phases (the only
    producers of retirements) never run — the kernel while-loop spins
    forever (a silent TPU hang). Such depths can't buffer even one node's
    worth of leaf children, so they degrade to 0 (phase alternation)."""
    return leafq if leafq >= arity else 0

# ascending sorting networks over child entry distances (closest-hit child
# ordering; mirrors ops/traverse._SORT_NETS so both paths explore children
# in the same near-first order and near-tie prims resolve identically)
_SORT_NETS = {
    2: ((0, 1),),
    4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
    8: (
        (0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6),
        (0, 4), (1, 5), (2, 6), (3, 7),
        (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6),
    ),
}

# Scoped-VMEM budget for the kernel (v5e has 128 MiB physical VMEM; the
# XLA default scoped limit of 16 MiB is too small once the node+leaf
# tables ride in VMEM next to the pipelined ray blocks).
VMEM_LIMIT = 124 * 1024 * 1024


def _bcast(col, p_sub):
    """(K,1) per-packet column -> (K*p_sub,128) broadcast over each packet's
    ray rows. pltpu.repeat has TILE semantics ([c0..cK-1, c0..cK-1, ...]),
    so the ray layout is INTERLEAVED: packet k owns sublane rows
    {k, k+K, k+2K, ...} (see _pack_rays). The slot count is derived from
    the column shape so kernels built with any K share this helper."""
    kk = col.shape[0]
    rep = pltpu.repeat(col, p_sub, axis=0)  # (K*p_sub, 1) tiled
    return jnp.broadcast_to(rep, (kk * p_sub, P_LANE))


_INV_EPS = 1e-30  # 1/_INV_EPS = 1e30 stays finite in f32


def _safe_inv(d):
    """Sign-preserving clamped reciprocal: never inf (|result| <= 1e30).
    Feeding the slab test a FINITE inverse removes the 0*inf NaN case
    entirely, so the per-child isnan guards (12 of ~37 VPU ops per child
    slab, ~30% of the node phase) disappear. Verdict parity with the
    guarded form: a parallel ray strictly outside the slab still misses
    (same-sign huge products), strictly inside still passes (opposite
    signs), and exactly ON the boundary gets entry 0 instead of -inf —
    the same hit/miss decision in every case."""
    return 1.0 / jnp.where(
        jnp.abs(d) < _INV_EPS, jnp.where(d < 0, -_INV_EPS, _INV_EPS), d
    )


def _slab(rows, c, p_sub, ox, oy, oz, ix, iy, iz, t_min, t_cap):
    """Per-ray slab test of child AABB at node-row columns [c, c+6) for all
    K packets jointly. rows: (K,16). Returns (hit, entry) as (K*p_sub,128).
    REQUIRES finite inverse directions (_safe_inv) — no NaN guards here."""
    lox, loy, loz = rows[:, c + 0 : c + 1], rows[:, c + 1 : c + 2], rows[:, c + 2 : c + 3]
    hix, hiy, hiz = rows[:, c + 3 : c + 4], rows[:, c + 4 : c + 5], rows[:, c + 5 : c + 6]
    tx0 = (_bcast(lox, p_sub) - ox) * ix
    tx1 = (_bcast(hix, p_sub) - ox) * ix
    ty0 = (_bcast(loy, p_sub) - oy) * iy
    ty1 = (_bcast(hiy, p_sub) - oy) * iy
    tz0 = (_bcast(loz, p_sub) - oz) * iz
    tz1 = (_bcast(hiz, p_sub) - oz) * iz
    txn, txf = jnp.minimum(tx0, tx1), jnp.maximum(tx0, tx1)
    tyn, tyf = jnp.minimum(ty0, ty1), jnp.maximum(ty0, ty1)
    tzn, tzf = jnp.minimum(tz0, tz1), jnp.maximum(tz0, tz1)
    entry = jnp.maximum(jnp.maximum(txn, tyn), jnp.maximum(tzn, t_min))
    exit_ = jnp.minimum(jnp.minimum(txf, tyf), jnp.minimum(tzf, t_cap))
    return entry <= exit_, entry


def _mt(lrows, L, p_sub, ox, oy, oz, dx, dy, dz, t_min, t_cap):
    """Moller-Trumbore of all K packets against their fetched leaf rows
    (component-major PackedBvh layout, ops/lbvh.py). Returns per-slot-L
    (hit, t, u, v, prim) lists of (K*p_sub,128) arrays."""
    hits, ts, us, vs, prims = [], [], [], [], []
    for j in range(L):

        def g(comp):
            return _bcast(lrows[:, comp * L + j : comp * L + j + 1], p_sub)

        v0x, v0y, v0z = g(0), g(1), g(2)
        e1x, e1y, e1z = g(3), g(4), g(5)
        e2x, e2y, e2z = g(6), g(7), g(8)
        prim = _bcast(lrows[:, 9 * L + j : 9 * L + j + 1], p_sub)  # f32 bits

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(jnp.abs(det) < _MT_EPS, 1.0, det)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        prim_i = pltpu.bitcast(prim, jnp.int32)
        hit = (
            (jnp.abs(det) >= _MT_EPS)
            & (prim_i >= 0)
            & (u >= -UV_EPS)
            & (v >= -UV_EPS)
            & (u + v <= 1.0 + UV_EPS)
            & (t > t_min)
            & (t < t_cap)
        )
        hits.append(hit)
        ts.append(t)
        us.append(u)
        vs.append(v)
        prims.append(prim_i)
    return hits, ts, us, vs, prims


def _packet_reduce_max(x, p_sub):
    """(K*p_sub,128) f32 -> (K,) per-packet max (interleaved rows: row r is
    packet r % K). PRE-FOLDS the p_sub sub-row blocks with cheap full-vreg
    elementwise maxes so the expensive cross-lane shuffle tree runs on
    (K,128) instead of (K*p_sub,128) — bit-exact (max is associative and
    commutative; kernel values are NaN-free by the _safe_inv contract).
    Measured on v5e (scripts/roofline_probe.py step): part of the
    fused+psfold set that cuts the node step 1709 -> 1352 ns."""
    kk = x.shape[0] // p_sub
    f = x[:kk]
    for p in range(1, p_sub):
        f = jnp.maximum(f, x[p * kk : (p + 1) * kk])
    return jnp.max(f, axis=1)  # (kk,)


def _packet_reduce_min(x, p_sub):
    kk = x.shape[0] // p_sub
    f = x[:kk]
    for p in range(1, p_sub):
        f = jnp.minimum(f, x[p * kk : (p + 1) * kk])
    return jnp.min(f, axis=1)


def _phase_counts(cur_ref):
    """Scalar census of slot states: (#internal, #waiting-at-leaf)."""
    n_int = jnp.int32(0)
    n_leaf = jnp.int32(0)
    for k in range(cur_ref.shape[0]):
        c = cur_ref[k]
        n_int = n_int + jnp.where(c >= 0, 1, 0).astype(jnp.int32)
        n_leaf = n_leaf + jnp.where(
            jnp.logical_and(c < 0, c > _DONE), 1, 0
        ).astype(jnp.int32)
    return n_int, n_leaf


def _closest_kernel(
    L,
    depth,
    p_sub,
    nodes_ref,
    leafs_ref,
    ox_ref,
    oy_ref,
    oz_ref,
    dx_ref,
    dy_ref,
    dz_ref,
    tmin_ref,
    tmax_ref,
    t_out,
    prim_out,
    u_out,
    v_out,
    it_out,
    nrow_scr,
    lrow_scr,
    stack_ref,
    cur_ref,
    sp_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    t_min = tmin_ref[:]

    # per-slot init: everyone starts at the root; all-dead packets miss both
    # root children and retire after one node phase
    for k in range(K):
        cur_ref[k] = 0
        sp_ref[k] = 0
    # stale-leaf guard for the first leaf phase: degenerate rows never hit
    lrow_scr[:] = jnp.zeros_like(lrow_scr)

    init = (
        jnp.int32(0),  # done count
        jnp.int32(0),  # iteration count (perf diagnostic)
        jnp.minimum(jnp.full((K * p_sub, P_LANE), 1e20, jnp.float32), tmax_ref[:]),
        jnp.full((K * p_sub, P_LANE), -1, jnp.int32),
        jnp.zeros((K * p_sub, P_LANE), jnp.float32),
        jnp.zeros((K * p_sub, P_LANE), jnp.float32),
    )

    def cond(state):
        return state[0] < K

    def node_iter(state):
        ndone, it, best_t, best_prim, best_u, best_v = state
        for k in range(K):
            c = cur_ref[k]

            @pl.when(c >= 0)
            def _():
                nrow_scr[pl.ds(k, 1), :] = nodes_ref[pl.ds(c, 1), :]

        rows = nrow_scr[:]  # (K,16)
        lhit, lt = _slab(rows, 0, p_sub, ox, oy, oz, ix, iy, iz, t_min, best_t)
        rhit, rt = _slab(rows, 6, p_sub, ox, oy, oz, ix, iy, iz, t_min, best_t)
        any_l = _packet_reduce_max(jnp.where(lhit, 1.0, 0.0), p_sub)
        any_r = _packet_reduce_max(jnp.where(rhit, 1.0, 0.0), p_sub)
        min_lt = _packet_reduce_min(jnp.where(lhit, lt, _BIG), p_sub)
        min_rt = _packet_reduce_min(jnp.where(rhit, rt, _BIG), p_sub)
        l_near_v = jnp.where(min_lt <= min_rt, 1.0, 0.0)
        left_c = pltpu.bitcast(rows[:, 12:13], jnp.int32)  # (K,1)
        right_c = pltpu.bitcast(rows[:, 13:14], jnp.int32)

        for k in range(K):
            c = cur_ref[k]
            was_int = c >= 0

            hit_l = any_l[k] > 0.0
            hit_r = any_r[k] > 0.0
            l_near = l_near_v[k] > 0.0
            lk, rk = left_c[k, 0], right_c[k, 0]
            near = jnp.where(l_near, lk, rk)
            far = jnp.where(l_near, rk, lk)
            both = jnp.logical_and(jnp.logical_and(hit_l, hit_r), was_int)
            one = jnp.logical_and(jnp.logical_xor(hit_l, hit_r), was_int)
            single = jnp.where(hit_l, lk, rk)

            sp_k = sp_ref[k]

            @pl.when(both)
            def _():
                stack_ref[k, sp_k] = far

            sp2 = jnp.where(both, sp_k + 1, sp_k)
            want_pop = jnp.logical_and(
                was_int, jnp.logical_not(jnp.logical_or(both, one))
            )
            can_pop = jnp.logical_and(want_pop, sp2 > 0)
            spm = jnp.maximum(sp2 - 1, 0)
            popped = stack_ref[k, spm]
            nxt = jnp.where(
                both, near, jnp.where(one, single, jnp.where(can_pop, popped, _DONE))
            )
            nxt = jnp.where(was_int, nxt, c)  # leaf-waiting / done slots stall
            retired = jnp.logical_and(was_int, nxt == _DONE)
            ndone = ndone + jnp.where(retired, 1, 0).astype(jnp.int32)
            cur_ref[k] = nxt
            sp_ref[k] = jnp.where(can_pop, spm, sp2)

        return ndone, it + 1, best_t, best_prim, best_u, best_v

    def leaf_iter(state):
        ndone, it, best_t, best_prim, best_u, best_v = state
        for k in range(K):
            c = cur_ref[k]

            @pl.when(jnp.logical_and(c < 0, c > _DONE))
            def _():
                lrow_scr[pl.ds(k, 1), :] = leafs_ref[pl.ds(-c - 1, 1), :]

        lrows = lrow_scr[:]  # (K,10L) — stale rows re-test as no-ops
        hits, ts, us, vs, prims = _mt(
            lrows, L, p_sub, ox, oy, oz, dx, dy, dz, t_min, best_t
        )
        for j in range(L):
            take = hits[j] & (ts[j] < best_t)
            best_t = jnp.where(take, ts[j], best_t)
            best_prim = jnp.where(take, prims[j], best_prim)
            best_u = jnp.where(take, us[j], best_u)
            best_v = jnp.where(take, vs[j], best_v)

        for k in range(K):
            c = cur_ref[k]
            at_leaf = jnp.logical_and(c < 0, c > _DONE)
            sp_k = sp_ref[k]
            can_pop = jnp.logical_and(at_leaf, sp_k > 0)
            spm = jnp.maximum(sp_k - 1, 0)
            popped = stack_ref[k, spm]
            nxt = jnp.where(at_leaf, jnp.where(can_pop, popped, _DONE), c)
            retired = jnp.logical_and(at_leaf, nxt == _DONE)
            ndone = ndone + jnp.where(retired, 1, 0).astype(jnp.int32)
            cur_ref[k] = nxt
            sp_ref[k] = jnp.where(can_pop, spm, sp_k)

        return ndone, it + 1, best_t, best_prim, best_u, best_v

    def body(state):
        n_int, n_leaf = _phase_counts(cur_ref)
        do_leaf = jnp.logical_or(n_leaf >= LEAF_THRESH, n_int == 0)
        return jax.lax.cond(do_leaf, leaf_iter, node_iter, state)

    _, it, best_t, best_prim, best_u, best_v = jax.lax.while_loop(cond, body, init)
    t_out[:] = best_t
    prim_out[:] = best_prim
    u_out[:] = best_u
    v_out[:] = best_v
    it_out[:] = jnp.full((8, P_LANE), it, jnp.int32)


def _any_kernel(
    L,
    depth,
    p_sub,
    nodes_ref,
    leafs_ref,
    ox_ref,
    oy_ref,
    oz_ref,
    dx_ref,
    dy_ref,
    dz_ref,
    tmin_ref,
    tmax_ref,
    occ_out,
    it_out,
    nrow_scr,
    lrow_scr,
    stack_ref,
    cur_ref,
    sp_ref,
):
    """Occlusion variant: sticky per-ray occluded flag (stale leaf re-evals
    are no-ops under OR), per-packet early-out when every ray is occluded.
    Dead rays must enter pre-occluded (callers pass tmax<=0 for them) so the
    all-reduction can fire."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    t_min = tmin_ref[:]
    t_max = tmax_ref[:]

    for k in range(K):
        cur_ref[k] = 0
        sp_ref[k] = 0
    lrow_scr[:] = jnp.zeros_like(lrow_scr)

    init = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.where(t_max <= 0.0, 1.0, 0.0),  # occluded as f32 0/1
    )

    def cond(state):
        return state[0] < K

    def node_iter(state):
        ndone, it, occ = state
        for k in range(K):
            c = cur_ref[k]

            @pl.when(c >= 0)
            def _():
                nrow_scr[pl.ds(k, 1), :] = nodes_ref[pl.ds(c, 1), :]

        rows = nrow_scr[:]
        # skip subtrees for already-occluded rays via t_cap<=0
        t_cap = jnp.where(occ > 0.0, -_BIG, t_max)
        lhit, _ = _slab(rows, 0, p_sub, ox, oy, oz, ix, iy, iz, t_min, t_cap)
        rhit, _ = _slab(rows, 6, p_sub, ox, oy, oz, ix, iy, iz, t_min, t_cap)
        any_l = _packet_reduce_max(jnp.where(lhit, 1.0, 0.0), p_sub)
        any_r = _packet_reduce_max(jnp.where(rhit, 1.0, 0.0), p_sub)
        left_c = pltpu.bitcast(rows[:, 12:13], jnp.int32)
        right_c = pltpu.bitcast(rows[:, 13:14], jnp.int32)
        all_done = _packet_reduce_min(occ, p_sub)  # 1.0 = whole packet occluded

        for k in range(K):
            c = cur_ref[k]
            was_int = c >= 0

            hit_l = any_l[k] > 0.0
            hit_r = any_r[k] > 0.0
            lk, rk = left_c[k, 0], right_c[k, 0]
            both = jnp.logical_and(jnp.logical_and(hit_l, hit_r), was_int)
            one = jnp.logical_and(jnp.logical_xor(hit_l, hit_r), was_int)
            single = jnp.where(hit_l, lk, rk)

            sp_k = sp_ref[k]

            @pl.when(both)
            def _():
                stack_ref[k, sp_k] = rk  # no ordering needed for any-hit

            sp2 = jnp.where(both, sp_k + 1, sp_k)
            early = all_done[k] > 0.0
            want_pop = jnp.logical_and(
                was_int, jnp.logical_not(jnp.logical_or(both, one))
            )
            can_pop = jnp.logical_and(
                jnp.logical_and(want_pop, jnp.logical_not(early)), sp2 > 0
            )
            spm = jnp.maximum(sp2 - 1, 0)
            popped = stack_ref[k, spm]
            nxt = jnp.where(
                both, lk, jnp.where(one, single, jnp.where(can_pop, popped, _DONE))
            )
            nxt = jnp.where(was_int, nxt, c)
            nxt = jnp.where(jnp.logical_and(was_int, early), _DONE, nxt)
            retired = jnp.logical_and(was_int, nxt == _DONE)
            ndone = ndone + jnp.where(retired, 1, 0).astype(jnp.int32)
            cur_ref[k] = nxt
            sp_ref[k] = jnp.where(can_pop, spm, sp2)

        return ndone, it + 1, occ

    def leaf_iter(state):
        ndone, it, occ = state
        for k in range(K):
            c = cur_ref[k]

            @pl.when(jnp.logical_and(c < 0, c > _DONE))
            def _():
                lrow_scr[pl.ds(k, 1), :] = leafs_ref[pl.ds(-c - 1, 1), :]

        lrows = lrow_scr[:]
        hits, _, _, _, _ = _mt(lrows, L, p_sub, ox, oy, oz, dx, dy, dz, t_min, t_max)
        newly = hits[0]
        for j in range(1, L):
            newly = newly | hits[j]
        occ = jnp.maximum(occ, jnp.where(newly, 1.0, 0.0))
        all_done = _packet_reduce_min(occ, p_sub)

        for k in range(K):
            c = cur_ref[k]
            at_leaf = jnp.logical_and(c < 0, c > _DONE)
            early = all_done[k] > 0.0
            sp_k = sp_ref[k]
            can_pop = jnp.logical_and(
                jnp.logical_and(at_leaf, jnp.logical_not(early)), sp_k > 0
            )
            spm = jnp.maximum(sp_k - 1, 0)
            popped = stack_ref[k, spm]
            nxt = jnp.where(at_leaf, jnp.where(can_pop, popped, _DONE), c)
            retired = jnp.logical_and(at_leaf, nxt == _DONE)
            ndone = ndone + jnp.where(retired, 1, 0).astype(jnp.int32)
            cur_ref[k] = nxt
            sp_ref[k] = jnp.where(can_pop, spm, sp_k)

        return ndone, it + 1, occ

    def body(state):
        n_int, n_leaf = _phase_counts(cur_ref)
        do_leaf = jnp.logical_or(n_leaf >= LEAF_THRESH, n_int == 0)
        return jax.lax.cond(do_leaf, leaf_iter, node_iter, state)

    _, it, occ = jax.lax.while_loop(cond, body, init)
    occ_out[:] = occ > 0.0
    it_out[:] = jnp.full((8, P_LANE), it, jnp.int32)


def _pack_rays(x, G, p_sub, pad_value=0.0):
    """(R,) f32 -> (G*K*p_sub, 128), INTERLEAVED per group: the contiguous
    packet k of group g lands on rows {g*K*p_sub + k + j*K} so that
    tile-semantics pltpu.repeat broadcasts packet columns correctly
    (see _bcast). Tail padded with pad_value — origins pad with _BIG so
    padding lanes slab-MISS instead of becoming dir=0 degenerate rays that
    hit every node whose box straddles the origin."""
    need = G * K * p_sub * P_LANE
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]), constant_values=pad_value)
    x = x.reshape(G, K, p_sub, P_LANE).swapaxes(1, 2)
    return x.reshape(G * K * p_sub, P_LANE)


def _unpack_rays(y, R, p_sub):
    """Inverse of _pack_rays on a kernel output: -> (R,)."""
    G = y.shape[0] // (K * p_sub)
    y = y.reshape(G, p_sub, K, P_LANE).swapaxes(1, 2)
    return y.reshape(-1)[:R]


def _ray_specs(n, p_sub):
    """BlockSpecs for n per-ray (G*K*p_sub,128) inputs, blocked per grid step."""
    return [
        pl.BlockSpec((K * p_sub, P_LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)
        for _ in range(n)
    ]


def _table_specs():
    """Node + leaf tables: whole-array VMEM blocks, same for every step."""
    return [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("L", "depth", "G", "p_sub", "interpret"))
def _closest_call(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax, *, L, depth, G, p_sub, interpret=False):
    shape = (G * K * p_sub, P_LANE)
    return pl.pallas_call(
        functools.partial(_closest_kernel, L, depth, p_sub),
        grid=(G,),
        in_specs=_table_specs() + _ray_specs(8, p_sub),
        out_specs=[
            pl.BlockSpec((K * p_sub, P_LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ]
        + [pl.BlockSpec((8, P_LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((G * 8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, 16), jnp.float32),
            pltpu.VMEM((K, 10 * L), jnp.float32),
            pltpu.SMEM((K, depth), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


@functools.partial(jax.jit, static_argnames=("L", "depth", "G", "p_sub", "interpret"))
def _any_call(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax, *, L, depth, G, p_sub, interpret=False):
    shape = (G * K * p_sub, P_LANE)
    return pl.pallas_call(
        functools.partial(_any_kernel, L, depth, p_sub),
        grid=(G,),
        in_specs=_table_specs() + _ray_specs(8, p_sub),
        out_specs=[
            pl.BlockSpec((K * p_sub, P_LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)
        ]
        + [pl.BlockSpec((8, P_LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.bool_),
            jax.ShapeDtypeStruct((G * 8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, 16), jnp.float32),
            pltpu.VMEM((K, 10 * L), jnp.float32),
            pltpu.SMEM((K, depth), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


def _make_persistent_kernel(
    *,
    closest,
    unified,
    L,
    depth,
    p_sub,
    n_packets,
    kk,
    leaf_thresh,
    n_tri=0,
    tlas_lo=0,
    stream_tables=False,
    arity=2,
    merged=False,
    leafq=0,
    n_top=0,
):
    """Build the persistent work-queue traversal kernel body for one of the
    four (closest | any) x (flat | unified) variants — ONE parameterized
    generator instead of four near-copies (the round-2 form quadruplicated
    every fix on the riskiest code in the repo).

    Work-queue structure (all variants): ALL packets' rays live in VMEM
    (packet-major rows); each of the kk resident slots pulls the next
    packet id from an SMEM queue the moment its packet retires — write back
    the slot's results, fetch the new packet's rays into the interleaved
    working block, reset its state, restart at the root. Total iterations
    approach sum(per-packet visits)/kk instead of sum(per-group maxes).
    Iterations are PHASE-ALTERNATED between node phases (slab tests only)
    and leaf phases (Moller-Trumbore only, batched across waiting slots).

    Slot bookkeeping is VECTORIZED (round 3): per-slot traversal state
    (cur/sp/obj/aux) lives in (K,1) VMEM vectors and the K shared stacks in
    one (K, depth) VMEM array, so the push/pop/descend decisions for all K
    slots are a handful of VPU ops (one-hot masked writes and masked-reduce
    pops) instead of a ~25-op scalar loop per slot. The round-2 scalar form
    measured ~26 ns per slot-step — the scalar unit was the kernel's
    bottleneck at K=64 (~1.7 us/iteration); the only remaining per-slot
    scalar work is the node/leaf row fetch (K scalar-indexed dynamic
    slices, the form Mosaic lowers natively — per-lane dynamic gathers do
    not exist on this hardware).

    Mode deltas:
    - closest: ordered near/far child descent; per-ray best (t, prim,
      [inst], u, v) rows in VMEM scratch, improved on strict t decrease.
    - any: unordered descent, sticky occluded flag, whole-packet early-out
      once every ray is occluded (dead rays enter pre-occluded via
      tmax <= 0).
    - unified (two-level TLAS+BLAS table): a slot at an INSTANCE-ENTRY leaf
      (leaf code >= n_tri) parks at _ENTRY; a batched block transforms its
      packet's PRISTINE world rays (from the input refs) by the entry row's
      3x4 world-to-object matrix and jumps to the BLAS root (entry row col
      12). A slot popping from object space back to TLAS rows parks at
      _RESTORE; a batched block re-copies the world rays. Object-mode state
      rides obj_ref; aux_ref carries the popped target across the restore.

    Leaf handling exploits idempotence: closest-hit state only improves on
    strict t decrease and occlusion is a sticky OR, so re-evaluating a
    STALE cached leaf row (slots not at a leaf keep their last-fetched row)
    is a no-op — but ONLY within one ray space. Every ray-space change
    (entry, restore, packet swap on the unified layouts) therefore poisons
    the slot's cached row with zeros (det == 0 rows can never hit); the
    round-2 compiled-image divergence was exactly a stale object-space row
    tested against world rays (ADVICE.md r2 #1).
    """
    assert not (leafq and unified), (
        "deferred leaf queues require one ray space (instance entries "
        "change the slot's working rays; a deferred object-space leaf "
        "would be tested against the wrong rays)"
    )
    assert not (leafq and merged), "leafq and merged are exclusive policies"
    K = kk
    root = tlas_lo if unified else 0
    # Mosaic DMA slices must be lane-aligned (128): the streamed tables are
    # padded to 128-wide rows, and the row scratch / poison writes match.
    lrow_w = 128 if stream_tables else 10 * L

    def kernel(*args):
        args = list(args)

        def take():
            return args.pop(0)

        nodes_ref = take()
        # VMEM-pinned tree top (streamed tier only): the first n_top rows
        # of the BFS-ordered node table at their true 8*arity width. Visit
        # frequency decays geometrically with tree level, so a modest VMEM
        # prefix absorbs the bulk of node fetches; only deep-subtree rows
        # pay an HBM DMA (VERDICT r4 #2 — the role of vendor BVH node
        # caches, render_optix.cpp:160-172).
        ntop_ref = take() if (stream_tables and n_top) else None
        leafs_ref = take()
        ox_ref, oy_ref, oz_ref = take(), take(), take()
        dx_ref, dy_ref, dz_ref = take(), take(), take()
        tmin_ref, tmax_ref = take(), take()
        if closest:
            t_out, prim_out = take(), take()
            inst_out = take() if unified else None
            u_out, v_out = take(), take()
        else:
            occ_out = take()
        it_out = take()
        w_ox, w_oy, w_oz = take(), take(), take()
        w_dx, w_dy, w_dz = take(), take(), take()
        w_ix, w_iy, w_iz = take(), take(), take()
        w_tmin = take()
        if closest:
            bt_scr, bp_scr = take(), take()
            bi_scr = take() if unified else None
            bu_scr, bv_scr = take(), take()
            inst_scr = take() if unified else None
        else:
            w_tmax, occ_scr = take(), take()
        nrow_scr, lrow_scr = take(), take()
        stack_ref, cur_ref, sp_ref = take(), take(), take()
        obj_ref = take() if unified else None
        aux_ref = take() if unified else None
        lq_ref = take() if leafq else None  # (leafq, K) FIFO, lane-major
        lqh_ref = take() if leafq else None  # (K, 1) head mirror (fetch)
        lqn_ref = take() if leafq else None  # (1, K) queue occupancy
        slotpkt_ref = take()
        queue_ref = take()
        if stream_tables:
            node_sem = take()
            leaf_sem = take()
        assert not args, f"{len(args)} unconsumed kernel refs"

        iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        # LANE-major stepping state (round 4): the per-slot decision math
        # runs on (1,K)/(depth,K) shapes — ONE vreg per op — instead of
        # (K,1)/(K,depth) sublane-tiled shapes (8 vregs per op at K=64).
        # Scalar-addressed refs (cur/obj/aux, read per-slot by the fetch
        # and swap/entry/restore blocks) stay (K,1); the stepping crosses
        # layouts with one small transpose each way per iteration.
        # Measured (scripts/roofline_probe.py step): node step 1709 ->
        # 1352 ns/iter with the fused+psfold reduces included.
        iota_stack = jax.lax.broadcasted_iota(jnp.int32, (depth, K), 0)
        if leafq:
            # leaf FIFO is LANE-major (Q, K): enqueue/dequeue are one-vreg
            # masked ops with no layout crossing; the fetch loop reads head
            # scalars from a (K,1) sublane mirror refreshed once per
            # iteration (one small transpose)
            iota_q = jax.lax.broadcasted_iota(jnp.int32, (leafq, K), 0)

        def _set1(ref, k, val, dtype=jnp.int32):
            ref[pl.ds(k, 1), :] = jnp.full((1, 1), val, dtype)

        def _fetch_rows(src_ref, dst_scr, sem, cond_fn, row_of, uncond=None,
                        addr_ref=None, top_ref=None):
            """Per-slot row fetch from the node/leaf table. VMEM tables:
            direct scalar-indexed dynamic-slice copies. Streamed (HBM)
            tables: K async DMAs issued together, then waited together, so
            the K fetch latencies overlap (~one HBM round trip per
            iteration instead of K serialized ones) — this is what breaks
            the 88 MiB VMEM table wall for Rungholt-class scenes
            (VERDICT r2 missing #2).

            FLAT kernels fetch UNCONDITIONALLY with a clamped row index
            (no per-slot pl.when): all rows live in one ray space, so a
            slot at the wrong phase just caches an arbitrary same-space
            row — the node row is masked off by was_int in the stepping,
            and a stale/arbitrary leaf row only adds Moller-Trumbore
            tests of REAL triangles, whose genuine in-range hits are
            always valid for closest (strict t decrease) and any (sticky
            OR). The UNIFIED kernels MUST keep the guards: an arbitrary
            leaf row may be object-space while the slot's rays are
            world-space — exactly the round-2 stale-row divergence class
            (ADVICE r2 #1)."""
            if uncond is None:
                uncond = not unified
            if addr_ref is None:
                addr_ref = cur_ref
            if not stream_tables:
                # CHAMELEONRT_KERNEL_X2=fetch doubles every row copy (ref
                # stores survive DCE, control flow unchanged): the marginal
                # t/iteration vs the default run measures the serialized
                # fetch loop's true share of the iteration (perf probe).
                reps = 2 if _os.environ.get("CHAMELEONRT_KERNEL_X2") == "fetch" else 1
                n_rows = src_ref.shape[0]
                for k in range(K):
                    c = addr_ref[k, 0]
                    if not uncond:

                        @pl.when(cond_fn(c))
                        def _(k=k, c=c):
                            for _r in range(reps):
                                dst_scr[pl.ds(k, 1), :] = src_ref[
                                    pl.ds(row_of(c), 1), :
                                ]
                    else:
                        r = jnp.clip(row_of(c), 0, n_rows - 1)
                        for _r in range(reps):
                            dst_scr[pl.ds(k, 1), :] = src_ref[pl.ds(r, 1), :]
                return
            if top_ref is not None:
                # pinned-top split: rows below n_top copy straight from the
                # VMEM prefix (at true row width, into the low lanes the
                # consumers read); only deeper rows pay an HBM DMA. DMAs
                # start first so they overlap the VMEM copies.
                nt = top_ref.shape[0]
                tw = top_ref.shape[1]

                def dma_cond(c):
                    return jnp.logical_and(cond_fn(c), row_of(c) >= nt)

                for k in range(K):
                    c = addr_ref[k, 0]

                    @pl.when(dma_cond(c))
                    def _(k=k, c=c):
                        pltpu.make_async_copy(
                            src_ref.at[pl.ds(row_of(c), 1), :],
                            dst_scr.at[pl.ds(k, 1), :],
                            sem.at[k],
                        ).start()
                for k in range(K):
                    c = addr_ref[k, 0]

                    @pl.when(jnp.logical_and(cond_fn(c), row_of(c) < nt))
                    def _(k=k, c=c):
                        dst_scr[pl.ds(k, 1), 0:tw] = top_ref[
                            pl.ds(row_of(c), 1), :
                        ]
                for k in range(K):
                    c = addr_ref[k, 0]

                    @pl.when(dma_cond(c))
                    def _(k=k, c=c):
                        pltpu.make_async_copy(
                            src_ref.at[pl.ds(row_of(c), 1), :],
                            dst_scr.at[pl.ds(k, 1), :],
                            sem.at[k],
                        ).wait()
                return
            for k in range(K):
                c = addr_ref[k, 0]

                @pl.when(cond_fn(c))
                def _(k=k, c=c):
                    pltpu.make_async_copy(
                        src_ref.at[pl.ds(row_of(c), 1), :],
                        dst_scr.at[pl.ds(k, 1), :],
                        sem.at[k],
                    ).start()
            for k in range(K):
                c = addr_ref[k, 0]

                @pl.when(cond_fn(c))
                def _(k=k, c=c):
                    pltpu.make_async_copy(
                        src_ref.at[pl.ds(row_of(c), 1), :],
                        dst_scr.at[pl.ds(k, 1), :],
                        sem.at[k],
                    ).wait()

        def _fill_slot(k, q):
            """Load packet q's rays into slot k's interleaved working rows
            and reset its per-ray state (best hit / occlusion)."""
            for j in range(p_sub):
                wrow = k + j * K
                src = q * p_sub + j
                dxr = dx_ref[pl.ds(src, 1), :]
                dyr = dy_ref[pl.ds(src, 1), :]
                dzr = dz_ref[pl.ds(src, 1), :]
                w_ox[pl.ds(wrow, 1), :] = ox_ref[pl.ds(src, 1), :]
                w_oy[pl.ds(wrow, 1), :] = oy_ref[pl.ds(src, 1), :]
                w_oz[pl.ds(wrow, 1), :] = oz_ref[pl.ds(src, 1), :]
                w_dx[pl.ds(wrow, 1), :] = dxr
                w_dy[pl.ds(wrow, 1), :] = dyr
                w_dz[pl.ds(wrow, 1), :] = dzr
                w_ix[pl.ds(wrow, 1), :] = _safe_inv(dxr)
                w_iy[pl.ds(wrow, 1), :] = _safe_inv(dyr)
                w_iz[pl.ds(wrow, 1), :] = _safe_inv(dzr)
                w_tmin[pl.ds(wrow, 1), :] = tmin_ref[pl.ds(src, 1), :]
                if closest:
                    bt_scr[pl.ds(wrow, 1), :] = jnp.minimum(
                        jnp.full((1, P_LANE), 1e20, jnp.float32),
                        tmax_ref[pl.ds(src, 1), :],
                    )
                    bp_scr[pl.ds(wrow, 1), :] = jnp.full((1, P_LANE), -1, jnp.int32)
                    if unified:
                        bi_scr[pl.ds(wrow, 1), :] = jnp.full(
                            (1, P_LANE), -1, jnp.int32
                        )
                    bu_scr[pl.ds(wrow, 1), :] = jnp.zeros((1, P_LANE), jnp.float32)
                    bv_scr[pl.ds(wrow, 1), :] = jnp.zeros((1, P_LANE), jnp.float32)
                else:
                    tmx = tmax_ref[pl.ds(src, 1), :]
                    w_tmax[pl.ds(wrow, 1), :] = tmx
                    occ_scr[pl.ds(wrow, 1), :] = jnp.where(tmx <= 0.0, 1.0, 0.0)
            if closest and unified:
                inst_scr[pl.ds(k, 1), :] = jnp.full((1, P_LANE), -1.0, jnp.float32)

        # --- initial fill: slots 0..min(K, n_packets)-1 take packets 0..
        live0 = iota_k < min(K, n_packets)
        cur_ref[:] = jnp.where(live0, root, _DONE)
        sp_ref[:] = jnp.zeros((1, K), jnp.int32)
        if unified:
            obj_ref[:] = jnp.zeros((K, 1), jnp.int32)
            aux_ref[:] = jnp.full((K, 1), _DONE, jnp.int32)
        for k in range(K):
            if k < min(K, n_packets):
                slotpkt_ref[k] = k
                _fill_slot(k, k)
            else:
                slotpkt_ref[k] = -1
        queue_ref[0] = min(K, n_packets)
        lrow_scr[:] = jnp.zeros_like(lrow_scr)
        if leafq:
            lq_ref[:] = jnp.full((leafq, K), -1, jnp.int32)
            lqh_ref[:] = jnp.full((K, 1), -1, jnp.int32)
            lqn_ref[:] = jnp.zeros((1, K), jnp.int32)
        if closest and unified:
            inst_scr[:] = jnp.full_like(inst_scr, -1.0)

        def _swap_block(nret):
            """Batched retire-and-swap: the stepping vector math parks
            retiring slots at _RETIRE and counts them; the whole (large)
            swap code block sits behind ONE rarely-taken branch so
            iterations without a retire pay only the nret check. On the
            unified layouts the refill returns the slot to WORLD rays, so
            the cached leaf row is poisoned (ray-space-change
            invariant)."""

            @pl.when(nret > 0)
            def _():
                for k in range(K):
                    c = cur_ref[k, 0]
                    retired = c == _RETIRE
                    p_old = slotpkt_ref[k]
                    for j in range(p_sub):
                        wrow = k + j * K

                        @pl.when(retired)
                        def _(j=j, wrow=wrow, p_old=p_old):
                            dst = p_old * p_sub + j
                            if closest:
                                t_out[pl.ds(dst, 1), :] = bt_scr[pl.ds(wrow, 1), :]
                                prim_out[pl.ds(dst, 1), :] = bp_scr[
                                    pl.ds(wrow, 1), :
                                ]
                                if unified:
                                    inst_out[pl.ds(dst, 1), :] = bi_scr[
                                        pl.ds(wrow, 1), :
                                    ]
                                u_out[pl.ds(dst, 1), :] = bu_scr[pl.ds(wrow, 1), :]
                                v_out[pl.ds(dst, 1), :] = bv_scr[pl.ds(wrow, 1), :]
                            else:
                                occ_out[pl.ds(dst, 1), :] = (
                                    occ_scr[pl.ds(wrow, 1), :] > 0.0
                                )

                    q = queue_ref[0]
                    have = jnp.logical_and(retired, q < n_packets)

                    @pl.when(have)
                    def _(k=k, q=q):
                        _fill_slot(k, q)
                        if unified:
                            lrow_scr[pl.ds(k, 1), :] = jnp.zeros(
                                (1, lrow_w), jnp.float32
                            )
                            _set1(obj_ref, k, 0)
                        slotpkt_ref[k] = q
                        _set1(cur_ref, k, root)
                        # sp reset happens vectorized at the call site
                        # (sp_ref is lane-major; per-slot writes would be
                        # lane-indexed scalar stores)
                        queue_ref[0] = q + 1

                    @pl.when(
                        jnp.logical_and(retired, jnp.logical_not(q < n_packets))
                    )
                    def _(k=k):
                        slotpkt_ref[k] = -1
                        _set1(cur_ref, k, _DONE)

        if unified:

            def _restore_block(nrest):
                """Slots popping from object space back to TLAS rows:
                restore the packet's pristine world rays and poison the
                cached object-space leaf row."""

                @pl.when(nrest > 0)
                def _():
                    for k in range(K):
                        c = cur_ref[k, 0]
                        resting = c == _RESTORE

                        @pl.when(resting)
                        def _(k=k):
                            q = slotpkt_ref[k]
                            for j in range(p_sub):
                                wrow = k + j * K
                                src = q * p_sub + j
                                dxr = dx_ref[pl.ds(src, 1), :]
                                dyr = dy_ref[pl.ds(src, 1), :]
                                dzr = dz_ref[pl.ds(src, 1), :]
                                w_ox[pl.ds(wrow, 1), :] = ox_ref[pl.ds(src, 1), :]
                                w_oy[pl.ds(wrow, 1), :] = oy_ref[pl.ds(src, 1), :]
                                w_oz[pl.ds(wrow, 1), :] = oz_ref[pl.ds(src, 1), :]
                                w_dx[pl.ds(wrow, 1), :] = dxr
                                w_dy[pl.ds(wrow, 1), :] = dyr
                                w_dz[pl.ds(wrow, 1), :] = dzr
                                w_ix[pl.ds(wrow, 1), :] = _safe_inv(dxr)
                                w_iy[pl.ds(wrow, 1), :] = _safe_inv(dyr)
                                w_iz[pl.ds(wrow, 1), :] = _safe_inv(dzr)
                            if closest:
                                inst_scr[pl.ds(k, 1), :] = jnp.full(
                                    (1, P_LANE), -1.0, jnp.float32
                                )
                            lrow_scr[pl.ds(k, 1), :] = jnp.zeros(
                                (1, lrow_w), jnp.float32
                            )
                            _set1(obj_ref, k, 0)
                            _set1(cur_ref, k, aux_ref[k, 0])

            def _entry_block(nent, lrows, roots_col, insts_col):
                """Slots at an instance-entry leaf: transform the packet's
                PRISTINE world rays (from the input refs) by the entry
                row's 3x4 world-to-object matrix, jump to the BLAS root
                (entry row col 12). Entry rows carry -1 prim bits so the
                unguarded leaf-phase MT can never hit them; the cached row
                is zeroed anyway (ray-space-change invariant)."""

                @pl.when(nent > 0)
                def _():
                    for k in range(K):
                        c = cur_ref[k, 0]
                        entering = c == _ENTRY

                        @pl.when(entering)
                        def _(k=k):
                            q = slotpkt_ref[k]
                            m = [lrows[k, i] for i in range(12)]
                            for j in range(p_sub):
                                wrow = k + j * K
                                src = q * p_sub + j
                                oxr = ox_ref[pl.ds(src, 1), :]
                                oyr = oy_ref[pl.ds(src, 1), :]
                                ozr = oz_ref[pl.ds(src, 1), :]
                                dxr = dx_ref[pl.ds(src, 1), :]
                                dyr = dy_ref[pl.ds(src, 1), :]
                                dzr = dz_ref[pl.ds(src, 1), :]
                                o0 = m[0] * oxr + m[1] * oyr + m[2] * ozr + m[3]
                                o1 = m[4] * oxr + m[5] * oyr + m[6] * ozr + m[7]
                                o2 = m[8] * oxr + m[9] * oyr + m[10] * ozr + m[11]
                                d0 = m[0] * dxr + m[1] * dyr + m[2] * dzr
                                d1 = m[4] * dxr + m[5] * dyr + m[6] * dzr
                                d2 = m[8] * dxr + m[9] * dyr + m[10] * dzr
                                w_ox[pl.ds(wrow, 1), :] = o0
                                w_oy[pl.ds(wrow, 1), :] = o1
                                w_oz[pl.ds(wrow, 1), :] = o2
                                w_dx[pl.ds(wrow, 1), :] = d0
                                w_dy[pl.ds(wrow, 1), :] = d1
                                w_dz[pl.ds(wrow, 1), :] = d2
                                w_ix[pl.ds(wrow, 1), :] = _safe_inv(d0)
                                w_iy[pl.ds(wrow, 1), :] = _safe_inv(d1)
                                w_iz[pl.ds(wrow, 1), :] = _safe_inv(d2)
                            if closest:
                                inst_scr[pl.ds(k, 1), :] = jnp.full(
                                    (1, P_LANE),
                                    insts_col[k, 0].astype(jnp.float32),
                                    jnp.float32,
                                )
                            lrow_scr[pl.ds(k, 1), :] = jnp.zeros(
                                (1, lrow_w), jnp.float32
                            )
                            _set1(obj_ref, k, 1)
                            _set1(cur_ref, k, roots_col[k, 0])

        def node_iter(state):
            ndone, it, useful = state
            # node rows are ALWAYS safe to fetch unconditionally (clamped):
            # a wrong-phase or wrong-space row only feeds slab results that
            # the was_int mask discards — unlike leaf rows, whose unguarded
            # MT makes cross-space rows dangerous on the unified layouts
            _fetch_rows(nodes_ref, nrow_scr, node_sem if stream_tables else None,
                        lambda c: c >= 0, lambda c: c, uncond=not stream_tables,
                        top_ref=ntop_ref)
            rows = nrow_scr[:]
            ox, oy, oz = w_ox[:], w_oy[:], w_oz[:]
            ix, iy, iz = w_ix[:], w_iy[:], w_iz[:]
            t_min = w_tmin[:]
            if closest:
                t_cap = bt_scr[:]
            else:
                occ = occ_scr[:]
                t_cap = jnp.where(occ > 0.0, -_BIG, w_tmax[:])
            # per-child slab tests + per-packet reductions (arity-generic:
            # the BVH4 layout packs 4 children per row at cols [6c, 6c+6),
            # codes at cols [6*arity, 7*arity); empty slots are lo = hi =
            # 1e30 rows that can never pass the slab test).
            # closest: the hit and entry reduces FUSE into one min-reduce
            # per child — key = min(where(hit, entry, BIG)), with key==BIG
            # meaning "no hit" (bit-identical to the two-reduce form: a
            # hit whose entry equals BIG produced key==BIG either way).
            ch_hit = []
            ch_keys = []
            for c in range(arity):
                hc, ec = _slab(
                    rows, 6 * c, p_sub, ox, oy, oz, ix, iy, iz, t_min, t_cap
                )
                if closest:
                    ch_keys.append(
                        _packet_reduce_min(
                            jnp.where(hc, ec, _BIG), p_sub
                        ).reshape(K, 1)
                    )
                else:
                    ch_hit.append(
                        _packet_reduce_max(jnp.where(hc, 1.0, 0.0), p_sub).reshape(
                            K, 1
                        )
                    )

            # --- vectorized slot stepping, LANE-major (see iota_stack note)
            cur = cur_ref[:].T  # (1,K)
            sp = sp_ref[:]  # (1,K)
            was_int = cur >= 0
            codesT = pltpu.bitcast(
                rows[:, 6 * arity : 7 * arity], jnp.int32
            ).T  # (arity,K)
            codes = [codesT[c : c + 1, :] for c in range(arity)]
            if not closest:
                early = (
                    _packet_reduce_min(occ, p_sub).reshape(K, 1).T > 0.0
                )
            if closest:
                # order ALL hit children by entry distance with a sorting
                # network over (1,K) rows (one-vreg VPU ops): descend the
                # nearest, push the rest far-to-near so pops run near-first
                # — tightest best-t culling, and the same exploration order
                # as the XLA oracle (ops/traverse._node_phase4), so
                # near-tie prims resolve identically on both paths.
                keysT = jnp.concatenate(ch_keys, axis=1).T  # (arity,K)
                keys = [keysT[c : c + 1, :] for c in range(arity)]
                kcodes = list(codes)

                def _cswap(i, j):
                    swap = keys[i] > keys[j]
                    keys[i], keys[j] = (
                        jnp.where(swap, keys[j], keys[i]),
                        jnp.where(swap, keys[i], keys[j]),
                    )
                    kcodes[i], kcodes[j] = (
                        jnp.where(swap, kcodes[j], kcodes[i]),
                        jnp.where(swap, kcodes[i], kcodes[j]),
                    )

                for i, j in _SORT_NETS[arity]:
                    _cswap(i, j)
                hitlist = [keys[c] < _BIG for c in range(arity)]
                codelist = kcodes
            else:
                # any-hit: unordered child handling
                hitT = jnp.concatenate(ch_hit, axis=1).T  # (arity,K) f32
                hitlist = [hitT[c : c + 1, :] > 0.0 for c in range(arity)]
                codelist = codes
            if leafq:
                # ENQUEUE-AT-PUSH (deferred leaves, round 4): hit LEAF
                # children go straight into the slot's FIFO (near-first
                # for closest); only INTERNAL children descend or push, so
                # cur and the stack hold internal rows exclusively and a
                # leaf visit costs ONE batched-MT leaf step instead of a
                # pop step plus an MT step (the pop-step tax was why the
                # first deferred design measured neutral).
                lqn = lqn_ref[:]  # (1,K)
                leaf_c = [
                    hitlist[c] & (codelist[c] < 0) for c in range(arity)
                ]
                int_c = [
                    hitlist[c] & (codelist[c] >= 0) for c in range(arity)
                ]
                nleaf = leaf_c[0].astype(jnp.int32)
                offs = [jnp.zeros((1, K), jnp.int32)]
                for c in range(1, arity):
                    offs.append(nleaf)
                    nleaf = nleaf + leaf_c[c].astype(jnp.int32)
                # the scheduling policy runs a leaf phase whenever any
                # internal slot is within arity of the cap, so stalls
                # cannot happen — but keep them correct if policy and cap
                # ever diverge (a stalled slot redoes this step untouched)
                stall = was_int & (lqn + nleaf > leafq)
                proceed = was_int & jnp.logical_not(stall)
                for c in range(arity):
                    pm = leaf_c[c] & proceed
                    lq_ref[:] = jnp.where(
                        (iota_q == lqn + offs[c]) & pm,
                        -codelist[c] - 1,
                        lq_ref[:],
                    )
                lqn2 = jnp.where(proceed, lqn + nleaf, lqn)
                lqn_ref[:] = lqn2
                # refresh the sublane head mirror for the leaf fetch loop
                lqh_ref[:] = lq_ref[0:1, :].T
                # descend the first (nearest for closest) INTERNAL child;
                # push the remaining internal children far-to-near
                found = jnp.zeros((1, K), bool)
                best_code = codes[0]
                takes = []
                for c in range(arity):
                    take_c = int_c[c] & jnp.logical_not(found)
                    best_code = jnp.where(take_c, codelist[c], best_code)
                    takes.append(take_c)
                    found = found | int_c[c]
                best_hit = found
                sp2 = sp
                for c in range(arity - 1, -1, -1):
                    pm = int_c[c] & jnp.logical_not(takes[c]) & proceed
                    stack_ref[:] = jnp.where(
                        (iota_stack == sp2) & pm, codelist[c], stack_ref[:]
                    )
                    sp2 = sp2 + pm.astype(jnp.int32)
                stepped = proceed
            elif closest:
                best_hit = hitlist[0]
                best_code = codelist[0]
                # push far-to-near — one-hot masked writes into the
                # (depth, K) stacks
                sp2 = sp
                for c in range(arity - 1, 0, -1):
                    pm = hitlist[c] & was_int
                    stack_ref[:] = jnp.where(
                        (iota_stack == sp2) & pm, codelist[c], stack_ref[:]
                    )
                    sp2 = sp2 + pm.astype(jnp.int32)
                stepped = was_int
            else:
                # any-hit: first hit child descends, the rest push in
                # child order
                best_hit = hitlist[0]
                best_code = codelist[0]
                best_i = jnp.zeros((1, K), jnp.int32)
                for c in range(1, arity):
                    better = hitlist[c] & jnp.logical_not(best_hit)
                    best_code = jnp.where(better, codelist[c], best_code)
                    best_i = jnp.where(better, c, best_i)
                    best_hit = best_hit | hitlist[c]
                sp2 = sp
                for c in range(arity):
                    pm = hitlist[c] & was_int & (best_i != c)
                    stack_ref[:] = jnp.where(
                        (iota_stack == sp2) & pm, codelist[c], stack_ref[:]
                    )
                    sp2 = sp2 + pm.astype(jnp.int32)
                stepped = was_int
            want_pop = stepped & jnp.logical_not(best_hit)
            if closest:
                can_pop = want_pop & (sp2 > 0)
            else:
                can_pop = want_pop & jnp.logical_not(early) & (sp2 > 0)
            spm = jnp.maximum(sp2 - 1, 0)
            popped = jnp.sum(
                jnp.where(iota_stack == spm, stack_ref[:], 0),
                axis=0,
                keepdims=True,
            )
            if leafq:
                # traversal exhausted: park if leaves are still queued
                fin = jnp.where(lqn2 > 0, _PARKED, _DONE)
            else:
                fin = _DONE
            nxt = jnp.where(
                stepped & best_hit,
                best_code,
                jnp.where(can_pop, popped, fin),
            )
            nxt = jnp.where(stepped, nxt, cur)
            if not closest:
                nxt = jnp.where(was_int & early, _DONE, nxt)
                if leafq:
                    # a fully-occluded packet drops its queued leaves
                    lqn_ref[:] = jnp.where(was_int & early, 0, lqn2)
            retired = was_int & (nxt == _DONE)
            nret = jnp.sum(retired.astype(jnp.int32))
            ndone = ndone + nret
            if unified:
                # object-space slot popping back to a TLAS row: restore
                need_rest = (
                    was_int
                    & (obj_ref[:].T == 1)
                    & jnp.logical_not(retired)
                    & (nxt >= tlas_lo)
                )
                nrest = jnp.sum(need_rest.astype(jnp.int32))
                aux_ref[:] = nxt.T
                cur_ref[:] = jnp.where(
                    retired, _RETIRE, jnp.where(need_rest, _RESTORE, nxt)
                ).T
            else:
                cur_ref[:] = jnp.where(retired, _RETIRE, nxt).T
            sp_ref[:] = jnp.where(can_pop, spm, sp2)
            _swap_block(nret)
            # refilled slots restart with an empty stack (replaces the
            # swap block's per-slot scalar sp resets)
            sp_ref[:] = jnp.where(retired, 0, sp_ref[:])
            if unified:
                _restore_block(nrest)

            useful = useful + jnp.sum(stepped.astype(jnp.int32))
            return ndone, it + 1, useful

        def leaf_iter(state):
            ndone, it, useful = state
            if leafq:
                # deferred mode: fetch by each slot's queue HEAD (-1 when
                # empty; the clamped unconditional fetch makes that an
                # idempotent row-0 re-test, and the streamed tier guards
                # the DMA on head >= 0)
                _fetch_rows(leafs_ref, lrow_scr,
                            leaf_sem if stream_tables else None,
                            lambda c: c >= 0, lambda c: c, addr_ref=lqh_ref)
            else:
                _fetch_rows(leafs_ref, lrow_scr,
                            leaf_sem if stream_tables else None,
                            lambda c: jnp.logical_and(c < 0, c > _DONE),
                            lambda c: -c - 1)
            lrows = lrow_scr[:]
            ox, oy, oz = w_ox[:], w_oy[:], w_oz[:]
            dx, dy, dz = w_dx[:], w_dy[:], w_dz[:]
            t_min = w_tmin[:]
            if closest:
                best_t = bt_scr[:]
                best_prim = bp_scr[:]
                best_u = bu_scr[:]
                best_v = bv_scr[:]
                hits, ts, us, vs, prims = _mt(
                    lrows, L, p_sub, ox, oy, oz, dx, dy, dz, t_min, best_t
                )
                if unified:
                    best_inst = bi_scr[:]
                    inst_b = _bcast(inst_scr[:, 0:1], p_sub).astype(jnp.int32)
                for j in range(L):
                    take_j = hits[j] & (ts[j] < best_t)
                    best_t = jnp.where(take_j, ts[j], best_t)
                    best_prim = jnp.where(take_j, prims[j], best_prim)
                    if unified:
                        best_inst = jnp.where(take_j, inst_b, best_inst)
                    best_u = jnp.where(take_j, us[j], best_u)
                    best_v = jnp.where(take_j, vs[j], best_v)
                bt_scr[:] = best_t
                bp_scr[:] = best_prim
                if unified:
                    bi_scr[:] = best_inst
                bu_scr[:] = best_u
                bv_scr[:] = best_v
            else:
                occ = occ_scr[:]
                hits, _, _, _, _ = _mt(
                    lrows, L, p_sub, ox, oy, oz, dx, dy, dz, t_min, w_tmax[:]
                )
                newly = hits[0]
                for j in range(1, L):
                    newly = newly | hits[j]
                occ = jnp.maximum(occ, jnp.where(newly, 1.0, 0.0))
                occ_scr[:] = occ
            if unified:
                roots_col = pltpu.bitcast(lrows[:, 12:13], jnp.int32)
                insts_col = (
                    pltpu.bitcast(lrows[:, 13:14], jnp.int32) if closest else None
                )

            if leafq:
                # --- deferred-mode stepping: dequeue one head per slot;
                # traversal state (cur/sp/stack) is untouched — it only
                # advances in node iterations. Parked slots whose queue
                # just drained retire here.
                cur = cur_ref[:].T  # (1,K)
                lqn = lqn_ref[:]  # (1,K)
                did = lqn > 0
                lqn2 = lqn - did.astype(jnp.int32)
                lq = lq_ref[:]
                shifted = jnp.concatenate(
                    [lq[1:], jnp.full((1, K), -1, jnp.int32)], axis=0
                )
                lq_ref[:] = jnp.where(did, shifted, lq)
                lqh_ref[:] = jnp.where(did, shifted[0:1, :], lq[0:1, :]).T
                if closest:
                    retired = (cur == _PARKED) & (lqn2 == 0)
                else:
                    early = (
                        _packet_reduce_min(occ, p_sub).reshape(K, 1).T > 0.0
                    )
                    # occluded packets retire regardless of queue depth
                    retired = ((cur == _PARKED) & (lqn2 == 0)) | (
                        (cur == _PARKED) & early
                    )
                    lqn2 = jnp.where(retired, 0, lqn2)
                lqn_ref[:] = lqn2
                nret = jnp.sum(retired.astype(jnp.int32))
                ndone = ndone + nret
                cur_ref[:] = jnp.where(retired, _RETIRE, cur).T
                _swap_block(nret)
                sp_ref[:] = jnp.where(retired, 0, sp_ref[:])
                useful = useful + jnp.sum(did.astype(jnp.int32))
                return ndone, it + 1, useful

            # --- vectorized slot stepping, LANE-major (see iota_stack note)
            cur = cur_ref[:].T  # (1,K)
            sp = sp_ref[:]  # (1,K)
            at_leaf = (cur < 0) & (cur > _DONE)
            if unified:
                leaf_code = -cur - 1
                is_entry = at_leaf & (leaf_code >= n_tri)
                is_tri = at_leaf & (leaf_code < n_tri)
            else:
                is_tri = at_leaf
            if closest:
                can_pop = is_tri & (sp > 0)
            else:
                early = _packet_reduce_min(occ, p_sub).reshape(K, 1).T > 0.0
                can_pop = is_tri & jnp.logical_not(early) & (sp > 0)
            spm = jnp.maximum(sp - 1, 0)
            popped = jnp.sum(
                jnp.where(iota_stack == spm, stack_ref[:], 0),
                axis=0,
                keepdims=True,
            )
            nxt = jnp.where(is_tri, jnp.where(can_pop, popped, _DONE), cur)
            if not closest:
                # a fully-occluded packet retires wherever it stands
                nxt = jnp.where(at_leaf & early, _DONE, nxt)
                if unified:
                    is_entry = is_entry & jnp.logical_not(early)
            retired = (is_tri if closest else at_leaf) & (nxt == _DONE)
            nret = jnp.sum(retired.astype(jnp.int32))
            ndone = ndone + nret
            if unified:
                need_rest = (
                    is_tri
                    & (obj_ref[:].T == 1)
                    & jnp.logical_not(retired)
                    & (nxt >= tlas_lo)
                )
                nrest = jnp.sum(need_rest.astype(jnp.int32))
                nent = jnp.sum(is_entry.astype(jnp.int32))
                aux_ref[:] = nxt.T
                cur_ref[:] = jnp.where(
                    is_entry,
                    _ENTRY,
                    jnp.where(
                        retired, _RETIRE, jnp.where(need_rest, _RESTORE, nxt)
                    ),
                ).T
            else:
                cur_ref[:] = jnp.where(retired, _RETIRE, nxt).T
            sp_ref[:] = jnp.where(can_pop, spm, sp)
            _swap_block(nret)
            sp_ref[:] = jnp.where(retired, 0, sp_ref[:])
            if unified:
                _entry_block(nent, lrows, roots_col, insts_col)
                _restore_block(nrest)

            useful = useful + jnp.sum(at_leaf.astype(jnp.int32))
            return ndone, it + 1, useful

        def merged_iter(state):
            """Merged node+leaf phase (flat kernels): EVERY slot advances
            one tree step per iteration — int slots fetch their node row
            and slab-descend, leaf slots fetch their leaf row and
            MT-then-pop — eliminating the phase-idle tax (measured 35-39%
            of slot-steps idle under phase alternation on the hall
            wavefronts: slots parked at the opposite phase's state).
            Leaf work runs FIRST so the slab t_cap sees this iteration's
            best-t improvements. MT on stale/foreign cached rows is safe
            for the same reason the leaf phase has always run unguarded:
            in the flat kernels all rows are same-space real triangles,
            and closest/any state only improves monotonically (strict
            t decrease / sticky OR) on genuine in-range intersections."""
            ndone, it, useful = state
            _fetch_rows(nodes_ref, nrow_scr, node_sem if stream_tables else None,
                        lambda c: c >= 0, lambda c: c, top_ref=ntop_ref)
            _fetch_rows(leafs_ref, lrow_scr, leaf_sem if stream_tables else None,
                        lambda c: jnp.logical_and(c < 0, c > _DONE),
                        lambda c: -c - 1)
            rows = nrow_scr[:]
            lrows = lrow_scr[:]
            ox, oy, oz = w_ox[:], w_oy[:], w_oz[:]
            dxv, dyv, dzv = w_dx[:], w_dy[:], w_dz[:]
            ix, iy, iz = w_ix[:], w_iy[:], w_iz[:]
            t_min = w_tmin[:]

            # --- leaf work (all slots, idempotent on stale rows)
            if closest:
                best_t = bt_scr[:]
                best_prim = bp_scr[:]
                best_u = bu_scr[:]
                best_v = bv_scr[:]
                hits, ts, us, vs, prims = _mt(
                    lrows, L, p_sub, ox, oy, oz, dxv, dyv, dzv, t_min, best_t
                )
                for j in range(L):
                    take_j = hits[j] & (ts[j] < best_t)
                    best_t = jnp.where(take_j, ts[j], best_t)
                    best_prim = jnp.where(take_j, prims[j], best_prim)
                    best_u = jnp.where(take_j, us[j], best_u)
                    best_v = jnp.where(take_j, vs[j], best_v)
                bt_scr[:] = best_t
                bp_scr[:] = best_prim
                bu_scr[:] = best_u
                bv_scr[:] = best_v
                t_cap = best_t
            else:
                occ = occ_scr[:]
                hits, _, _, _, _ = _mt(
                    lrows, L, p_sub, ox, oy, oz, dxv, dyv, dzv, t_min, w_tmax[:]
                )
                newly = hits[0]
                for j in range(1, L):
                    newly = newly | hits[j]
                occ = jnp.maximum(occ, jnp.where(newly, 1.0, 0.0))
                occ_scr[:] = occ
                t_cap = jnp.where(occ > 0.0, -_BIG, w_tmax[:])

            # --- node work (int slots; leaf slots' garbage is masked off)
            # closest: fused hit+entry reduce, same as node_iter
            ch_hit = []
            ch_keys = []
            for c in range(arity):
                hc, ec = _slab(
                    rows, 6 * c, p_sub, ox, oy, oz, ix, iy, iz, t_min, t_cap
                )
                if closest:
                    ch_keys.append(
                        _packet_reduce_min(
                            jnp.where(hc, ec, _BIG), p_sub
                        ).reshape(K, 1)
                    )
                else:
                    ch_hit.append(
                        _packet_reduce_max(jnp.where(hc, 1.0, 0.0), p_sub).reshape(
                            K, 1
                        )
                    )

            # --- combined vectorized stepping, LANE-major (see iota_stack)
            cur = cur_ref[:].T  # (1,K)
            sp = sp_ref[:]  # (1,K)
            was_int = cur >= 0
            at_leaf = (cur < 0) & (cur > _DONE)
            stepped = was_int | at_leaf
            codesT = pltpu.bitcast(
                rows[:, 6 * arity : 7 * arity], jnp.int32
            ).T  # (arity,K)
            codes = [codesT[c : c + 1, :] for c in range(arity)]
            if not closest:
                early = _packet_reduce_min(occ, p_sub).reshape(K, 1).T > 0.0
            if closest:
                keysT = jnp.concatenate(ch_keys, axis=1).T  # (arity,K)
                keys = [keysT[c : c + 1, :] for c in range(arity)]
                kcodes = list(codes)

                def _cswap(i, j):
                    swap = keys[i] > keys[j]
                    keys[i], keys[j] = (
                        jnp.where(swap, keys[j], keys[i]),
                        jnp.where(swap, keys[i], keys[j]),
                    )
                    kcodes[i], kcodes[j] = (
                        jnp.where(swap, kcodes[j], kcodes[i]),
                        jnp.where(swap, kcodes[i], kcodes[j]),
                    )

                for i, j in _SORT_NETS[arity]:
                    _cswap(i, j)
                best_hit = keys[0] < _BIG
                best_code = kcodes[0]
                sp2 = sp
                for c in range(arity - 1, 0, -1):
                    pm = (keys[c] < _BIG) & was_int
                    stack_ref[:] = jnp.where(
                        (iota_stack == sp2) & pm, kcodes[c], stack_ref[:]
                    )
                    sp2 = sp2 + pm.astype(jnp.int32)
            else:
                hitT = jnp.concatenate(ch_hit, axis=1).T  # (arity,K) f32
                chit = [hitT[c : c + 1, :] > 0.0 for c in range(arity)]
                best_hit = chit[0]
                best_code = codes[0]
                best_i = jnp.zeros((1, K), jnp.int32)
                for c in range(1, arity):
                    better = chit[c] & jnp.logical_not(best_hit)
                    best_code = jnp.where(better, codes[c], best_code)
                    best_i = jnp.where(better, c, best_i)
                    best_hit = best_hit | chit[c]
                sp2 = sp
                for c in range(arity):
                    pm = chit[c] & was_int & (best_i != c)
                    stack_ref[:] = jnp.where(
                        (iota_stack == sp2) & pm, codes[c], stack_ref[:]
                    )
                    sp2 = sp2 + pm.astype(jnp.int32)
            # pop: int slots with no hit child, and every leaf slot
            want_pop = (was_int & jnp.logical_not(best_hit)) | at_leaf
            if not closest:
                want_pop = want_pop & jnp.logical_not(early)
            can_pop = want_pop & (sp2 > 0)
            spm = jnp.maximum(sp2 - 1, 0)
            popped = jnp.sum(
                jnp.where(iota_stack == spm, stack_ref[:], 0),
                axis=0,
                keepdims=True,
            )
            nxt = jnp.where(
                was_int & best_hit,
                best_code,
                jnp.where(can_pop, popped, _DONE),
            )
            nxt = jnp.where(stepped, nxt, cur)
            if not closest:
                nxt = jnp.where(stepped & early, _DONE, nxt)
            retired = stepped & (nxt == _DONE)
            nret = jnp.sum(retired.astype(jnp.int32))
            ndone = ndone + nret
            cur_ref[:] = jnp.where(retired, _RETIRE, nxt).T
            sp_ref[:] = jnp.where(can_pop, spm, sp2)
            _swap_block(nret)
            sp_ref[:] = jnp.where(retired, 0, sp_ref[:])

            useful = useful + jnp.sum(stepped.astype(jnp.int32))
            return ndone, it + 1, useful

        # (packets retired, iterations, useful slot-steps) — the third
        # term counts slots actually advanced per phase; iterations*K
        # minus it is the phase-idle tax (see it_out row 1)
        init = (jnp.int32(0), jnp.int32(0), jnp.int32(0))

        def cond(state):
            return state[0] < n_packets

        if merged and not unified:
            body = merged_iter
        elif leafq:
            # threshold scales with the number of slots that can ever be
            # live (small waves never fill all K slots — a K-based
            # threshold would defer every leaf until traversal exhaustion,
            # losing all best-t culling)
            live_cap = min(K, n_packets)
            qmin = (
                min(LEAFQ_SLOTS, live_cap)
                if LEAFQ_SLOTS is not None
                else max(1, (3 * live_cap) // 4)
            )

            def body(state):
                curT = cur_ref[:].T  # (1,K)
                lqn = lqn_ref[:]  # (1,K)
                is_int = curT >= 0
                n_int = jnp.sum(is_int.astype(jnp.int32))
                nonempty = jnp.sum((lqn > 0).astype(jnp.int32))
                # run a leaf phase when: enough queues are worth batching;
                # or an internal slot could overflow its FIFO next step
                # (after which node steps can never stall); or no slot has
                # node work left (parked slots only drain in leaf phases)
                near_full = (
                    jnp.sum((is_int & (lqn > leafq - arity)).astype(jnp.int32))
                    > 0
                )
                do_leaf = (nonempty >= qmin) | near_full | (n_int == 0)
                return jax.lax.cond(do_leaf, leaf_iter, node_iter, state)
        else:

            def body(state):
                cur = cur_ref[:]
                n_int = jnp.sum((cur >= 0).astype(jnp.int32))
                n_leaf = jnp.sum(((cur < 0) & (cur > _DONE)).astype(jnp.int32))
                do_leaf = jnp.logical_or(n_leaf >= leaf_thresh, n_int == 0)
                return jax.lax.cond(do_leaf, leaf_iter, node_iter, state)

        _, it, useful = jax.lax.while_loop(cond, body, init)
        out_col = jax.lax.broadcasted_iota(jnp.int32, (8, P_LANE), 0)
        it_out[:] = jnp.where(out_col == 1, useful, it)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "depth", "n_packets", "n_tri", "tlas_lo", "p_sub", "kk", "lt",
        "stream", "arity", "interpret",
    ),
)
def _closest_unified_call_persistent(
    nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, L, depth, n_packets, n_tri, tlas_lo, p_sub, kk=None, lt=None,
    stream=False, arity=2, interpret=False,
):
    kk = K if kk is None else kk
    lt = LEAF_THRESH if lt is None else lt
    if stream:
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        leafs = jnp.pad(leafs, ((0, 0), (0, 128 - leafs.shape[1])))
    rows = n_packets * p_sub
    shape = (rows, P_LANE)
    wshape = (kk * p_sub, P_LANE)
    return pl.pallas_call(
        _make_persistent_kernel(
            closest=True, unified=True, L=L, depth=depth, p_sub=p_sub,
            n_packets=n_packets, kk=kk, leaf_thresh=lt, n_tri=n_tri,
            tlas_lo=tlas_lo, stream_tables=stream, arity=arity,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)
        ] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM(wshape, jnp.float32)] * 10
        + [
            pltpu.VMEM(wshape, jnp.float32),  # bt
            pltpu.VMEM(wshape, jnp.int32),  # bp
            pltpu.VMEM(wshape, jnp.int32),  # bi
            pltpu.VMEM(wshape, jnp.float32),  # bu
            pltpu.VMEM(wshape, jnp.float32),  # bv
            pltpu.VMEM((kk, P_LANE), jnp.float32),  # inst
            pltpu.VMEM((kk, 128 if stream else arity * 8), jnp.float32),
            pltpu.VMEM((kk, 128 if stream else 10 * L), jnp.float32),
            pltpu.VMEM((depth, kk), jnp.int32),  # stacks (lane-major)
            pltpu.VMEM((kk, 1), jnp.int32),  # cur
            pltpu.VMEM((1, kk), jnp.int32),  # sp (lane-major)
            pltpu.VMEM((kk, 1), jnp.int32),  # obj
            pltpu.VMEM((kk, 1), jnp.int32),  # aux
            pltpu.SMEM((kk,), jnp.int32),  # slotpkt
            pltpu.SMEM((1,), jnp.int32),
        ]
        + ([pltpu.SemaphoreType.DMA((kk,))] * 2 if stream else []),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "depth", "n_packets", "n_tri", "tlas_lo", "p_sub", "kk", "lt",
        "stream", "arity", "interpret",
    ),
)
def _any_unified_call_persistent(
    nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, L, depth, n_packets, n_tri, tlas_lo, p_sub, kk=None, lt=None,
    stream=False, arity=2, interpret=False,
):
    kk = K if kk is None else kk
    lt = LEAF_THRESH if lt is None else lt
    if stream:
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        leafs = jnp.pad(leafs, ((0, 0), (0, 128 - leafs.shape[1])))
    rows = n_packets * p_sub
    wshape = (kk * p_sub, P_LANE)
    return pl.pallas_call(
        _make_persistent_kernel(
            closest=False, unified=True, L=L, depth=depth, p_sub=p_sub,
            n_packets=n_packets, kk=kk, leaf_thresh=lt, n_tri=n_tri,
            tlas_lo=tlas_lo, stream_tables=stream, arity=arity,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)
        ] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((rows, P_LANE), jnp.bool_),
            jax.ShapeDtypeStruct((8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM(wshape, jnp.float32)] * 11
        + [
            pltpu.VMEM(wshape, jnp.float32),  # occ
            pltpu.VMEM((kk, 128 if stream else arity * 8), jnp.float32),
            pltpu.VMEM((kk, 128 if stream else 10 * L), jnp.float32),
            pltpu.VMEM((depth, kk), jnp.int32),  # stacks (lane-major)
            pltpu.VMEM((kk, 1), jnp.int32),  # cur
            pltpu.VMEM((1, kk), jnp.int32),  # sp (lane-major)
            pltpu.VMEM((kk, 1), jnp.int32),  # obj
            pltpu.VMEM((kk, 1), jnp.int32),  # aux
            pltpu.SMEM((kk,), jnp.int32),  # slotpkt
            pltpu.SMEM((1,), jnp.int32),
        ]
        + ([pltpu.SemaphoreType.DMA((kk,))] * 2 if stream else []),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


def unified_persistent_eligible(
    ubvh, n_rays: int, p_sub: int = DEFAULT_P_SUB, closest: bool = True
) -> bool:
    """Gate for the unified persistent kernels: binary or BVH4 rows,
    builder-certified stack bound, and tables + resident rays/outputs
    (_ray_arrays: mode-dependent) within the VMEM budget."""
    if (
        ubvh.arity not in (2, 4, 8)
        or ubvh.stack_bound is None
        or ubvh.leaf_rows.shape[0] <= 1
    ):
        return False
    n_packets = max(1, -(-n_rays // (p_sub * P_LANE)))
    ray_bytes = _ray_arrays(closest, True) * n_packets * p_sub * P_LANE * 4
    table_bytes = _vmem_window_bytes(ubvh.nodes) + _vmem_window_bytes(ubvh.leaf_rows)
    scratch = 18 * K * p_sub * P_LANE * 4
    return table_bytes + ray_bytes + scratch <= VMEM_FIT_BUDGET


def traverse_closest_unified_persistent(
    ubvh, orig, dir, t_min, active, t_max=None,
    interpret=False, p_sub=DEFAULT_P_SUB, k_slots=None, leaf_thresh=None,
    stream=False,
):
    """Work-queue persistent closest-hit traversal of a UnifiedBvh.
    Same contract as ops.traverse.traverse_closest_unified_blocked:
    returns (t, prim, inst, u, v), prim/inst = -1 on miss. k_slots /
    leaf_thresh override the module defaults (tests use small slot counts
    so interpret-mode coverage reaches the swap/restore paths)."""
    R = orig.shape[0]
    n_packets = max(1, -(-R // (p_sub * P_LANE)))
    ox = _pack_rays_pm(jnp.where(active, orig[:, 0], _BIG), n_packets, p_sub, _BIG)
    oy = _pack_rays_pm(jnp.where(active, orig[:, 1], _BIG), n_packets, p_sub, _BIG)
    oz = _pack_rays_pm(jnp.where(active, orig[:, 2], _BIG), n_packets, p_sub, _BIG)
    dx = _pack_rays_pm(jnp.where(active, dir[:, 0], 1.0), n_packets, p_sub, 1.0)
    dy = _pack_rays_pm(jnp.where(active, dir[:, 1], 1.0), n_packets, p_sub, 1.0)
    dz = _pack_rays_pm(jnp.where(active, dir[:, 2], 1.0), n_packets, p_sub, 1.0)
    tmin = _pack_rays_pm(jnp.broadcast_to(t_min, (R,)), n_packets, p_sub)
    if t_max is None:
        t_max = jnp.full((R,), T_MAX, jnp.float32)
    tmax = _pack_rays_pm(jnp.broadcast_to(t_max, (R,)), n_packets, p_sub)

    depth = max(2, int(ubvh.stack_bound) + 1)
    t, prim, inst, u, v, _ = _closest_unified_call_persistent(
        ubvh.nodes, ubvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=ubvh.leaf_size, depth=depth, n_packets=n_packets,
        n_tri=int(ubvh.n_tri_leaves), tlas_lo=int(ubvh.tlas_lo),
        p_sub=p_sub, kk=k_slots, lt=leaf_thresh, stream=stream,
        arity=ubvh.arity, interpret=interpret,
    )
    t = _unpack_rays_pm(t, R)
    prim = _unpack_rays_pm(prim, R)
    inst = _unpack_rays_pm(inst, R)
    u = _unpack_rays_pm(u, R)
    v = _unpack_rays_pm(v, R)
    miss = (prim < 0) | ~active
    return (
        jnp.where(miss, T_MAX, t),
        jnp.where(miss, -1, prim),
        jnp.where(miss, -1, inst),
        jnp.where(miss, 0.0, u),
        jnp.where(miss, 0.0, v),
    )


def traverse_any_unified_persistent(
    ubvh, orig, dir, t_min, t_max, mask,
    interpret=False, p_sub=DEFAULT_P_SUB, k_slots=None, leaf_thresh=None,
    stream=False,
):
    """Work-queue persistent any-hit traversal of a UnifiedBvh. Same
    contract as traverse_any_unified_blocked: (R,) bool occluded."""
    R = orig.shape[0]
    n_packets = max(1, -(-R // (p_sub * P_LANE)))
    ox = _pack_rays_pm(jnp.where(mask, orig[:, 0], _BIG), n_packets, p_sub, _BIG)
    oy = _pack_rays_pm(jnp.where(mask, orig[:, 1], _BIG), n_packets, p_sub, _BIG)
    oz = _pack_rays_pm(jnp.where(mask, orig[:, 2], _BIG), n_packets, p_sub, _BIG)
    dx = _pack_rays_pm(jnp.where(mask, dir[:, 0], 1.0), n_packets, p_sub, 1.0)
    dy = _pack_rays_pm(jnp.where(mask, dir[:, 1], 1.0), n_packets, p_sub, 1.0)
    dz = _pack_rays_pm(jnp.where(mask, dir[:, 2], 1.0), n_packets, p_sub, 1.0)
    tmin = _pack_rays_pm(jnp.broadcast_to(t_min, (R,)), n_packets, p_sub)
    tmax = _pack_rays_pm(
        jnp.where(mask, jnp.broadcast_to(t_max, (R,)), -1.0), n_packets, p_sub, -1.0
    )

    depth = max(2, int(ubvh.stack_bound) + 1)
    occ, _ = _any_unified_call_persistent(
        ubvh.nodes, ubvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=ubvh.leaf_size, depth=depth, n_packets=n_packets,
        n_tri=int(ubvh.n_tri_leaves), tlas_lo=int(ubvh.tlas_lo),
        p_sub=p_sub, kk=k_slots, lt=leaf_thresh, stream=stream,
        arity=ubvh.arity, interpret=interpret,
    )
    return _unpack_rays_pm(occ, R) & mask


def _pack_rays_pm(x, n_packets, p_sub, pad_value=0.0):
    """(R,) -> packet-major (n_packets*p_sub, 128): packet p's rays are its
    contiguous rows [p*p_sub, (p+1)*p_sub). Tail padded with pad_value
    (pad origins with _BIG so padding lanes slab-miss everything)."""
    need = n_packets * p_sub * P_LANE
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]), constant_values=pad_value)
    return x.reshape(n_packets * p_sub, P_LANE)


def _unpack_rays_pm(y, R):
    return y.reshape(-1)[:R]


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "depth", "n_packets", "p_sub", "kk", "lt", "stream", "arity",
        "interpret", "merged", "leafq", "n_top",
    ),
)
def _closest_call_persistent(
    nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, L, depth, n_packets, p_sub, kk=None, lt=None, stream=False, arity=2,
    interpret=False, merged=False, leafq=None, n_top=0,
):
    kk = K if kk is None else kk
    lt = LEAF_THRESH if lt is None else lt
    if leafq is None:
        # deferred leaf queues pay off by batching leaf phases across FULL
        # slot occupancy; sub-K waves (toy renders) lose to the enqueue
        # overhead and the culling lag, so they keep phase alternation
        leafq = 0 if (merged or n_packets < kk) else LEAFQ_CAP
    leafq = _leafq_for(arity, leafq)
    top = ()
    if stream:
        if n_top:
            # VMEM-pinned tree top at true row width (BFS row order makes
            # the prefix the most-visited levels; see bvhbuilder.cpp
            # bfs_reorder)
            top = (nodes[: min(n_top, nodes.shape[0])],)
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        leafs = jnp.pad(leafs, ((0, 0), (0, 128 - leafs.shape[1])))
    else:
        n_top = 0
    rows = n_packets * p_sub
    shape = (rows, P_LANE)
    wshape = (kk * p_sub, P_LANE)
    return pl.pallas_call(
        _make_persistent_kernel(
            closest=True, unified=False, L=L, depth=depth, p_sub=p_sub,
            n_packets=n_packets, kk=kk, leaf_thresh=lt, stream_tables=stream, arity=arity,
            merged=merged, leafq=leafq, n_top=n_top,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)]
        + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if top else [])
        + [pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM(wshape, jnp.float32)] * 10
        + [
            pltpu.VMEM(wshape, jnp.float32),  # bt
            pltpu.VMEM(wshape, jnp.int32),  # bp
            pltpu.VMEM(wshape, jnp.float32),  # bu
            pltpu.VMEM(wshape, jnp.float32),  # bv
            pltpu.VMEM((kk, 128 if stream else arity * 8), jnp.float32),
            pltpu.VMEM((kk, 128 if stream else 10 * L), jnp.float32),
            pltpu.VMEM((depth, kk), jnp.int32),  # stacks (lane-major)
            pltpu.VMEM((kk, 1), jnp.int32),  # cur
            pltpu.VMEM((1, kk), jnp.int32),  # sp (lane-major)
        ]
        + (
            [
                pltpu.VMEM((leafq, kk), jnp.int32),  # leaf FIFO (lane-major)
                pltpu.VMEM((kk, 1), jnp.int32),  # FIFO head mirror
                pltpu.VMEM((1, kk), jnp.int32),  # queue occupancy
            ]
            if leafq
            else []
        )
        + [
            pltpu.SMEM((kk,), jnp.int32),  # slotpkt
            pltpu.SMEM((1,), jnp.int32),
        ]
        + ([pltpu.SemaphoreType.DMA((kk,))] * 2 if stream else []),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(nodes, *top, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "depth", "n_packets", "p_sub", "kk", "lt", "stream", "arity",
        "interpret", "merged", "leafq", "n_top",
    ),
)
def _any_call_persistent(
    nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, L, depth, n_packets, p_sub, kk=None, lt=None, stream=False, arity=2,
    interpret=False, merged=False, leafq=None, n_top=0,
):
    kk = K if kk is None else kk
    lt = LEAF_THRESH if lt is None else lt
    if leafq is None:
        # deferred leaf queues pay off by batching leaf phases across FULL
        # slot occupancy; sub-K waves (toy renders) lose to the enqueue
        # overhead and the culling lag, so they keep phase alternation
        leafq = 0 if (merged or n_packets < kk) else LEAFQ_CAP
    leafq = _leafq_for(arity, leafq)
    top = ()
    if stream:
        if n_top:
            top = (nodes[: min(n_top, nodes.shape[0])],)
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        leafs = jnp.pad(leafs, ((0, 0), (0, 128 - leafs.shape[1])))
    else:
        n_top = 0
    rows = n_packets * p_sub
    wshape = (kk * p_sub, P_LANE)
    return pl.pallas_call(
        _make_persistent_kernel(
            closest=False, unified=False, L=L, depth=depth, p_sub=p_sub,
            n_packets=n_packets, kk=kk, leaf_thresh=lt, stream_tables=stream, arity=arity,
            merged=merged, leafq=leafq, n_top=n_top,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)]
        + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if top else [])
        + [pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((rows, P_LANE), jnp.bool_),
            jax.ShapeDtypeStruct((8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM(wshape, jnp.float32)] * 11
        + [
            pltpu.VMEM(wshape, jnp.float32),  # occ
            pltpu.VMEM((kk, 128 if stream else arity * 8), jnp.float32),
            pltpu.VMEM((kk, 128 if stream else 10 * L), jnp.float32),
            pltpu.VMEM((depth, kk), jnp.int32),  # stacks (lane-major)
            pltpu.VMEM((kk, 1), jnp.int32),  # cur
            pltpu.VMEM((1, kk), jnp.int32),  # sp (lane-major)
        ]
        + (
            [
                pltpu.VMEM((leafq, kk), jnp.int32),  # leaf FIFO (lane-major)
                pltpu.VMEM((kk, 1), jnp.int32),  # FIFO head mirror
                pltpu.VMEM((1, kk), jnp.int32),  # queue occupancy
            ]
            if leafq
            else []
        )
        + [
            pltpu.SMEM((kk,), jnp.int32),  # slotpkt
            pltpu.SMEM((1,), jnp.int32),
        ]
        + ([pltpu.SemaphoreType.DMA((kk,))] * 2 if stream else []),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(nodes, *top, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


def _auto_n_top(pbvh, n_rays: int, p_sub: int, closest: bool) -> int:
    """Node-table rows to pin in VMEM for the streamed tier. The builder
    emits BFS row order (bvhbuilder.cpp bfs_reorder), so rows[:n] are the
    top levels — visit frequency decays geometrically with level, and a
    VMEM prefix absorbs the bulk of node fetches while only deep-subtree
    rows pay an HBM DMA. Budget: whatever VMEM the resident rays/outputs/
    scratch leave under VMEM_FIT_BUDGET, minus slack (an untiled (n, w)
    f32 VMEM window costs n*128*4 bytes regardless of w <= 128 — Mosaic
    pads the lane dim; see _vmem_window_bytes). Env CHAMELEONRT_STREAM_TOP
    overrides (0 disables).

    DEFAULT 0 — measured a LOSS on v5e (rungholt_city 640x360 frames:
    no pin 904 ms, 16K-row pin 1093 ms, max-VMEM auto pin 1479 ms; round
    5). The split fetch's extra per-slot conditional loops cost more than
    the avoided DMAs: the K row DMAs of an iteration are issued together
    and overlap into ~one HBM round trip regardless, so pinning saves
    bandwidth the iteration never waits on, while its dma_cond/VMEM-copy
    scalar loops run every iteration. The knob stays for re-measurement
    on hardware with different DMA latency."""
    ov = _os.environ.get("CHAMELEONRT_STREAM_TOP")
    if ov is not None:
        n = int(ov)
        if n < 0:
            raise ValueError(f"CHAMELEONRT_STREAM_TOP must be >= 0, got {n}")
        return min(n, int(pbvh.nodes.shape[0]))
    return 0


def _merged_phase_default() -> bool:
    """Merged node+leaf phase for the FLAT persistent kernels (every slot
    advances every iteration; see _make_persistent_kernel.merged_iter).
    Env CHAMELEONRT_MERGED_PHASE=0/1 overrides."""
    ov = _os.environ.get("CHAMELEONRT_MERGED_PHASE")
    if ov is not None:
        return ov not in ("0", "false", "off")
    return False


def traverse_closest_persistent(
    pbvh: PackedBvh, orig, dir, t_min, active, t_max=None,
    interpret=False, return_iters=False, p_sub=DEFAULT_P_SUB,
    k_slots=None, leaf_thresh=None, stream=False, merged=None, n_top=None,
):
    """Work-queue persistent closest-hit traversal. Same contract as
    traverse_closest_packet."""
    if merged is None:
        merged = _merged_phase_default()
    if n_top is None:
        n_top = _auto_n_top(pbvh, orig.shape[0], p_sub, True) if stream else 0
    R = orig.shape[0]
    n_packets = max(1, -(-R // (p_sub * P_LANE)))
    ox = _pack_rays_pm(jnp.where(active, orig[:, 0], _BIG), n_packets, p_sub, _BIG)
    oy = _pack_rays_pm(jnp.where(active, orig[:, 1], _BIG), n_packets, p_sub, _BIG)
    oz = _pack_rays_pm(jnp.where(active, orig[:, 2], _BIG), n_packets, p_sub, _BIG)
    dx = _pack_rays_pm(jnp.where(active, dir[:, 0], 1.0), n_packets, p_sub, 1.0)
    dy = _pack_rays_pm(jnp.where(active, dir[:, 1], 1.0), n_packets, p_sub, 1.0)
    dz = _pack_rays_pm(jnp.where(active, dir[:, 2], 1.0), n_packets, p_sub, 1.0)
    tmin = _pack_rays_pm(jnp.broadcast_to(t_min, (R,)), n_packets, p_sub)
    if t_max is None:
        t_max = jnp.full((R,), T_MAX, jnp.float32)
    tmax = _pack_rays_pm(jnp.broadcast_to(t_max, (R,)), n_packets, p_sub)

    depth = max(2, int(pbvh.max_depth) + 1)
    t, prim, u, v, iters = _closest_call_persistent(
        pbvh.nodes, pbvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=pbvh.leaf_size, depth=depth, n_packets=n_packets, p_sub=p_sub,
        kk=k_slots, lt=leaf_thresh, stream=stream, arity=pbvh.arity,
        interpret=interpret, merged=merged, n_top=n_top,
    )
    if return_iters:
        # (iterations, useful slot-steps) — see the kernel's it_out layout
        return iters[0, 0], iters[1, 0]
    t = _unpack_rays_pm(t, R)
    prim = _unpack_rays_pm(prim, R)
    u = _unpack_rays_pm(u, R)
    v = _unpack_rays_pm(v, R)
    miss = (prim < 0) | ~active
    return (
        jnp.where(miss, T_MAX, t),
        jnp.where(miss, -1, prim),
        jnp.where(miss, 0.0, u),
        jnp.where(miss, 0.0, v),
    )


def traverse_any_persistent(
    pbvh: PackedBvh, orig, dir, t_min, t_max, mask,
    interpret=False, return_iters=False, p_sub=DEFAULT_P_SUB,
    k_slots=None, leaf_thresh=None, stream=False, merged=None, n_top=None,
):
    """Work-queue persistent any-hit traversal. Same contract as
    traverse_any_packet."""
    if merged is None:
        merged = _merged_phase_default()
    if n_top is None:
        n_top = _auto_n_top(pbvh, orig.shape[0], p_sub, False) if stream else 0
    R = orig.shape[0]
    n_packets = max(1, -(-R // (p_sub * P_LANE)))
    ox = _pack_rays_pm(jnp.where(mask, orig[:, 0], _BIG), n_packets, p_sub, _BIG)
    oy = _pack_rays_pm(jnp.where(mask, orig[:, 1], _BIG), n_packets, p_sub, _BIG)
    oz = _pack_rays_pm(jnp.where(mask, orig[:, 2], _BIG), n_packets, p_sub, _BIG)
    dx = _pack_rays_pm(jnp.where(mask, dir[:, 0], 1.0), n_packets, p_sub, 1.0)
    dy = _pack_rays_pm(jnp.where(mask, dir[:, 1], 1.0), n_packets, p_sub, 1.0)
    dz = _pack_rays_pm(jnp.where(mask, dir[:, 2], 1.0), n_packets, p_sub, 1.0)
    tmin = _pack_rays_pm(jnp.broadcast_to(t_min, (R,)), n_packets, p_sub)
    tmax = _pack_rays_pm(
        jnp.where(mask, jnp.broadcast_to(t_max, (R,)), -1.0), n_packets, p_sub, -1.0
    )

    depth = max(2, int(pbvh.max_depth) + 1)
    occ, iters = _any_call_persistent(
        pbvh.nodes, pbvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=pbvh.leaf_size, depth=depth, n_packets=n_packets, p_sub=p_sub,
        kk=k_slots, lt=leaf_thresh, stream=stream, arity=pbvh.arity,
        interpret=interpret, merged=merged, n_top=n_top,
    )
    if return_iters:
        # (iterations, useful slot-steps) — see the kernel's it_out layout
        return iters[0, 0], iters[1, 0]
    return _unpack_rays_pm(occ, R) & mask


# Streamed-tier ray/output/scratch budget: with node+leaf tables left in
# HBM, the per-wavefront VMEM residents (ray inputs, outputs, slot scratch)
# must stay under this bound. v5e VMEM is 128 MiB; leave headroom.
VMEM_TABLE_BUDGET = 88 * 1024 * 1024
# Whole-kernel fit budget for the padded-footprint accounting below
# (4 MiB headroom under VMEM_LIMIT for the few-MiB of allocations the
# estimate doesn't itemize — semaphores, iter counter, compiler slack).
VMEM_FIT_BUDGET = 120 * 1024 * 1024


def _vmem_window_bytes(arr) -> int:
    """True scoped-VMEM footprint of an untiled (rows, cols) f32 window:
    Mosaic pads the minor dim to the 128-lane register width and the
    sublane dim to 8. Measured on v5e (compiler allocation dump): a
    (122880, 40) f32 leaf table costs 60.00 MiB in VMEM — rows*128*4 —
    not the 19.7 MiB of its unpadded bytes, and a (61440, 32) node table
    30.00 MiB. Eligibility gates that ignored this padding green-lit a
    135 MiB kernel on the San Miguel-class unified scene, which the
    compiler then refused (scoped VMEM over the 124 MiB limit)."""
    assert arr.ndim == 2 and arr.dtype == jnp.float32, (
        f"VMEM window accounting assumes 2D f32 tables, got "
        f"{arr.shape} {arr.dtype}"
    )
    rows, cols = arr.shape
    return (-(-rows // 8) * 8) * (-(-cols // 128) * 128) * 4


def _ray_arrays(closest: bool, unified: bool = False) -> int:
    """Count of n_packets-sized VMEM arrays a persistent kernel holds:
    8 ray inputs (o, d, tmin, tmax) plus the mode's outputs — closest
    t/prim/u/v (+inst on unified), any just the occlusion mask. The any
    kernels' smaller footprint is what lets a stacked 2R occlusion
    wavefront (both MIS branches in one call) fit the VMEM budget."""
    if closest:
        return 13 if unified else 12
    return 9


def persistent_stream_eligible(
    pbvh, n_rays: int, p_sub: int = DEFAULT_P_SUB, closest: bool = True
) -> bool:
    """Gate for the DMA-streamed persistent kernels: node/leaf tables stay
    in HBM (any scene size), only rays, outputs and slot scratch must fit
    VMEM. The fall-through tier when persistent_eligible's table budget is
    exceeded — Rungholt-class scenes run HERE instead of dropping to the
    ~100x-slower XLA gather path (the reference's traversal is HBM-native
    at any scale, rtcIntersectV / render_embree.ispc:245)."""
    n_leaves = getattr(pbvh, "num_leaves", None)
    if n_leaves is None:  # UnifiedBvh carries leaf rows, not a leaf count
        n_leaves = pbvh.leaf_rows.shape[0]
    if pbvh.arity not in (2, 4, 8) or n_leaves <= 1:
        return False
    bound = getattr(pbvh, "stack_bound", None)
    if bound is None:
        bound = getattr(pbvh, "max_depth", None)
    if bound is None:
        return False
    n_packets = max(1, -(-n_rays // (p_sub * P_LANE)))
    ray_bytes = _ray_arrays(closest, True) * n_packets * p_sub * P_LANE * 4
    scratch = 18 * K * p_sub * P_LANE * 4
    return ray_bytes + scratch <= VMEM_TABLE_BUDGET


def _packet_structure_ok(pbvh: PackedBvh) -> bool:
    return not (
        pbvh.arity not in (2, 4, 8)
        or pbvh.max_depth is None
        or pbvh.num_leaves <= 1
    )


def packet_eligible(pbvh: PackedBvh, p_sub: int = DEFAULT_P_SUB) -> bool:
    """True when the packet kernels can traverse this BVH: binary or BVH4
    layout, builder-certified stack depth, >1 leaf, tables that fit VMEM.
    (The grid kernels remain binary-only; the caller routes BVH4 through
    the persistent kernels.) The grid kernel additionally double-buffers
    8 input + 5 output (K*p_sub, 128) ray blocks per pipeline step plus
    the slot scratch — itemize those against the budget rather than
    relying on headroom (ADVICE r3 #1)."""
    if not _packet_structure_ok(pbvh):
        return False
    table_bytes = _vmem_window_bytes(pbvh.nodes) + _vmem_window_bytes(pbvh.leaf_rows)
    block = K * p_sub * P_LANE * 4
    pipeline_bytes = 2 * (8 + 5) * block  # double-buffered in/out ray blocks
    scratch_bytes = 16 * block  # kernel VMEM scratch (rows + slot state)
    return table_bytes + pipeline_bytes + scratch_bytes <= VMEM_FIT_BUDGET


def persistent_eligible(
    pbvh: PackedBvh, n_rays: int, p_sub: int = DEFAULT_P_SUB, closest: bool = True
) -> bool:
    """The persistent kernels additionally keep ALL ray fields (8) and
    the mode's outputs (_ray_arrays) resident in VMEM next to the tables;
    gate on the combined footprint. Measured ~2x over the grid kernels on
    the hall wavefronts (b0 160->79 ms, b1 365->209 ms) because slots
    pull fresh packets from the queue instead of idling on the group
    barrier."""
    if not _packet_structure_ok(pbvh):
        return False
    n_packets = max(1, -(-n_rays // (p_sub * P_LANE)))
    ray_bytes = _ray_arrays(closest) * n_packets * p_sub * P_LANE * 4
    table_bytes = _vmem_window_bytes(pbvh.nodes) + _vmem_window_bytes(pbvh.leaf_rows)
    scratch = 16 * K * p_sub * P_LANE * 4
    return table_bytes + ray_bytes + scratch <= VMEM_FIT_BUDGET


def traverse_closest_packet(
    pbvh: PackedBvh, orig, dir, t_min, active, t_max=None,
    interpret=False, return_iters=False, p_sub=DEFAULT_P_SUB,
):
    """Closest-hit packet traversal. Same contract as
    ops.traverse.traverse_closest_blocked: returns (t, prim, u, v) with
    prim=-1 on miss. Rays should be pre-sorted (ray_sort_perm) for packet
    coherence; dead lanes are parked at +1e30 so all-dead packets retire
    after one root test."""
    R = orig.shape[0]
    group = K * p_sub * P_LANE
    G = max(1, -(-R // group))
    ox = _pack_rays(jnp.where(active, orig[:, 0], _BIG), G, p_sub, _BIG)
    oy = _pack_rays(jnp.where(active, orig[:, 1], _BIG), G, p_sub, _BIG)
    oz = _pack_rays(jnp.where(active, orig[:, 2], _BIG), G, p_sub, _BIG)
    dx = _pack_rays(jnp.where(active, dir[:, 0], 1.0), G, p_sub, 1.0)
    dy = _pack_rays(jnp.where(active, dir[:, 1], 1.0), G, p_sub, 1.0)
    dz = _pack_rays(jnp.where(active, dir[:, 2], 1.0), G, p_sub, 1.0)
    tmin = _pack_rays(jnp.broadcast_to(t_min, (R,)), G, p_sub)
    if t_max is None:
        t_max = jnp.full((R,), T_MAX, jnp.float32)
    tmax = _pack_rays(jnp.broadcast_to(t_max, (R,)), G, p_sub)

    depth = max(2, int(pbvh.max_depth) + 1)
    t, prim, u, v, iters = _closest_call(
        pbvh.nodes,
        pbvh.leaf_rows,
        ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=pbvh.leaf_size,
        depth=depth,
        G=G,
        p_sub=p_sub,
        interpret=interpret,
    )
    if return_iters:
        return iters[::8, 0]
    t = _unpack_rays(t, R, p_sub)
    prim = _unpack_rays(prim, R, p_sub)
    u = _unpack_rays(u, R, p_sub)
    v = _unpack_rays(v, R, p_sub)
    miss = (prim < 0) | ~active
    return (
        jnp.where(miss, T_MAX, t),
        jnp.where(miss, -1, prim),
        jnp.where(miss, 0.0, u),
        jnp.where(miss, 0.0, v),
    )


def traverse_any_packet(
    pbvh: PackedBvh, orig, dir, t_min, t_max, mask,
    interpret=False, return_iters=False, p_sub=DEFAULT_P_SUB,
):
    """Any-hit packet traversal. Same contract as traverse_any_blocked:
    returns (R,) bool occluded."""
    R = orig.shape[0]
    group = K * p_sub * P_LANE
    G = max(1, -(-R // group))
    ox = _pack_rays(jnp.where(mask, orig[:, 0], _BIG), G, p_sub, _BIG)
    oy = _pack_rays(jnp.where(mask, orig[:, 1], _BIG), G, p_sub, _BIG)
    oz = _pack_rays(jnp.where(mask, orig[:, 2], _BIG), G, p_sub, _BIG)
    dx = _pack_rays(jnp.where(mask, dir[:, 0], 1.0), G, p_sub, 1.0)
    dy = _pack_rays(jnp.where(mask, dir[:, 1], 1.0), G, p_sub, 1.0)
    dz = _pack_rays(jnp.where(mask, dir[:, 2], 1.0), G, p_sub, 1.0)
    tmin = _pack_rays(jnp.broadcast_to(t_min, (R,)), G, p_sub)
    # dead lanes enter pre-occluded (tmax<=0) so packet early-out can fire;
    # the final AND with mask strips them (padding tail likewise at -1)
    tmax = _pack_rays(
        jnp.where(mask, jnp.broadcast_to(t_max, (R,)), -1.0), G, p_sub, -1.0
    )

    depth = max(2, int(pbvh.max_depth) + 1)
    occ, iters = _any_call(
        pbvh.nodes,
        pbvh.leaf_rows,
        ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=pbvh.leaf_size,
        depth=depth,
        G=G,
        p_sub=p_sub,
        interpret=interpret,
    )
    if return_iters:
        return iters[::8, 0]
    return _unpack_rays(occ, R, p_sub) & mask
