"""Slot-lane Pallas traversal kernels (round 5): the structural answer to
the round-4 roofline verdict (docs/ARCHITECTURE.md) that ~92% of the
persistent kernel's iteration cost was per-slot vector-op overhead at <1%
machine utilization.

LAYOUT INVERSION vs ops/traverse_packet.py: there a slot's packet occupies
SUBLANE rows of (K*p_sub, 128) blocks and every per-slot quantity is a
(K,1)/(1,K) sliver, so each vector op keeps only 1..p_sub*128 of 1024 vreg
elements useful. Here the K=128 slots live ON THE LANES — one packet per
lane column — and a packet's S rays run down the SUBLANES, so the working
block per ray coordinate is (S, K) and EVERY slab/MT op is a full-density
(8,128)-vreg op across all 128 packets at once. Consequences (measured,
scripts/roofline_probe.py step3 on v5e):

  - per-child packet reduces become sublane halving trees landing directly
    as (1, K) lane-major keys — no cross-lane shuffle tree (priced at ~40%
    of the shipped node step);
  - box/triangle broadcasts become sublane broadcasts of (1, K) rows from
    ONE transposed (row_w, K) node-row matrix per iteration;
  - the stepping shapes ((1,K) decisions, (depth,K) stacks) are the shipped
    lane-major forms with K doubled to fill all 128 lanes.
  Full node step: 1039 ns per 16K rays at S=256 vs 1341 shipped (-23%),
  907 at S=512 (-33%, bigger packet unions).

GROUP-BARRIER form: Mosaic cannot lower dynamic lane-dim slicing
(scripts/lanecap_probe.py: dyncol fails), so a retiring slot cannot refill
its lane column from an arbitrary queued packet — the work-queue form dies
at the refill. Instead packets are processed in GROUPS of K=128: the Pallas
grid walks groups, the BlockSpec pipeline double-buffers each group's
(S, K) ray blocks against the previous group's compute (no fill/writeback
code in the kernel at all), and a group runs until ALL of its packets
retire. The price vs the work-queue is the group max (a group waits on its
slowest packet); ray sorting keeps intra-group variance low on coherent
wavefronts. Packet membership is IDENTICAL to the shipped kernels at
S = p_sub*128 (packet p = sorted rays [p*S, (p+1)*S)), so node-visit
unions — and therefore traversal work — match the shipped kernels exactly
at S=256; only the per-step cost changes.

Same external contract as the traverse_packet wrappers; flat (single-space)
scenes only — the unified two-level tables keep the work-queue kernels.
Role in the reference: rtcIntersectV / optixTrace
(backends/embree/render_embree.ispc:245).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chameleonrt_tpu.ops.intersect import T_MAX, UV_EPS
from chameleonrt_tpu.ops.lbvh import PackedBvh
from chameleonrt_tpu.ops.traverse_packet import (
    _BIG,
    _DONE,
    _MT_EPS,
    _PARKED,
    _SORT_NETS,
    _leafq_for,
    _safe_inv,
    LEAFQ_CAP,
    VMEM_LIMIT,
    _vmem_window_bytes,
    VMEM_FIT_BUDGET,
)

K = 128  # slots per group — one per lane, always the full register width
P_LANE = 128

# Rays per packet (sublane extent of the working block). Swept on the
# hall wavefronts (v5e, min-of-6, net of readback): with the deferred
# leaf FIFO, S=128 wins BOTH coherent and incoherent waves (b0
# 38.7/77.9 ms at S=128/256; b1 78.3/96.4) — smaller packets shrink the
# per-packet union (less group-barrier tail) while every step stays
# full-density. S=512 loses everywhere (union growth).
DEFAULT_S = int(_os.environ.get("CHAMELEONRT_SLOTLANE_S", "128"))

# Streamed (HBM-table) tier packet size. Iterations there are DMA-round-
# trip bound, so SMALLER packets win again (smaller per-packet unions =
# fewer latency-bound iterations; rungholt_city 640x360 full frames:
# S=256 796 ms, S=128 616 ms, S=64 540 ms, S=32 517 ms). Swept
# separately from the VMEM tier's S.
STREAM_S = int(_os.environ.get("CHAMELEONRT_SLOTLANE_STREAM_S", "32"))

LEAF_THRESH = int(_os.environ.get("CHAMELEONRT_SLOTLANE_LEAF_THRESH", "32"))


def _reduce_min_sl(x):
    """(S, K) -> (1, K) per-packet (per-lane) min: sublane halving tree to
    one 8-row tile, then Mosaic's native sublane reduce (probe: the halve
    and min8 tails price identically; min8 is fewer ops)."""
    m = x.shape[0]
    while m > 8:
        m //= 2
        x = jnp.minimum(x[:m], x[m : 2 * m])
    return jnp.min(x, axis=0, keepdims=True)


def _reduce_max_sl(x):
    m = x.shape[0]
    while m > 8:
        m //= 2
        x = jnp.maximum(x[:m], x[m : 2 * m])
    return jnp.max(x, axis=0, keepdims=True)


def _slab_sl(rt, c, S, ox, oy, oz, ix, iy, iz, t_min, t_cap):
    """Slab test of child AABB at transposed-node-row rows [c, c+6) for all
    K packets jointly. rt: (W, K) lane-major node rows. Returns (hit, entry)
    as (S, K). REQUIRES finite inverse directions (_safe_inv)."""

    kk = rt.shape[1]

    def bc(r):
        return jnp.broadcast_to(rt[r : r + 1, :], (S, kk))

    tx0 = (bc(c + 0) - ox) * ix
    tx1 = (bc(c + 3) - ox) * ix
    ty0 = (bc(c + 1) - oy) * iy
    ty1 = (bc(c + 4) - oy) * iy
    tz0 = (bc(c + 2) - oz) * iz
    tz1 = (bc(c + 5) - oz) * iz
    txn, txf = jnp.minimum(tx0, tx1), jnp.maximum(tx0, tx1)
    tyn, tyf = jnp.minimum(ty0, ty1), jnp.maximum(ty0, ty1)
    tzn, tzf = jnp.minimum(tz0, tz1), jnp.maximum(tz0, tz1)
    entry = jnp.maximum(jnp.maximum(txn, tyn), jnp.maximum(tzn, t_min))
    exit_ = jnp.minimum(jnp.minimum(txf, tyf), jnp.minimum(tzf, t_cap))
    return entry <= exit_, entry


def _mt_sl(lrt, L, S, ox, oy, oz, dx, dy, dz, t_min, t_cap):
    """Moller-Trumbore of all K packets against their transposed leaf rows
    (lrt: (10L, K), component-major as in PackedBvh). Returns per-slot-j
    (hit, t, u, v, prim) lists of (S, K) arrays."""
    hits, ts, us, vs, prims = [], [], [], [], []
    for j in range(L):

        kk = lrt.shape[1]

        def g(comp, j=j):
            return jnp.broadcast_to(
                lrt[comp * L + j : comp * L + j + 1, :], (S, kk)
            )

        v0x, v0y, v0z = g(0), g(1), g(2)
        e1x, e1y, e1z = g(3), g(4), g(5)
        e2x, e2y, e2z = g(6), g(7), g(8)
        prim_i = pltpu.bitcast(lrt[9 * L + j : 9 * L + j + 1, :], jnp.int32)
        prim_b = jnp.broadcast_to(prim_i, (S, kk))

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
        hit = (
            (jnp.abs(det) >= _MT_EPS)
            & (prim_b >= 0)
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
        prims.append(prim_b)
    return hits, ts, us, vs, prims


def _make_slotlane_kernel(
    *, closest, L, depth, S, arity, leaf_thresh, kk,
    unified=False, n_tri=0, tlas_lo=0, leafq=0, stream=False,
):
    assert not (leafq and unified), (
        "deferred leaf queues are flat-only here too: queued leaf codes "
        "outlive the ray space they were culled in"
    )
    """Kernel body for (closest | any) x (flat | unified) slot-lane
    traversal. UNIFIED (two-level TLAS+BLAS tables): the per-slot scalar
    entry/restore blocks of the work-queue kernels become DENSE (S, kk)
    ops here — an instance entry transforms every entering slot's rays by
    (1, kk) matrix-row broadcasts from the transposed leaf rows, and a
    pop back to TLAS rows restores the pristine input blocks under a lane
    mask, both gated by one scalar census. Leaf updates are masked by the
    is-triangle-leaf lane mask (one broadcast), which replaces the shipped
    kernels' guarded-fetch + row-poisoning machinery outright: a stale or
    foreign-space cached row can never commit state."""

    def kernel(
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
        *rest,
    ):
        if closest:
            if unified:
                t_out, prim_out, inst_out, u_out, v_out, it_out = rest[:6]
                scr = rest[6:]
            else:
                t_out, prim_out, u_out, v_out, it_out = rest[:5]
                scr = rest[5:]
        else:
            occ_out, it_out = rest[:2]
            scr = rest[2:]
        (nrow_scr, nrow_t, lrow_scr, lrow_t, cur_ref, sp_ref, stack_ref) = scr[:7]
        if unified:
            (obj_ref, inst_ref, w_ox, w_oy, w_oz, w_dx, w_dy, w_dz,
             w_ix, w_iy, w_iz) = scr[7:18]
        if leafq:
            lq_ref, lqh_ref, lqn_ref = scr[7:10]
            iota_q = jax.lax.broadcasted_iota(jnp.int32, (leafq, kk), 0)
        if stream:
            node_sem, leaf_sem = scr[-2:]

        t_min = tmin_ref[:]
        t_max = tmax_ref[:]
        if unified:
            # working rays are MUTABLE (object-space inside instances);
            # the input blocks stay pristine for entry/restore
            w_ox[:] = ox_ref[:]
            w_oy[:] = oy_ref[:]
            w_oz[:] = oz_ref[:]
            w_dx[:] = dx_ref[:]
            w_dy[:] = dy_ref[:]
            w_dz[:] = dz_ref[:]
            w_ix[:] = _safe_inv(dx_ref[:])
            w_iy[:] = _safe_inv(dy_ref[:])
            w_iz[:] = _safe_inv(dz_ref[:])
            obj_ref[:] = jnp.zeros((1, kk), jnp.int32)
            inst_ref[:] = jnp.full((1, kk), -1, jnp.int32)

            def rays():
                return (
                    w_ox[:], w_oy[:], w_oz[:],
                    w_dx[:], w_dy[:], w_dz[:],
                    w_ix[:], w_iy[:], w_iz[:],
                )
        else:
            _ox, _oy, _oz = ox_ref[:], oy_ref[:], oz_ref[:]
            _dx, _dy, _dz = dx_ref[:], dy_ref[:], dz_ref[:]
            _ix, _iy, _iz = _safe_inv(_dx), _safe_inv(_dy), _safe_inv(_dz)

            def rays():
                return _ox, _oy, _oz, _dx, _dy, _dz, _ix, _iy, _iz

        iota_stack = jax.lax.broadcasted_iota(jnp.int32, (depth, kk), 0)
        n_nrows = nodes_ref.shape[0]
        n_lrows = leafs_ref.shape[0]
        root = tlas_lo if unified else 0

        # per-group init: every slot starts at the root; all-dead (padded)
        # packets miss every child and retire after one node phase
        cur_ref[:] = jnp.full((kk, 1), root, jnp.int32)
        sp_ref[:] = jnp.zeros((1, kk), jnp.int32)
        lrow_scr[:] = jnp.zeros_like(lrow_scr)  # stale-leaf guard (no-op MT)
        if leafq:
            lq_ref[:] = jnp.full((leafq, kk), -1, jnp.int32)
            lqh_ref[:] = jnp.full((kk, 1), -1, jnp.int32)
            lqn_ref[:] = jnp.zeros((1, kk), jnp.int32)
        if closest:
            # best state lives in the out refs — the pipeline writes the
            # block back when the group completes
            t_out[:] = jnp.minimum(jnp.full((S, kk), 1e20, jnp.float32), t_max)
            prim_out[:] = jnp.full((S, kk), -1, jnp.int32)
            if unified:
                inst_out[:] = jnp.full((S, kk), -1, jnp.int32)
            u_out[:] = jnp.zeros((S, kk), jnp.float32)
            v_out[:] = jnp.zeros((S, kk), jnp.float32)

        def _restore(mask_1k):
            """Inline world-ray restore for lanes popping from object
            space back to TLAS rows — dense masked copies from the
            pristine input blocks, paid only when a restore happens."""
            nrest = jnp.sum(mask_1k.astype(jnp.int32))

            @pl.when(nrest > 0)
            def _():
                mb = jnp.broadcast_to(mask_1k, (S, kk))
                w_ox[:] = jnp.where(mb, ox_ref[:], w_ox[:])
                w_oy[:] = jnp.where(mb, oy_ref[:], w_oy[:])
                w_oz[:] = jnp.where(mb, oz_ref[:], w_oz[:])
                w_dx[:] = jnp.where(mb, dx_ref[:], w_dx[:])
                w_dy[:] = jnp.where(mb, dy_ref[:], w_dy[:])
                w_dz[:] = jnp.where(mb, dz_ref[:], w_dz[:])
                w_ix[:] = jnp.where(mb, _safe_inv(dx_ref[:]), w_ix[:])
                w_iy[:] = jnp.where(mb, _safe_inv(dy_ref[:]), w_iy[:])
                w_iz[:] = jnp.where(mb, _safe_inv(dz_ref[:]), w_iz[:])

            obj_ref[:] = jnp.where(mask_1k, 0, obj_ref[:])

        def node_iter(state):
            if closest:
                ndone, it, useful = state
                t_cap = t_out[:]
            else:
                ndone, it, useful, occ = state
                t_cap = jnp.where(occ > 0.0, -_BIG, t_max)
            ox, oy, oz, dxv, dyv, dzv, ix, iy, iz = rays()
            # unconditional clamped fetch (wrong-phase rows feed slab
            # results that the was_int mask discards — and in the unified
            # layout every state commit below is lane-masked, so even a
            # wrong-SPACE row can never corrupt state)
            if stream:
                # HBM tables: K row DMAs issued onto ONE shared semaphore,
                # then a single semaphore_wait(kk). The per-slot wait loop
                # re-derived every address just to name the copy (~half
                # the measured 13.3 us/iteration on rungholt_city was the
                # two scalar sequences); one bulk wait removes it.
                for k in range(kk):
                    c = cur_ref[k, 0]
                    r = jnp.clip(c, 0, n_nrows - 1)
                    pltpu.make_async_copy(
                        nodes_ref.at[pl.ds(r, 1), :],
                        nrow_scr.at[pl.ds(k, 1), :],
                        node_sem,
                    ).start()
                # one bulk wait: a DMA-sem wait decrements by the byte
                # count of its descriptor, so a whole-block descriptor
                # waits for all kk row copies at once
                pltpu.make_async_copy(
                    nodes_ref.at[pl.ds(0, kk), :], nrow_scr, node_sem
                ).wait()
            else:
                for k in range(kk):
                    c = cur_ref[k, 0]
                    r = jnp.clip(c, 0, n_nrows - 1)
                    nrow_scr[pl.ds(k, 1), :] = nodes_ref[pl.ds(r, 1), :]
            nrow_t[:] = nrow_scr[:, 0 : arity * 8].T  # ONE relayout per step
            rt = nrow_t[:]

            ch_keys = []
            ch_hit = []
            for c in range(arity):
                hc, ec = _slab_sl(
                    rt, 6 * c, S, ox, oy, oz, ix, iy, iz, t_min, t_cap
                )
                if closest:
                    # fused hit+entry reduce: key = min(where(hit, entry,
                    # BIG)); key == BIG means "no hit"
                    ch_keys.append(_reduce_min_sl(jnp.where(hc, ec, _BIG)))
                else:
                    ch_hit.append(_reduce_max_sl(jnp.where(hc, 1.0, 0.0)))

            cur = cur_ref[:].T  # (1,kk)
            sp = sp_ref[:]  # (1,kk)
            was_int = cur >= 0
            codes = [
                pltpu.bitcast(rt[6 * arity + c : 6 * arity + c + 1, :], jnp.int32)
                for c in range(arity)
            ]
            if closest:
                # order hit children by entry with a sorting network over
                # (1,kk) rows — same exploration order as the XLA oracle
                keys = list(ch_keys)
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
                early = _reduce_min_sl(occ) > 0.0  # (1,kk)
                hitlist = [ch_hit[c] > 0.0 for c in range(arity)]
                codelist = codes

            if leafq:
                # ENQUEUE-AT-PUSH (deferred leaves, as the work-queue
                # kernels since r4): hit LEAF children go straight into
                # the slot's lane-major FIFO; only INTERNAL children
                # descend or push, so cur/stack hold internal rows only
                # and every live slot advances every node iteration
                lqn = lqn_ref[:]  # (1,kk)
                leaf_c = [
                    hitlist[c] & (codelist[c] < 0) for c in range(arity)
                ]
                int_c = [
                    hitlist[c] & (codelist[c] >= 0) for c in range(arity)
                ]
                nleaf = leaf_c[0].astype(jnp.int32)
                offs = [jnp.zeros((1, kk), jnp.int32)]
                for c in range(1, arity):
                    offs.append(nleaf)
                    nleaf = nleaf + leaf_c[c].astype(jnp.int32)
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
                lqh_ref[:] = lq_ref[0:1, :].T
                found = jnp.zeros((1, kk), bool)
                best_code = codelist[0]
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
                sp2 = sp
                for c in range(arity - 1, 0, -1):
                    pm = hitlist[c] & was_int
                    stack_ref[:] = jnp.where(
                        (iota_stack == sp2) & pm, codelist[c], stack_ref[:]
                    )
                    sp2 = sp2 + pm.astype(jnp.int32)
                stepped = was_int
            else:
                best_hit = hitlist[0]
                best_code = codelist[0]
                best_i = jnp.zeros((1, kk), jnp.int32)
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
            if not closest:
                can_pop = want_pop & jnp.logical_not(early) & (sp2 > 0)
            else:
                can_pop = want_pop & (sp2 > 0)
            spm = jnp.maximum(sp2 - 1, 0)
            popped = jnp.sum(
                jnp.where(iota_stack == spm, stack_ref[:], 0),
                axis=0,
                keepdims=True,
            )
            if leafq:
                # traversal exhausted: park while queued leaves remain
                fin = jnp.where(lqn2 > 0, _PARKED, _DONE)
            else:
                fin = _DONE
            nxt = jnp.where(
                stepped & best_hit, best_code, jnp.where(can_pop, popped, fin)
            )
            nxt = jnp.where(stepped, nxt, cur)
            if not closest:
                nxt = jnp.where(was_int & early, _DONE, nxt)
                if leafq:
                    # a fully-occluded packet drops its queued leaves
                    lqn_ref[:] = jnp.where(was_int & early, 0, lqn2)
            retired = was_int & (nxt == _DONE)
            ndone = ndone + jnp.sum(retired.astype(jnp.int32))
            cur_ref[:] = nxt.T
            sp_ref[:] = jnp.where(can_pop, spm, sp2)
            if unified:
                # an object-space slot popping back to a TLAS row leaves
                # its instance: restore the pristine world rays inline
                _restore(
                    was_int
                    & (obj_ref[:] == 1)
                    & jnp.logical_not(retired)
                    & (nxt >= tlas_lo)
                )
            useful = useful + jnp.sum(stepped.astype(jnp.int32))
            if closest:
                return ndone, it + 1, useful
            return ndone, it + 1, useful, occ

        def leaf_iter(state):
            if closest:
                ndone, it, useful = state
            else:
                ndone, it, useful, occ = state
            ox, oy, oz, dxv, dyv, dzv, ix, iy, iz = rays()
            def _leaf_row(k):
                if leafq:
                    # deferred mode: each slot's queue HEAD (-1 when
                    # empty -> clamped idempotent row-0 re-test)
                    return jnp.clip(lqh_ref[k, 0], 0, n_lrows - 1)
                return jnp.clip(-cur_ref[k, 0] - 1, 0, n_lrows - 1)

            if stream:
                for k in range(kk):
                    pltpu.make_async_copy(
                        leafs_ref.at[pl.ds(_leaf_row(k), 1), :],
                        lrow_scr.at[pl.ds(k, 1), :],
                        leaf_sem,
                    ).start()
                pltpu.make_async_copy(
                    leafs_ref.at[pl.ds(0, kk), :], lrow_scr, leaf_sem
                ).wait()
            else:
                for k in range(kk):
                    lrow_scr[pl.ds(k, 1), :] = leafs_ref[
                        pl.ds(_leaf_row(k), 1), :
                    ]
            lrow_t[:] = lrow_scr[:, 0 : 10 * L].T  # (10L, kk)
            lrt = lrow_t[:]
            cur = cur_ref[:].T  # (1,kk)
            at_leaf = (cur < 0) & (cur > _DONE)
            if unified:
                leaf_code = -cur - 1
                is_entry = at_leaf & (leaf_code >= n_tri)
                is_tri = at_leaf & (leaf_code < n_tri)
                # lane mask replaces the work-queue kernels' row poisoning:
                # a foreign-space or stale row can never commit state
                tri_b = jnp.broadcast_to(is_tri, (S, kk))
            else:
                is_tri = at_leaf
                tri_b = None
            if closest:
                best_t = t_out[:]
                hits, ts, us, vs, prims = _mt_sl(
                    lrt, L, S, ox, oy, oz, dxv, dyv, dzv, t_min, best_t
                )
                best_prim = prim_out[:]
                best_u = u_out[:]
                best_v = v_out[:]
                if unified:
                    best_inst = inst_out[:]
                    inst_b = jnp.broadcast_to(inst_ref[:], (S, kk))
                for j in range(L):
                    take_j = hits[j] & (ts[j] < best_t)
                    if unified:
                        take_j = take_j & tri_b
                    best_t = jnp.where(take_j, ts[j], best_t)
                    best_prim = jnp.where(take_j, prims[j], best_prim)
                    if unified:
                        best_inst = jnp.where(take_j, inst_b, best_inst)
                    best_u = jnp.where(take_j, us[j], best_u)
                    best_v = jnp.where(take_j, vs[j], best_v)
                t_out[:] = best_t
                prim_out[:] = best_prim
                if unified:
                    inst_out[:] = best_inst
                u_out[:] = best_u
                v_out[:] = best_v
            else:
                hits, _, _, _, _ = _mt_sl(
                    lrt, L, S, ox, oy, oz, dxv, dyv, dzv, t_min, t_max
                )
                newly = hits[0]
                for j in range(1, L):
                    newly = newly | hits[j]
                if unified:
                    newly = newly & tri_b
                occ = jnp.maximum(occ, jnp.where(newly, 1.0, 0.0))

            if leafq:
                # --- deferred-mode stepping: dequeue one head per slot;
                # traversal state (cur/sp/stack) only advances in node
                # iterations. Parked slots whose queue drained retire.
                lqn = lqn_ref[:]  # (1,kk)
                did = lqn > 0
                lqn2 = lqn - did.astype(jnp.int32)
                lq = lq_ref[:]
                shifted = jnp.concatenate(
                    [lq[1:], jnp.full((1, kk), -1, jnp.int32)], axis=0
                )
                lq_ref[:] = jnp.where(did, shifted, lq)
                lqh_ref[:] = jnp.where(did, shifted[0:1, :], lq[0:1, :]).T
                if closest:
                    retired = (cur == _PARKED) & (lqn2 == 0)
                else:
                    early = _reduce_min_sl(occ) > 0.0
                    retired = ((cur == _PARKED) & (lqn2 == 0)) | (
                        (cur == _PARKED) & early
                    )
                    lqn2 = jnp.where(retired, 0, lqn2)
                lqn_ref[:] = lqn2
                ndone = ndone + jnp.sum(retired.astype(jnp.int32))
                cur_ref[:] = jnp.where(retired, _DONE, cur).T
                useful = useful + jnp.sum(did.astype(jnp.int32))
                if closest:
                    return ndone, it + 1, useful
                return ndone, it + 1, useful, occ

            # stepping: triangle-leaf slots pop (or retire); entry slots
            # jump into their instance's BLAS root in object space
            sp = sp_ref[:]
            if closest:
                can_pop = is_tri & (sp > 0)
            else:
                early = _reduce_min_sl(occ) > 0.0
                if unified:
                    is_entry = is_entry & jnp.logical_not(early)
                can_pop = is_tri & jnp.logical_not(early) & (sp > 0)
            spm = jnp.maximum(sp - 1, 0)
            popped = jnp.sum(
                jnp.where(iota_stack == spm, stack_ref[:], 0),
                axis=0,
                keepdims=True,
            )
            nxt = jnp.where(is_tri, jnp.where(can_pop, popped, _DONE), cur)
            if not closest:
                nxt = jnp.where(at_leaf & early, _DONE, nxt)
            retired = (is_tri if unified else at_leaf) & (nxt == _DONE)
            if not closest and unified:
                retired = retired | (at_leaf & early)
            ndone = ndone + jnp.sum(retired.astype(jnp.int32))
            if unified:
                nent = jnp.sum(is_entry.astype(jnp.int32))
                roots = pltpu.bitcast(lrt[12:13, :], jnp.int32)
                insts = pltpu.bitcast(lrt[13:14, :], jnp.int32)

                @pl.when(nent > 0)
                def _():
                    # DENSE instance entry: transform every entering
                    # slot's pristine world rays by its entry row's 3x4
                    # world-to-object matrix ((1,kk) row broadcasts);
                    # object dirs are NOT renormalized so t stays
                    # world-parameterized
                    def m(i):
                        return jnp.broadcast_to(lrt[i : i + 1, :], (S, kk))

                    oxp, oyp, ozp = ox_ref[:], oy_ref[:], oz_ref[:]
                    dxp, dyp, dzp = dx_ref[:], dy_ref[:], dz_ref[:]
                    o0 = m(0) * oxp + m(1) * oyp + m(2) * ozp + m(3)
                    o1 = m(4) * oxp + m(5) * oyp + m(6) * ozp + m(7)
                    o2 = m(8) * oxp + m(9) * oyp + m(10) * ozp + m(11)
                    d0 = m(0) * dxp + m(1) * dyp + m(2) * dzp
                    d1 = m(4) * dxp + m(5) * dyp + m(6) * dzp
                    d2 = m(8) * dxp + m(9) * dyp + m(10) * dzp
                    eb = jnp.broadcast_to(is_entry, (S, kk))
                    w_ox[:] = jnp.where(eb, o0, w_ox[:])
                    w_oy[:] = jnp.where(eb, o1, w_oy[:])
                    w_oz[:] = jnp.where(eb, o2, w_oz[:])
                    w_dx[:] = jnp.where(eb, d0, w_dx[:])
                    w_dy[:] = jnp.where(eb, d1, w_dy[:])
                    w_dz[:] = jnp.where(eb, d2, w_dz[:])
                    w_ix[:] = jnp.where(eb, _safe_inv(d0), w_ix[:])
                    w_iy[:] = jnp.where(eb, _safe_inv(d1), w_iy[:])
                    w_iz[:] = jnp.where(eb, _safe_inv(d2), w_iz[:])

                obj_ref[:] = jnp.where(is_entry, 1, obj_ref[:])
                inst_ref[:] = jnp.where(is_entry, insts, inst_ref[:])
                nxt = jnp.where(is_entry, roots, nxt)
            cur_ref[:] = nxt.T
            sp_ref[:] = jnp.where(can_pop, spm, sp)
            if unified:
                # popping back to TLAS rows from object space: restore
                _restore(
                    is_tri
                    & (obj_ref[:] == 1)
                    & jnp.logical_not(retired)
                    & (nxt >= tlas_lo)
                )
            useful = useful + jnp.sum(at_leaf.astype(jnp.int32))
            if closest:
                return ndone, it + 1, useful
            return ndone, it + 1, useful, occ

        if leafq:
            qmin = max(1, (3 * kk) // 4)

            def body(state):
                curT = cur_ref[:].T  # (1,kk)
                lqn = lqn_ref[:]
                is_int = curT >= 0
                n_int = jnp.sum(is_int.astype(jnp.int32))
                nonempty = jnp.sum((lqn > 0).astype(jnp.int32))
                near_full = (
                    jnp.sum(
                        (is_int & (lqn > leafq - arity)).astype(jnp.int32)
                    )
                    > 0
                )
                do_leaf = (nonempty >= qmin) | near_full | (n_int == 0)
                return jax.lax.cond(do_leaf, leaf_iter, node_iter, state)
        else:

            def body(state):
                cur = cur_ref[:]  # (kk,1)
                n_int = jnp.sum((cur >= 0).astype(jnp.int32))
                n_leaf = jnp.sum(((cur < 0) & (cur > _DONE)).astype(jnp.int32))
                do_leaf = jnp.logical_or(n_leaf >= leaf_thresh, n_int == 0)
                return jax.lax.cond(do_leaf, leaf_iter, node_iter, state)

        def cond(state):
            return state[0] < kk

        if closest:
            init = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
            _, it, useful = jax.lax.while_loop(cond, body, init)
        else:
            init = (
                jnp.int32(0),
                jnp.int32(0),
                jnp.int32(0),
                jnp.where(t_max <= 0.0, 1.0, 0.0),  # dead rays pre-occluded
            )
            _, it, useful, occ = jax.lax.while_loop(cond, body, init)
            occ_out[:] = occ > 0.0
        out_col = jax.lax.broadcasted_iota(jnp.int32, (8, P_LANE), 0)
        it_out[:] = jnp.where(out_col == 1, useful, it)

    return kernel


def _ray_specs(n, S, kk):
    return [
        pl.BlockSpec((S, kk), lambda g: (0, g), memory_space=pltpu.VMEM)
        for _ in range(n)
    ]


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "depth", "G", "S", "arity", "lt", "kk", "leafq", "stream",
        "interpret",
    ),
)
def _closest_call_slotlane(
    nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, L, depth, G, S, arity, lt, kk=K, leafq=0, stream=False,
    interpret=False,
):
    if stream:
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        leafs = jnp.pad(leafs, ((0, 0), (0, 128 - leafs.shape[1])))
    shape = (S, G * kk)
    return pl.pallas_call(
        _make_slotlane_kernel(
            closest=True, L=L, depth=depth, S=S, arity=arity,
            leaf_thresh=lt, kk=kk, leafq=leafq, stream=stream,
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)
        ] * 2
        + _ray_specs(8, S, kk),
        out_specs=[
            pl.BlockSpec((S, kk), lambda g: (0, g), memory_space=pltpu.VMEM)
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
            pltpu.VMEM((kk, 128 if stream else arity * 8), jnp.float32),
            pltpu.VMEM((arity * 8, kk), jnp.float32),  # transposed
            pltpu.VMEM((kk, 128 if stream else 10 * L), jnp.float32),
            pltpu.VMEM((10 * L, kk), jnp.float32),  # transposed
            pltpu.VMEM((kk, 1), jnp.int32),  # cur (sublane mirror for fetch)
            pltpu.VMEM((1, kk), jnp.int32),  # sp (lane-major)
            pltpu.VMEM((depth, kk), jnp.int32),  # stacks (lane-major)
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
        + ([pltpu.SemaphoreType.DMA] * 2 if stream else []),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "depth", "G", "S", "arity", "lt", "kk", "leafq", "stream",
        "interpret",
    ),
)
def _any_call_slotlane(
    nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, L, depth, G, S, arity, lt, kk=K, leafq=0, stream=False,
    interpret=False,
):
    if stream:
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        leafs = jnp.pad(leafs, ((0, 0), (0, 128 - leafs.shape[1])))
    shape = (S, G * kk)
    return pl.pallas_call(
        _make_slotlane_kernel(
            closest=False, L=L, depth=depth, S=S, arity=arity,
            leaf_thresh=lt, kk=kk, leafq=leafq, stream=stream,
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)
        ] * 2
        + _ray_specs(8, S, kk),
        out_specs=[
            pl.BlockSpec((S, kk), lambda g: (0, g), memory_space=pltpu.VMEM)
        ]
        + [pl.BlockSpec((8, P_LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.bool_),
            jax.ShapeDtypeStruct((G * 8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kk, 128 if stream else arity * 8), jnp.float32),
            pltpu.VMEM((arity * 8, kk), jnp.float32),
            pltpu.VMEM((kk, 128 if stream else 10 * L), jnp.float32),
            pltpu.VMEM((10 * L, kk), jnp.float32),
            pltpu.VMEM((kk, 1), jnp.int32),
            pltpu.VMEM((1, kk), jnp.int32),
            pltpu.VMEM((depth, kk), jnp.int32),
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
        + ([pltpu.SemaphoreType.DMA] * 2 if stream else []),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


def _pack_sl(x, S, NP, pad_value=0.0):
    """(R,) -> (S, NP): packet p = rays [p*S, (p+1)*S) down column p (same
    packet membership as the shipped kernels at S = p_sub*128, so node-
    visit unions match). Tail padded with pad_value — origins pad with
    _BIG so padding lanes slab-miss everything."""
    need = NP * S
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]), constant_values=pad_value)
    return x.reshape(NP, S).T


def _unpack_sl(y, R):
    return y.T.reshape(-1)[:R]


def _np_groups(R, S, kk):
    n_pk = max(1, -(-R // S))
    NP = -(-n_pk // kk) * kk
    return NP, NP // kk


def traverse_closest_slotlane(
    pbvh: PackedBvh, orig, dir, t_min, active, t_max=None,
    interpret=False, return_iters=False, S=None, leaf_thresh=None,
    k_slots=None, leafq=None, stream=False,
):
    """Group-barrier slot-lane closest-hit traversal. Same contract as
    traverse_packet.traverse_closest_persistent. stream=True leaves the
    node/leaf tables in HBM (per-slot row DMAs) for the >VMEM tier."""
    S = (STREAM_S if stream else DEFAULT_S) if S is None else S
    lt = LEAF_THRESH if leaf_thresh is None else leaf_thresh
    kk = K if k_slots is None else k_slots
    if leafq is None:
        leafq = LEAFQ_CAP
    R = orig.shape[0]
    NP, G = _np_groups(R, S, kk)
    ox = _pack_sl(jnp.where(active, orig[:, 0], _BIG), S, NP, _BIG)
    oy = _pack_sl(jnp.where(active, orig[:, 1], _BIG), S, NP, _BIG)
    oz = _pack_sl(jnp.where(active, orig[:, 2], _BIG), S, NP, _BIG)
    dx = _pack_sl(jnp.where(active, dir[:, 0], 1.0), S, NP, 1.0)
    dy = _pack_sl(jnp.where(active, dir[:, 1], 1.0), S, NP, 1.0)
    dz = _pack_sl(jnp.where(active, dir[:, 2], 1.0), S, NP, 1.0)
    tmin = _pack_sl(jnp.broadcast_to(t_min, (R,)), S, NP)
    if t_max is None:
        t_max = jnp.full((R,), T_MAX, jnp.float32)
    tmax = _pack_sl(jnp.broadcast_to(t_max, (R,)), S, NP)

    depth = max(2, int(pbvh.max_depth) + 1)
    t, prim, u, v, iters = _closest_call_slotlane(
        pbvh.nodes, pbvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=pbvh.leaf_size, depth=depth, G=G, S=S, arity=pbvh.arity,
        lt=lt, kk=kk, leafq=_leafq_for(pbvh.arity, leafq),
        stream=stream, interpret=interpret,
    )
    if return_iters:
        # per-group iteration/useful-step rows; sum for totals
        return jnp.sum(iters[0::8, 0]), jnp.sum(iters[1::8, 0])
    t = _unpack_sl(t, R)
    prim = _unpack_sl(prim, R)
    u = _unpack_sl(u, R)
    v = _unpack_sl(v, R)
    miss = (prim < 0) | ~active
    return (
        jnp.where(miss, T_MAX, t),
        jnp.where(miss, -1, prim),
        jnp.where(miss, 0.0, u),
        jnp.where(miss, 0.0, v),
    )


def traverse_any_slotlane(
    pbvh: PackedBvh, orig, dir, t_min, t_max, mask,
    interpret=False, return_iters=False, S=None, leaf_thresh=None,
    k_slots=None, leafq=None, stream=False,
):
    """Group-barrier slot-lane any-hit traversal. Same contract as
    traverse_packet.traverse_any_persistent. stream=True leaves the
    tables in HBM."""
    S = (STREAM_S if stream else DEFAULT_S) if S is None else S
    lt = LEAF_THRESH if leaf_thresh is None else leaf_thresh
    kk = K if k_slots is None else k_slots
    if leafq is None:
        leafq = LEAFQ_CAP
    R = orig.shape[0]
    NP, G = _np_groups(R, S, kk)
    ox = _pack_sl(jnp.where(mask, orig[:, 0], _BIG), S, NP, _BIG)
    oy = _pack_sl(jnp.where(mask, orig[:, 1], _BIG), S, NP, _BIG)
    oz = _pack_sl(jnp.where(mask, orig[:, 2], _BIG), S, NP, _BIG)
    dx = _pack_sl(jnp.where(mask, dir[:, 0], 1.0), S, NP, 1.0)
    dy = _pack_sl(jnp.where(mask, dir[:, 1], 1.0), S, NP, 1.0)
    dz = _pack_sl(jnp.where(mask, dir[:, 2], 1.0), S, NP, 1.0)
    tmin = _pack_sl(jnp.broadcast_to(t_min, (R,)), S, NP)
    tmax = _pack_sl(
        jnp.where(mask, jnp.broadcast_to(t_max, (R,)), -1.0), S, NP, -1.0
    )

    depth = max(2, int(pbvh.max_depth) + 1)
    occ, iters = _any_call_slotlane(
        pbvh.nodes, pbvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=pbvh.leaf_size, depth=depth, G=G, S=S, arity=pbvh.arity,
        lt=lt, kk=kk, leafq=_leafq_for(pbvh.arity, leafq),
        stream=stream, interpret=interpret,
    )
    if return_iters:
        return jnp.sum(iters[0::8, 0]), jnp.sum(iters[1::8, 0])
    return _unpack_sl(occ, R) & mask


def slotlane_eligible(
    pbvh: PackedBvh, n_rays: int, closest: bool = True, S: int = None
) -> bool:
    """VMEM gate: unlike the persistent kernels, the wavefront's ray arrays
    are NOT resident — the pipeline streams (S, K) blocks per group — so
    only the tables, the double-buffered blocks, and the kernel scratch
    count. The VMEM table tier therefore reaches larger scenes here."""
    if pbvh.arity not in _SORT_NETS or pbvh.max_depth is None:
        return False
    if pbvh.leaf_rows.shape[0] <= 1:
        return False
    S = DEFAULT_S if S is None else S
    block = S * K * 4
    n_io = (8 + 5) if closest else (8 + 2)
    pipeline_bytes = 2 * n_io * block
    table_bytes = _vmem_window_bytes(pbvh.nodes) + _vmem_window_bytes(pbvh.leaf_rows)
    depth = int(pbvh.max_depth) + 1
    scratch = (2 * (K * pbvh.arity * 8) + 2 * (K * 10 * pbvh.leaf_size)) * 4
    scratch += (depth * K + 2 * K) * 4
    return table_bytes + pipeline_bytes + scratch <= VMEM_FIT_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "depth", "G", "S", "arity", "lt", "kk", "n_tri", "tlas_lo",
        "stream", "interpret",
    ),
)
def _closest_unified_call_slotlane(
    nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, L, depth, G, S, arity, lt, n_tri, tlas_lo, kk=K, stream=False,
    interpret=False,
):
    if stream:
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        leafs = jnp.pad(leafs, ((0, 0), (0, 128 - leafs.shape[1])))
    shape = (S, G * kk)
    return pl.pallas_call(
        _make_slotlane_kernel(
            closest=True, L=L, depth=depth, S=S, arity=arity,
            leaf_thresh=lt, kk=kk, unified=True, n_tri=n_tri,
            tlas_lo=tlas_lo, stream=stream,
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)
        ] * 2
        + _ray_specs(8, S, kk),
        out_specs=[
            pl.BlockSpec((S, kk), lambda g: (0, g), memory_space=pltpu.VMEM)
            for _ in range(5)
        ]
        + [pl.BlockSpec((8, P_LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((G * 8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kk, 128 if stream else arity * 8), jnp.float32),
            pltpu.VMEM((arity * 8, kk), jnp.float32),
            pltpu.VMEM((kk, 128 if stream else 10 * L), jnp.float32),
            pltpu.VMEM((10 * L, kk), jnp.float32),
            pltpu.VMEM((kk, 1), jnp.int32),
            pltpu.VMEM((1, kk), jnp.int32),
            pltpu.VMEM((depth, kk), jnp.int32),
            pltpu.VMEM((1, kk), jnp.int32),  # obj
            pltpu.VMEM((1, kk), jnp.int32),  # inst
        ]
        + [pltpu.VMEM((S, kk), jnp.float32)] * 9  # working rays
        + ([pltpu.SemaphoreType.DMA] * 2 if stream else []),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "depth", "G", "S", "arity", "lt", "kk", "n_tri", "tlas_lo",
        "stream", "interpret",
    ),
)
def _any_unified_call_slotlane(
    nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, L, depth, G, S, arity, lt, n_tri, tlas_lo, kk=K, stream=False,
    interpret=False,
):
    if stream:
        nodes = jnp.pad(nodes, ((0, 0), (0, 128 - nodes.shape[1])))
        leafs = jnp.pad(leafs, ((0, 0), (0, 128 - leafs.shape[1])))
    shape = (S, G * kk)
    return pl.pallas_call(
        _make_slotlane_kernel(
            closest=False, L=L, depth=depth, S=S, arity=arity,
            leaf_thresh=lt, kk=kk, unified=True, n_tri=n_tri,
            tlas_lo=tlas_lo, stream=stream,
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM)
        ] * 2
        + _ray_specs(8, S, kk),
        out_specs=[
            pl.BlockSpec((S, kk), lambda g: (0, g), memory_space=pltpu.VMEM)
        ]
        + [pl.BlockSpec((8, P_LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.bool_),
            jax.ShapeDtypeStruct((G * 8, P_LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kk, 128 if stream else arity * 8), jnp.float32),
            pltpu.VMEM((arity * 8, kk), jnp.float32),
            pltpu.VMEM((kk, 128 if stream else 10 * L), jnp.float32),
            pltpu.VMEM((10 * L, kk), jnp.float32),
            pltpu.VMEM((kk, 1), jnp.int32),
            pltpu.VMEM((1, kk), jnp.int32),
            pltpu.VMEM((depth, kk), jnp.int32),
            pltpu.VMEM((1, kk), jnp.int32),  # obj
            pltpu.VMEM((1, kk), jnp.int32),  # inst
        ]
        + [pltpu.VMEM((S, kk), jnp.float32)] * 9  # working rays
        + ([pltpu.SemaphoreType.DMA] * 2 if stream else []),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(nodes, leafs, ox, oy, oz, dx, dy, dz, tmin, tmax)


def traverse_closest_unified_slotlane(
    ubvh, orig, dir, t_min, active, t_max=None,
    interpret=False, return_iters=False, S=None, leaf_thresh=None,
    k_slots=None, stream=False,
):
    """Slot-lane closest-hit traversal of a UnifiedBvh. Same contract as
    traverse_packet.traverse_closest_unified_persistent: returns
    (t, prim, inst, u, v), prim/inst = -1 on miss."""
    S = (STREAM_S if stream else DEFAULT_S) if S is None else S
    lt = LEAF_THRESH if leaf_thresh is None else leaf_thresh
    kk = K if k_slots is None else k_slots
    R = orig.shape[0]
    NP, G = _np_groups(R, S, kk)
    ox = _pack_sl(jnp.where(active, orig[:, 0], _BIG), S, NP, _BIG)
    oy = _pack_sl(jnp.where(active, orig[:, 1], _BIG), S, NP, _BIG)
    oz = _pack_sl(jnp.where(active, orig[:, 2], _BIG), S, NP, _BIG)
    dx = _pack_sl(jnp.where(active, dir[:, 0], 1.0), S, NP, 1.0)
    dy = _pack_sl(jnp.where(active, dir[:, 1], 1.0), S, NP, 1.0)
    dz = _pack_sl(jnp.where(active, dir[:, 2], 1.0), S, NP, 1.0)
    tmin = _pack_sl(jnp.broadcast_to(t_min, (R,)), S, NP)
    if t_max is None:
        t_max = jnp.full((R,), T_MAX, jnp.float32)
    tmax = _pack_sl(jnp.broadcast_to(t_max, (R,)), S, NP)

    depth = max(2, int(ubvh.stack_bound) + 1)
    t, prim, inst, u, v, iters = _closest_unified_call_slotlane(
        ubvh.nodes, ubvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=ubvh.leaf_size, depth=depth, G=G, S=S, arity=ubvh.arity,
        lt=lt, kk=kk, n_tri=int(ubvh.n_tri_leaves),
        tlas_lo=int(ubvh.tlas_lo), stream=stream, interpret=interpret,
    )
    if return_iters:
        return jnp.sum(iters[0::8, 0]), jnp.sum(iters[1::8, 0])
    t = _unpack_sl(t, R)
    prim = _unpack_sl(prim, R)
    inst = _unpack_sl(inst, R)
    u = _unpack_sl(u, R)
    v = _unpack_sl(v, R)
    miss = (prim < 0) | ~active
    return (
        jnp.where(miss, T_MAX, t),
        jnp.where(miss, -1, prim),
        jnp.where(miss, -1, inst),
        jnp.where(miss, 0.0, u),
        jnp.where(miss, 0.0, v),
    )


def traverse_any_unified_slotlane(
    ubvh, orig, dir, t_min, t_max, mask,
    interpret=False, return_iters=False, S=None, leaf_thresh=None,
    k_slots=None, stream=False,
):
    """Slot-lane any-hit traversal of a UnifiedBvh. Same contract as
    traverse_packet.traverse_any_unified_persistent: (R,) bool occluded."""
    S = (STREAM_S if stream else DEFAULT_S) if S is None else S
    lt = LEAF_THRESH if leaf_thresh is None else leaf_thresh
    kk = K if k_slots is None else k_slots
    R = orig.shape[0]
    NP, G = _np_groups(R, S, kk)
    ox = _pack_sl(jnp.where(mask, orig[:, 0], _BIG), S, NP, _BIG)
    oy = _pack_sl(jnp.where(mask, orig[:, 1], _BIG), S, NP, _BIG)
    oz = _pack_sl(jnp.where(mask, orig[:, 2], _BIG), S, NP, _BIG)
    dx = _pack_sl(jnp.where(mask, dir[:, 0], 1.0), S, NP, 1.0)
    dy = _pack_sl(jnp.where(mask, dir[:, 1], 1.0), S, NP, 1.0)
    dz = _pack_sl(jnp.where(mask, dir[:, 2], 1.0), S, NP, 1.0)
    tmin = _pack_sl(jnp.broadcast_to(t_min, (R,)), S, NP)
    tmax = _pack_sl(
        jnp.where(mask, jnp.broadcast_to(t_max, (R,)), -1.0), S, NP, -1.0
    )

    depth = max(2, int(ubvh.stack_bound) + 1)
    occ, iters = _any_unified_call_slotlane(
        ubvh.nodes, ubvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
        L=ubvh.leaf_size, depth=depth, G=G, S=S, arity=ubvh.arity,
        lt=lt, kk=kk, n_tri=int(ubvh.n_tri_leaves),
        tlas_lo=int(ubvh.tlas_lo), stream=stream, interpret=interpret,
    )
    if return_iters:
        return jnp.sum(iters[0::8, 0]), jnp.sum(iters[1::8, 0])
    return _unpack_sl(occ, R) & mask


def slotlane_unified_eligible(
    ubvh, n_rays: int, closest: bool = True, S: int = None
) -> bool:
    """VMEM gate for the unified slot-lane kernels: tables + pipeline
    blocks + scratch (which now includes the 9 (S, K) working-ray
    arrays)."""
    if (
        ubvh.arity not in _SORT_NETS
        or ubvh.stack_bound is None
        or ubvh.leaf_rows.shape[0] <= 1
    ):
        return False
    S = DEFAULT_S if S is None else S
    block = S * K * 4
    n_io = (8 + 6) if closest else (8 + 2)
    pipeline_bytes = 2 * n_io * block
    table_bytes = _vmem_window_bytes(ubvh.nodes) + _vmem_window_bytes(
        ubvh.leaf_rows
    )
    depth = int(ubvh.stack_bound) + 1
    scratch = (2 * (K * ubvh.arity * 8) + 2 * (K * 10 * ubvh.leaf_size)) * 4
    scratch += (depth * K + 4 * K) * 4
    scratch += 9 * block  # working rays
    return table_bytes + pipeline_bytes + scratch <= VMEM_FIT_BUDGET


def slotlane_stream_eligible(
    pbvh: PackedBvh, n_rays: int, closest: bool = True, S: int = None
) -> bool:
    """Gate for the HBM-table slot-lane kernels (>VMEM tier): only the
    pipeline blocks and scratch are VMEM-resident, so eligibility is
    near-universal — the table budget check of the VMEM tier drops out."""
    if pbvh.arity not in _SORT_NETS or pbvh.max_depth is None:
        return False
    if pbvh.leaf_rows.shape[0] <= 1:
        return False
    S = STREAM_S if S is None else S
    block = S * K * 4
    n_io = (8 + 5) if closest else (8 + 2)
    depth = int(pbvh.max_depth) + 1
    scratch = (4 * (K * 128) + (depth + 3) * K) * 4
    return 2 * n_io * block + scratch <= VMEM_FIT_BUDGET


def slotlane_unified_stream_eligible(
    ubvh, n_rays: int, closest: bool = True, S: int = None
) -> bool:
    """HBM-table unified slot-lane gate (san-miguel-class scenes whose
    fused tables exceed VMEM)."""
    if (
        ubvh.arity not in _SORT_NETS
        or ubvh.stack_bound is None
        or ubvh.leaf_rows.shape[0] <= 1
    ):
        return False
    S = STREAM_S if S is None else S
    block = S * K * 4
    n_io = (8 + 6) if closest else (8 + 2)
    depth = int(ubvh.stack_bound) + 1
    scratch = (4 * (K * 128) + (depth + 5) * K) * 4 + 9 * block
    return 2 * n_io * block + scratch <= VMEM_FIT_BUDGET
