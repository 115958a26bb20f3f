"""Vectorized BVH traversal (jax) — the TPU replacement for hardware ray
traversal (rtcIntersectV / optixTrace / TraceRay in the reference backends).

Design: the whole ray wavefront traverses in lockstep inside one
`lax.while_loop`. Each lane carries a short stack (int32) and a current node;
every iteration performs, per lane, either an internal-node step or a leaf
step, selected by mask.

HBM gathers and relayouts are the scarce resources on TPU, so the loop
runs on the `PackedBvh` layout (ops/lbvh.py): an internal step is ONE
16-float row gather (both children's AABBs + child pointers fused into the
parent) with scalar-column slab tests; a leaf step is ONE component-major
row gather + contiguous (R, LEAF_SIZE) block slices + Möller–Trumbore in
the (R, L) domain with reduction-based closest-slot selection. Child
pointers encode leaves as negative values (-(leaf+1)): leaf-ness is a sign
test. See docs/ARCHITECTURE.md "Measured v5e kernel rules".

Divergence is bounded by ordered near-first descent and, for occlusion rays,
per-lane early-out on first hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chameleonrt_tpu.ops.intersect import T_MAX, UV_EPS
from chameleonrt_tpu.ops.lbvh import PackedBvh

STACK_DEPTH = 48
# np scalar, NOT jnp (captured device scalars poison the whole process to
# a ~26 ms/execution floor on the axon tunnel — scripts/capture_probe2.py)
_DONE = np.int32(0x7FFFFFFF)  # sentinel current-node value: lane finished

# Traversal steps executed per while_loop iteration. Each XLA while
# iteration pays fixed op-dispatch overhead that dominates the (tiny) HBM
# traffic of one step at practical block sizes (measured ~20us/iter vs
# ~2us of gathers at 8K rays on v5e); unrolling K steps into the body
# amortizes it. Lanes that finish mid-unroll idle behind their masks.
UNROLL = 4


def _stack_limit(pbvh: PackedBvh) -> int:
    """Exact short-stack size: one slot per tree level when the builder
    certified a depth (native SAH path — overflow impossible by
    construction); the conservative STACK_DEPTH otherwise (on-device LBVH,
    no a-priori Karras bound — overflow is detected and surfaced)."""
    if pbvh.max_depth is not None:
        return max(2, min(STACK_DEPTH, pbvh.max_depth + 1))
    return STACK_DEPTH

# Rays per lockstep block. The while_loop runs until the LAST lane of a
# block finishes, so the whole wavefront pays one global worst-case if
# traversed at once; mapping over blocks bounds each block's cost by its own
# worst lane (long-tailed divergence makes this a ~10x lever) and keeps the
# loop carry (stack, best-hit state) small enough to live in VMEM.
# Swept on v5e (hall 224K tris, 921K rays): 8192 beats 16384/32768/65536 on
# both closest (423 vs 438/462/1168 ms) and any-hit (495 vs 546/990/2594).
DEFAULT_BLOCK = 8192


def _map_blocks(fn, args, R: int, block: int):
    """Apply `fn` over ray blocks: args are (R, ...) arrays; returns
    concatenated outputs. Pads R up to a block multiple."""
    if R <= block:
        return fn(args)
    nblocks = -(-R // block)
    padded = nblocks * block

    def pad(x):
        if x.shape[0] == R:
            pad_width = [(0, padded - R)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, pad_width)
        return x.reshape((nblocks, block) + x.shape[1:])

    blocks = jax.tree.map(pad, args)
    outs = jax.lax.map(fn, blocks)
    return jax.tree.map(
        lambda o: o.reshape((padded,) + o.shape[2:])[:R], outs
    )


_MT_EPS = 1e-9


def _mt_core(pbvh: PackedBvh, leaf_id, orig, dir, t_min, t_max):
    """Shared Möller–Trumbore core over one gathered leaf row: ONE 2D row
    gather + 10 contiguous (R, L) block slices + rectangular MT in the
    (R, L) domain. Returns (hit (R, L), t, u, v, prim).

    TPU performance rules shaping this code (measured on v5e): width-1
    column extracts of a gathered row and argmin + fancy-indexing both cost
    relayouts (~30us and ~1ms respectively per op at R=57K); contiguous
    block slices, (R, L) elementwise math, and minor-dim reductions are
    effectively free — the whole step costs its gather."""
    rows = pbvh.leaf_rows[leaf_id]  # (R, 10L), component-major
    return _mt_rows(rows, pbvh.leaf_size, orig, dir, t_min, t_max)


def _mt_rows(rows, L, orig, dir, t_min, t_max):
    """MT over pre-gathered component-major leaf rows (see _mt_core)."""

    def g(c):
        return rows[:, c * L : (c + 1) * L]

    v0x, v0y, v0z = g(0), g(1), g(2)
    e1x, e1y, e1z = g(3), g(4), g(5)
    e2x, e2y, e2z = g(6), g(7), g(8)
    prim = jax.lax.bitcast_convert_type(g(9), jnp.int32)

    ox, oy, oz = orig[:, 0:1], orig[:, 1:2], orig[:, 2:3]
    dx, dy, dz = dir[:, 0:1], dir[:, 1:2], dir[:, 2:3]

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
        & (prim >= 0)
        & (u >= -UV_EPS)
        & (v >= -UV_EPS)
        & (u + v <= 1.0 + UV_EPS)
        & (t > t_min[:, None])
        & (t < t_max[:, None])
    )
    return hit, t, u, v, prim


def _leaf_step(pbvh: PackedBvh, leaf_id, orig, dir, t_min, t_max):
    """Closest-hit leaf intersection: MT core + reduction-based closest-slot
    selection. Returns (t, prim, u, v, anyhit): t=T_MAX / prim=-1 on miss."""
    hit, t, u, v, prim = _mt_core(pbvh, leaf_id, orig, dir, t_min, t_max)
    return _select_closest(hit, t, u, v, prim, pbvh.leaf_size)


def _select_closest(hit, t, u, v, prim, L):
    """Reduction-based closest-slot selection over (R, L) MT results."""
    t = jnp.where(hit, t, T_MAX)
    best_t = jnp.min(t, axis=1)
    # slot selection purely via reductions (ties resolve to the highest slot)
    iota = jnp.arange(L, dtype=jnp.int32)[None, :]
    is_best = hit & (t == best_t[:, None])
    slot = jnp.max(jnp.where(is_best, iota, -1), axis=1)
    sel = iota == slot[:, None]
    best_prim = jnp.max(jnp.where(sel, prim, -1), axis=1)
    best_u = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
    best_v = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
    anyhit = jnp.any(hit, axis=1)
    return best_t, best_prim, best_u, best_v, anyhit


def _leaf_step_any(pbvh: PackedBvh, leaf_id, orig, dir, t_min, t_max):
    """Occlusion-only leaf test: the MT core without the closest-slot
    selection machinery (any-hit needs one bool per lane)."""
    hit, _, _, _, _ = _mt_core(pbvh, leaf_id, orig, dir, t_min, t_max)
    return jnp.any(hit, axis=1)


def _node_step(pbvh: PackedBvh, cur, orig, inv_dir, t_min, t_max):
    """Internal-node step: one (R, 16) row gather + scalar-column slab tests
    of both children. (A width-2 component-paired variant with
    reduction-based selection faults the v5e/axon compiler; the scalar form
    measures fine because the node row is narrow.)

    Returns (hit_n, near_kid, kid_sum): number of child hits (0/1/2), the
    nearer hit child pointer, and the sum of hit child pointers (== the only
    hit child when hit_n == 1; near + far when hit_n == 2, so
    far = kid_sum - near_kid)."""
    row = pbvh.nodes[jnp.clip(cur, 0, pbvh.nodes.shape[0] - 1)]
    ox, oy, oz = orig[:, 0], orig[:, 1], orig[:, 2]
    ix, iy, iz = inv_dir[:, 0], inv_dir[:, 1], inv_dir[:, 2]

    def slab(c):
        tx0 = (row[:, c + 0] - ox) * ix
        tx1 = (row[:, c + 3] - ox) * ix
        ty0 = (row[:, c + 1] - oy) * iy
        ty1 = (row[:, c + 4] - oy) * iy
        tz0 = (row[:, c + 2] - oz) * iz
        tz1 = (row[:, c + 5] - oz) * iz
        txn = jnp.minimum(tx0, tx1)
        txf = jnp.maximum(tx0, tx1)
        tyn = jnp.minimum(ty0, ty1)
        tyf = jnp.maximum(ty0, ty1)
        tzn = jnp.minimum(tz0, tz1)
        tzf = jnp.maximum(tz0, tz1)
        txn = jnp.where(jnp.isnan(txn), -jnp.inf, txn)
        tyn = jnp.where(jnp.isnan(tyn), -jnp.inf, tyn)
        tzn = jnp.where(jnp.isnan(tzn), -jnp.inf, tzn)
        txf = jnp.where(jnp.isnan(txf), jnp.inf, txf)
        tyf = jnp.where(jnp.isnan(tyf), jnp.inf, tyf)
        tzf = jnp.where(jnp.isnan(tzf), jnp.inf, tzf)
        entry = jnp.maximum(jnp.maximum(txn, tyn), jnp.maximum(tzn, t_min))
        exit_ = jnp.minimum(jnp.minimum(txf, tyf), jnp.minimum(tzf, t_max))
        return entry <= exit_, entry

    lhit, lt = slab(0)
    rhit, rt = slab(6)
    left = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
    right = jax.lax.bitcast_convert_type(row[:, 13], jnp.int32)

    hit_n = lhit.astype(jnp.int32) + rhit.astype(jnp.int32)
    kid_sum = jnp.where(lhit, left, 0) + jnp.where(rhit, right, 0)
    near_is_left = jnp.where(lhit & rhit, lt <= rt, lhit)
    near_kid = jnp.where(near_is_left, left, right)
    return hit_n, near_kid, kid_sum


_BIG = np.float32(1e30)


def _node_phase(pbvh: PackedBvh, cur, is_int, orig, inv_dir, t_min, t_max):
    """Arity-generic internal-node phase. Returns (next_int, pushes):
    next_int = nearest hit child code per lane (or _DONE), pushes = list of
    (code, mask) in push order (farthest first, so pops run near-first)."""
    if pbvh.arity == 2:
        hit_n, near_kid, kid_sum = _node_step(pbvh, cur, orig, inv_dir, t_min, t_max)
        both = is_int & (hit_n == 2)
        one = is_int & (hit_n == 1)
        far = kid_sum - near_kid
        next_int = jnp.where(both, near_kid, jnp.where(one, kid_sum, _DONE))
        return next_int, [(far, both)]
    return _node_phase4(pbvh, cur, is_int, orig, inv_dir, t_min, t_max)


# ascending sorting networks (Bose–Nelson n=4, Batcher odd-even merge n=8)
_SORT_NETS = {
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


def _node_phase4(pbvh: PackedBvh, cur, is_int, orig, inv_dir, t_min, t_max):
    """Wide internal step (BVH4/BVH8): one (R, 8*arity) row gather +
    arity scalar-column slab tests + a sorting network ordering hit
    children by entry distance. Fewer internal iterations than the binary
    layout for the same gathered bytes per visited child (the per-row
    fetch, not the slab math, is the traversal currency on this
    hardware)."""
    arity = pbvh.arity
    row = pbvh.nodes[jnp.clip(cur, 0, pbvh.nodes.shape[0] - 1)]
    ox, oy, oz = orig[:, 0], orig[:, 1], orig[:, 2]
    ix, iy, iz = inv_dir[:, 0], inv_dir[:, 1], inv_dir[:, 2]

    def slab(c):
        tx0 = (row[:, c + 0] - ox) * ix
        tx1 = (row[:, c + 3] - ox) * ix
        ty0 = (row[:, c + 1] - oy) * iy
        ty1 = (row[:, c + 4] - oy) * iy
        tz0 = (row[:, c + 2] - oz) * iz
        tz1 = (row[:, c + 5] - oz) * iz
        txn = jnp.minimum(tx0, tx1)
        txf = jnp.maximum(tx0, tx1)
        tyn = jnp.minimum(ty0, ty1)
        tyf = jnp.maximum(ty0, ty1)
        tzn = jnp.minimum(tz0, tz1)
        tzf = jnp.maximum(tz0, tz1)
        txn = jnp.where(jnp.isnan(txn), -jnp.inf, txn)
        tyn = jnp.where(jnp.isnan(tyn), -jnp.inf, tyn)
        tzn = jnp.where(jnp.isnan(tzn), -jnp.inf, tzn)
        txf = jnp.where(jnp.isnan(txf), jnp.inf, txf)
        tyf = jnp.where(jnp.isnan(tyf), jnp.inf, tyf)
        tzf = jnp.where(jnp.isnan(tzf), jnp.inf, tzf)
        entry = jnp.maximum(jnp.maximum(txn, tyn), jnp.maximum(tzn, t_min))
        exit_ = jnp.minimum(jnp.minimum(txf, tyf), jnp.minimum(tzf, t_max))
        return entry <= exit_, entry

    keys = []
    codes = []
    for c in range(arity):
        hit_c, entry_c = slab(6 * c)
        keys.append(jnp.where(hit_c & is_int, entry_c, _BIG))
        codes.append(
            jax.lax.bitcast_convert_type(row[:, 6 * arity + c], jnp.int32)
        )

    # sort the (key, code) pairs ascending by entry distance
    def cswap(i, j):
        swap = keys[i] > keys[j]
        keys[i], keys[j] = (
            jnp.where(swap, keys[j], keys[i]),
            jnp.where(swap, keys[i], keys[j]),
        )
        codes[i], codes[j] = (
            jnp.where(swap, codes[j], codes[i]),
            jnp.where(swap, codes[i], codes[j]),
        )

    for i, j in _SORT_NETS[arity]:
        cswap(i, j)

    next_int = jnp.where(keys[0] < _BIG, codes[0], _DONE)
    pushes = [
        (codes[k], keys[k] < _BIG) for k in range(arity - 1, 0, -1)
    ]
    return next_int, pushes


def traverse_closest(pbvh: PackedBvh, orig, dir, t_min, active, t_max=None):
    """Closest-hit traversal over the packed BVH. Returns (t, prim, u, v)
    per lane with prim = -1 on miss."""
    R = orig.shape[0]
    inv_dir = 1.0 / dir

    best_t = jnp.full((R,), T_MAX, jnp.float32)
    if t_max is not None:
        best_t = jnp.minimum(best_t, t_max)
    best_prim = jnp.full((R,), -1, jnp.int32)
    best_u = jnp.zeros((R,), jnp.float32)
    best_v = jnp.zeros((R,), jnp.float32)

    if pbvh.num_leaves == 1:
        t, prim, u, v, _ = _leaf_step(
            pbvh, jnp.zeros((R,), jnp.int32), orig, dir, t_min, best_t
        )
        take = active & (t < best_t)
        return (
            jnp.where(take, t, T_MAX),
            jnp.where(take, prim, -1),
            jnp.where(take, u, 0.0),
            jnp.where(take, v, 0.0),
        )

    limit = _stack_limit(pbvh)
    stack = jnp.full((R, limit), _DONE, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    cur = jnp.where(active, 0, _DONE)  # root row 0
    ovf = jnp.zeros((R,), bool)
    stack_iota = jnp.arange(limit, dtype=jnp.int32)[None, :]

    def cond(state):
        cur = state[0]
        return jnp.any(cur != _DONE)

    def step(state):
        cur, stack, sp, ovf, best_t, best_prim, best_u, best_v = state
        lane_on = cur != _DONE
        is_leaf = lane_on & (cur < 0)
        is_int = lane_on & (cur >= 0)

        # ---- internal step: one fused row gather + slab tests of all
        # children; hit children beyond the nearest are pushed far-first
        next_int, pushes = _node_phase(
            pbvh, cur, is_int, orig, inv_dir, t_min, best_t
        )
        for code, push in pushes:
            stack = jnp.where(
                push[:, None] & (stack_iota == sp[:, None]), code[:, None], stack
            )
            ovf = ovf | (push & (sp >= limit - 1))
            sp = jnp.where(push, jnp.minimum(sp + 1, limit - 1), sp)

        # ---- leaf step: one fused row gather + rectangular MT
        leaf_id = jnp.where(is_leaf, -cur - 1, 0)
        lt_t, lt_prim, lt_u, lt_v, _ = _leaf_step(
            pbvh, leaf_id, orig, dir, t_min, best_t
        )
        take = is_leaf & (lt_t < best_t)
        best_t = jnp.where(take, lt_t, best_t)
        best_prim = jnp.where(take, lt_prim, best_prim)
        best_u = jnp.where(take, lt_u, best_u)
        best_v = jnp.where(take, lt_v, best_v)

        # ---- advance
        want_pop = (is_leaf | (is_int & (next_int == _DONE))) & lane_on
        can_pop = want_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        # pop via masked reduction: per-lane minor-dim gather is ~1000x
        # slower than a where+min over the stack width on TPU
        pop_mask = stack_iota == jnp.maximum(sp, 0)[:, None]
        popped = jnp.min(jnp.where(pop_mask, stack, _DONE), axis=1)
        cur = jnp.where(
            is_int & (next_int != _DONE),
            next_int,
            jnp.where(can_pop, popped, _DONE),
        )
        return cur, stack, sp, ovf, best_t, best_prim, best_u, best_v

    def body(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    state = (cur, stack, sp, ovf, best_t, best_prim, best_u, best_v)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, ovf, best_t, best_prim, best_u, best_v = state
    # Stack overflow (only reachable on the uncertified-depth LBVH path)
    # means subtrees were dropped: surface it LOUDLY as prim = -2 misses
    # rather than returning silently-plausible hits.
    best_prim = jnp.where(ovf, -2, best_prim)
    miss = best_prim < 0
    return jnp.where(miss, T_MAX, best_t), best_prim, best_u, best_v


def traverse_any(pbvh: PackedBvh, orig, dir, t_min, t_max, mask):
    """Any-hit (occlusion) traversal with per-lane early-out. Returns (R,)
    bool occluded."""
    R = orig.shape[0]
    inv_dir = 1.0 / dir

    if pbvh.num_leaves == 1:
        anyhit = _leaf_step_any(
            pbvh, jnp.zeros((R,), jnp.int32), orig, dir, t_min, t_max
        )
        return anyhit & mask

    limit = _stack_limit(pbvh)
    stack = jnp.full((R, limit), _DONE, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    cur = jnp.where(mask, 0, _DONE)
    occluded = jnp.zeros((R,), bool)
    stack_iota = jnp.arange(limit, dtype=jnp.int32)[None, :]

    def cond(state):
        cur = state[0]
        return jnp.any(cur != _DONE)

    def step(state):
        cur, stack, sp, occluded = state
        lane_on = cur != _DONE
        is_leaf = lane_on & (cur < 0)
        is_int = lane_on & (cur >= 0)

        next_int, pushes = _node_phase(pbvh, cur, is_int, orig, inv_dir, t_min, t_max)
        for code, push in pushes:
            stack = jnp.where(
                push[:, None] & (stack_iota == sp[:, None]), code[:, None], stack
            )
            # overflow = conservatively report occluded (a visible artifact,
            # not a silent light leak); unreachable on the certified SAH path
            occluded = occluded | (push & (sp >= limit - 1))
            sp = jnp.where(push, jnp.minimum(sp + 1, limit - 1), sp)

        leaf_id = jnp.where(is_leaf, -cur - 1, 0)
        anyhit = _leaf_step_any(pbvh, leaf_id, orig, dir, t_min, t_max)
        newly = is_leaf & anyhit
        occluded = occluded | newly

        done_lane = occluded
        want_pop = (is_leaf | (is_int & (next_int == _DONE))) & lane_on & ~done_lane
        can_pop = want_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        # pop via masked reduction: per-lane minor-dim gather is ~1000x
        # slower than a where+min over the stack width on TPU
        pop_mask = stack_iota == jnp.maximum(sp, 0)[:, None]
        popped = jnp.min(jnp.where(pop_mask, stack, _DONE), axis=1)
        cur = jnp.where(
            done_lane,
            _DONE,
            jnp.where(
                is_int & (next_int != _DONE),
                next_int,
                jnp.where(can_pop, popped, _DONE),
            ),
        )
        return cur, stack, sp, occluded

    def body(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    state = (cur, stack, sp, occluded)
    state = jax.lax.while_loop(cond, body, state)
    return state[3] & mask


def _unified_stack_limit(ubvh) -> int:
    if ubvh.stack_bound is not None:
        return max(2, min(STACK_DEPTH * 2, ubvh.stack_bound + 1))
    return STACK_DEPTH


def _instance_entry(rows, orig, dir):
    """Decode instance-entry leaf rows (UnifiedBvh.leaf_rows layout): apply
    the 3x4 world-to-object transform to the WORLD ray and return
    (o_obj, d_obj, blas_root, inst_id). Uses width-1 (R, 1) BLOCK slices of
    the gathered row (the measured-fast slice family), never scalar column
    extracts. Directions are NOT renormalized so object t == world t."""

    def col(k):
        return rows[:, k : k + 1]

    ox, oy, oz = orig[:, 0:1], orig[:, 1:2], orig[:, 2:3]
    dx, dy, dz = dir[:, 0:1], dir[:, 1:2], dir[:, 2:3]
    o_obj = jnp.concatenate(
        [
            col(0) * ox + col(1) * oy + col(2) * oz + col(3),
            col(4) * ox + col(5) * oy + col(6) * oz + col(7),
            col(8) * ox + col(9) * oy + col(10) * oz + col(11),
        ],
        axis=1,
    )
    d_obj = jnp.concatenate(
        [
            col(0) * dx + col(1) * dy + col(2) * dz,
            col(4) * dx + col(5) * dy + col(6) * dz,
            col(8) * dx + col(9) * dy + col(10) * dz,
        ],
        axis=1,
    )
    blas_root = jax.lax.bitcast_convert_type(rows[:, 12], jnp.int32)
    inst_id = jax.lax.bitcast_convert_type(rows[:, 13], jnp.int32)
    return o_obj, d_obj, blas_root, inst_id


def traverse_closest_unified(ubvh, orig, dir, t_min, active, t_max=None):
    """Closest-hit traversal of a UnifiedBvh (TLAS + all BLASes in one
    table): ONE lockstep launch regardless of instance count — the role of
    the reference's TopLevelBVH traversal (rtcIntersectV over the
    instanced scene, backends/embree/embree_utils.cpp:121-136).

    Returns (t, prim, inst, u, v) with prim = -1 on miss, -2 on stack
    overflow (uncertified builds only). Lane space registers hold the
    current instance's object-space ray while inside a BLAS; LIFO stack
    nesting guarantees they stay valid until the lane returns to TLAS rows
    (node ids >= ubvh.tlas_lo), where the world ray is restored."""
    R = orig.shape[0]
    L = ubvh.leaf_size
    n_tri = ubvh.n_tri_leaves
    tlas_lo = ubvh.tlas_lo

    best_t = jnp.full((R,), T_MAX, jnp.float32)
    if t_max is not None:
        best_t = jnp.minimum(best_t, t_max)
    best_prim = jnp.full((R,), -1, jnp.int32)
    best_inst = jnp.full((R,), -1, jnp.int32)
    best_u = jnp.zeros((R,), jnp.float32)
    best_v = jnp.zeros((R,), jnp.float32)

    limit = _unified_stack_limit(ubvh)
    stack = jnp.full((R, limit), _DONE, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    cur = jnp.where(active, tlas_lo, _DONE)  # TLAS root row
    ovf = jnp.zeros((R,), bool)
    stack_iota = jnp.arange(limit, dtype=jnp.int32)[None, :]

    o_cur = orig
    d_cur = dir
    inst_reg = jnp.zeros((R,), jnp.int32)

    def cond(state):
        return jnp.any(state[0] != _DONE)

    def step(state):
        (cur, stack, sp, ovf, o_cur, d_cur, inst_reg,
         best_t, best_prim, best_inst, best_u, best_v) = state
        lane_on = cur != _DONE
        leaf_code = -cur - 1
        is_leaf = lane_on & (cur < 0)
        is_tri = is_leaf & (leaf_code < n_tri)
        is_entry = is_leaf & (leaf_code >= n_tri)
        is_int = lane_on & (cur >= 0)
        inv_cur = 1.0 / d_cur

        # ---- internal step (TLAS and BLAS rows share the table)
        next_int, pushes = _node_phase(
            ubvh, cur, is_int, o_cur, inv_cur, t_min, best_t
        )
        for code, push in pushes:
            stack = jnp.where(
                push[:, None] & (stack_iota == sp[:, None]), code[:, None], stack
            )
            ovf = ovf | (push & (sp >= limit - 1))
            sp = jnp.where(push, jnp.minimum(sp + 1, limit - 1), sp)

        # ---- ONE leaf-table gather, two interpretations
        leaf_id = jnp.where(is_leaf, leaf_code, 0)
        rows = ubvh.leaf_rows[jnp.clip(leaf_id, 0, ubvh.leaf_rows.shape[0] - 1)]

        # triangle leaves: rectangular MT + closest-slot selection
        hit, t, u, v, prim = _mt_rows(rows, L, o_cur, d_cur, t_min, best_t)
        lt_t, lt_prim, lt_u, lt_v, _ = _select_closest(hit, t, u, v, prim, L)
        take = is_tri & (lt_t < best_t)
        best_t = jnp.where(take, lt_t, best_t)
        best_prim = jnp.where(take, lt_prim, best_prim)
        best_inst = jnp.where(take, inst_reg, best_inst)
        best_u = jnp.where(take, lt_u, best_u)
        best_v = jnp.where(take, lt_v, best_v)

        # instance entries: transform the WORLD ray, jump to the BLAS root
        o_ent, d_ent, blas_root, ent_inst = _instance_entry(rows, orig, dir)

        # ---- advance
        want_pop = (is_tri | (is_int & (next_int == _DONE))) & lane_on
        can_pop = want_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        pop_mask = stack_iota == jnp.maximum(sp, 0)[:, None]
        popped = jnp.min(jnp.where(pop_mask, stack, _DONE), axis=1)
        cur = jnp.where(
            is_entry,
            blas_root,
            jnp.where(
                is_int & (next_int != _DONE),
                next_int,
                jnp.where(can_pop, popped, _DONE),
            ),
        )

        # ---- space registers for the NEW cur
        inst_reg = jnp.where(is_entry, ent_inst, inst_reg)
        o_cur = jnp.where(is_entry[:, None], o_ent, o_cur)
        d_cur = jnp.where(is_entry[:, None], d_ent, d_cur)
        back_to_world = (cur >= tlas_lo) | ((cur < 0) & (-cur - 1 >= n_tri))
        o_cur = jnp.where(back_to_world[:, None], orig, o_cur)
        d_cur = jnp.where(back_to_world[:, None], dir, d_cur)
        return (cur, stack, sp, ovf, o_cur, d_cur, inst_reg,
                best_t, best_prim, best_inst, best_u, best_v)

    def body(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    state = (cur, stack, sp, ovf, o_cur, d_cur, inst_reg,
             best_t, best_prim, best_inst, best_u, best_v)
    state = jax.lax.while_loop(cond, body, state)
    ovf = state[3]
    best_t, best_prim, best_inst, best_u, best_v = state[7:]
    best_prim = jnp.where(ovf, -2, best_prim)
    miss = best_prim < 0
    return (
        jnp.where(miss, T_MAX, best_t),
        best_prim,
        jnp.where(miss, -1, best_inst),
        best_u,
        best_v,
    )


def traverse_any_unified(ubvh, orig, dir, t_min, t_max, mask):
    """Any-hit (occlusion) traversal of a UnifiedBvh with per-lane
    early-out. Returns (R,) bool occluded (conservatively True on stack
    overflow, uncertified builds only)."""
    R = orig.shape[0]
    L = ubvh.leaf_size
    n_tri = ubvh.n_tri_leaves
    tlas_lo = ubvh.tlas_lo

    limit = _unified_stack_limit(ubvh)
    stack = jnp.full((R, limit), _DONE, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    cur = jnp.where(mask, tlas_lo, _DONE)
    occluded = jnp.zeros((R,), bool)
    stack_iota = jnp.arange(limit, dtype=jnp.int32)[None, :]
    o_cur = orig
    d_cur = dir

    def cond(state):
        return jnp.any(state[0] != _DONE)

    def step(state):
        cur, stack, sp, occluded, o_cur, d_cur = state
        lane_on = cur != _DONE
        leaf_code = -cur - 1
        is_leaf = lane_on & (cur < 0)
        is_tri = is_leaf & (leaf_code < n_tri)
        is_entry = is_leaf & (leaf_code >= n_tri)
        is_int = lane_on & (cur >= 0)
        inv_cur = 1.0 / d_cur

        next_int, pushes = _node_phase(ubvh, cur, is_int, o_cur, inv_cur, t_min, t_max)
        for code, push in pushes:
            stack = jnp.where(
                push[:, None] & (stack_iota == sp[:, None]), code[:, None], stack
            )
            occluded = occluded | (push & (sp >= limit - 1))
            sp = jnp.where(push, jnp.minimum(sp + 1, limit - 1), sp)

        leaf_id = jnp.where(is_leaf, leaf_code, 0)
        rows = ubvh.leaf_rows[jnp.clip(leaf_id, 0, ubvh.leaf_rows.shape[0] - 1)]
        hit, _, _, _, _ = _mt_rows(rows, L, o_cur, d_cur, t_min, t_max)
        occluded = occluded | (is_tri & jnp.any(hit, axis=1))

        o_ent, d_ent, blas_root, _ = _instance_entry(rows, orig, dir)

        done_lane = occluded
        want_pop = (is_tri | (is_int & (next_int == _DONE))) & lane_on & ~done_lane
        can_pop = want_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        pop_mask = stack_iota == jnp.maximum(sp, 0)[:, None]
        popped = jnp.min(jnp.where(pop_mask, stack, _DONE), axis=1)
        cur = jnp.where(
            done_lane,
            _DONE,
            jnp.where(
                is_entry,
                blas_root,
                jnp.where(
                    is_int & (next_int != _DONE),
                    next_int,
                    jnp.where(can_pop, popped, _DONE),
                ),
            ),
        )
        o_cur = jnp.where(is_entry[:, None], o_ent, o_cur)
        d_cur = jnp.where(is_entry[:, None], d_ent, d_cur)
        back_to_world = (cur >= tlas_lo) | ((cur < 0) & (-cur - 1 >= n_tri))
        o_cur = jnp.where(back_to_world[:, None], orig, o_cur)
        d_cur = jnp.where(back_to_world[:, None], dir, d_cur)
        return cur, stack, sp, occluded, o_cur, d_cur

    def body(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    state = (cur, stack, sp, occluded, o_cur, d_cur)
    state = jax.lax.while_loop(cond, body, state)
    return state[3] & mask


def traverse_closest_unified_blocked(
    ubvh, orig, dir, t_min, active, t_max=None, block: int = DEFAULT_BLOCK
):
    """Block-mapped unified closest-hit traversal."""
    R = orig.shape[0]
    if t_max is None:
        t_max = jnp.full((R,), T_MAX, jnp.float32)

    def fn(args):
        o, d, tn, a, tm = args
        return traverse_closest_unified(ubvh, o, d, tn, a, t_max=tm)

    return _map_blocks(fn, (orig, dir, t_min, active, t_max), R, block)


def traverse_any_unified_blocked(
    ubvh, orig, dir, t_min, t_max, mask, block: int = DEFAULT_BLOCK
):
    """Block-mapped unified any-hit traversal."""
    R = orig.shape[0]
    t_max = jnp.broadcast_to(t_max, (R,))

    def fn(args):
        o, d, tn, tm, m = args
        return traverse_any_unified(ubvh, o, d, tn, tm, m)

    return _map_blocks(fn, (orig, dir, t_min, t_max, mask), R, block)


def ray_sort_perm_only(orig, dir, active):
    """Just the sort permutation of ray_sort_perm (no inverse). Key, most
    significant first: active lanes first (1 bit), COARSE origin Morton
    (top 18 of 27 bits, batch-adaptive quantization), direction octant
    (3 bits), fine origin Morton (low 9 bits). Shared-stack packet
    traversal pays the UNION of a packet's per-ray node visits; measured
    on the hall diffuse-bounce wavefront, clustering by coarse ORIGIN
    before direction cuts kernel iterations 27.7K -> 20.9K (-25%, round 3
    scripts/sortkey_probe.py) vs the round-2 direction-major key — rays
    from one surface patch share the BVH's upper levels regardless of
    direction, and the octant split below handles the descent divergence.
    ~0.13 ms argsort at 921K keys."""
    from chameleonrt_tpu.ops.lbvh import _expand_bits_10

    octant = (
        (dir[:, 0] < 0).astype(jnp.uint32) * 4
        + (dir[:, 1] < 0).astype(jnp.uint32) * 2
        + (dir[:, 2] < 0).astype(jnp.uint32)
    )
    lo = jnp.min(orig, axis=0)
    hi = jnp.max(orig, axis=0)
    scale = 511.0 / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((orig - lo) * scale, 0.0, 511.0).astype(jnp.uint32)
    morton = (
        (_expand_bits_10(q[:, 0]) << np.uint32(2))
        | (_expand_bits_10(q[:, 1]) << np.uint32(1))
        | _expand_bits_10(q[:, 2])
    )  # 27 bits
    key = (
        ((~active).astype(jnp.uint32) << np.uint32(30))
        | ((morton >> np.uint32(9)) << np.uint32(12))
        | (octant << np.uint32(9))
        | (morton & np.uint32(0x1FF))
    )
    return jnp.argsort(key)


def ray_sort_perm(orig, dir, active):
    """Permutation that groups rays for lockstep traversal, using the same
    key as ray_sort_perm_only (coarse origin Morton, then direction
    octant, then fine origin Morton — see its docstring for the measured
    rationale). Traversal cost per block is its WORST lane's path length,
    so grouping similar rays is a direct lever; the sort itself is
    ~0.13 ms at 921K keys on v5e (measured) — noise next to a traversal
    pass. Returns (perm, inv): x_sorted = x[perm], result_original =
    result_sorted[inv]."""
    R = orig.shape[0]
    perm = ray_sort_perm_only(orig, dir, active)
    inv = (
        jnp.zeros((R,), jnp.int32)
        .at[perm]
        .set(jnp.arange(R, dtype=jnp.int32), unique_indices=True)
    )
    return perm, inv


def traverse_closest_blocked(
    pbvh: PackedBvh, orig, dir, t_min, active, t_max=None, block: int = DEFAULT_BLOCK
):
    """Block-mapped closest-hit traversal (see DEFAULT_BLOCK)."""
    R = orig.shape[0]
    if t_max is None:
        t_max = jnp.full((R,), T_MAX, jnp.float32)

    def fn(args):
        o, d, tn, a, tm = args
        return traverse_closest(pbvh, o, d, tn, a, t_max=tm)

    return _map_blocks(fn, (orig, dir, t_min, active, t_max), R, block)


def traverse_any_blocked(
    pbvh: PackedBvh, orig, dir, t_min, t_max, mask, block: int = DEFAULT_BLOCK
):
    """Block-mapped any-hit traversal."""
    R = orig.shape[0]
    t_max = jnp.broadcast_to(t_max, (R,))

    def fn(args):
        o, d, tn, tm, m = args
        return traverse_any(pbvh, o, d, tn, tm, m)

    return _map_blocks(fn, (orig, dir, t_min, t_max, mask), R, block)
