"""Vectorized BVH traversal (jax) — the TPU replacement for hardware ray
traversal (rtcIntersectV / optixTrace / TraceRay in the reference backends).

Design: the whole ray wavefront traverses in lockstep inside one
`lax.while_loop`. Each lane carries a short stack (int32) and a current node;
every iteration performs, per lane, either an internal-node step (slab-test
both children, push far / descend near) or a leaf step (rectangular
LEAF_SIZE-wide Möller–Trumbore block), selected by mask. All memory access is
wide gathers from the flat SoA node/triangle arrays in HBM; all arithmetic is
(R,)-shaped VPU work. The loop runs until every lane has emptied its stack —
divergence is bounded by ordered near-first descent and, for occlusion rays,
per-lane early-out on first hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chameleonrt_tpu.ops.intersect import T_MAX, moller_trumbore
from chameleonrt_tpu.ops.lbvh import Bvh, LEAF_SIZE

STACK_DEPTH = 48
_SENTINEL = jnp.int32(-1)


def _slab_test(orig, inv_dir, t_min, t_max, box_min, box_max):
    """Ray/AABB slab test. Returns (hit, t_entry). Robust to inf inv_dir."""
    t0 = (box_min - orig) * inv_dir
    t1 = (box_max - orig) * inv_dir
    tnear = jnp.minimum(t0, t1)
    tfar = jnp.maximum(t0, t1)
    # NaNs (0 * inf) are suppressed by min/max identity choices
    tnear = jnp.where(jnp.isnan(tnear), -jnp.inf, tnear)
    tfar = jnp.where(jnp.isnan(tfar), jnp.inf, tfar)
    entry = jnp.maximum(jnp.max(tnear, axis=-1), t_min)
    exit_ = jnp.minimum(jnp.min(tfar, axis=-1), t_max)
    return entry <= exit_, entry


def _leaf_intersect(bvh: Bvh, tri_v0, tri_e1, tri_e2, leaf_id, orig, dir, t_min, t_max):
    """Intersect the LEAF_SIZE-triangle run of `leaf_id` per lane.
    Returns (t, local_slot, u, v) with slot=-1 on miss; t==T_MAX on miss."""
    base = leaf_id * LEAF_SIZE
    slots = base[:, None] + jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]
    prim = bvh.prim_order[slots]  # (R, L) original tri ids, -1 padding
    safe = jnp.maximum(prim, 0)
    v0 = tri_v0[safe]
    e1 = tri_e1[safe]
    e2 = tri_e2[safe]
    hit, t, u, v = moller_trumbore(
        orig[:, None, :], dir[:, None, :], v0, e1, e2, t_min[:, None], t_max[:, None]
    )
    hit = hit & (prim >= 0)
    t = jnp.where(hit, t, T_MAX)
    arg = jnp.argmin(t, axis=1)
    rows = jnp.arange(orig.shape[0])
    best_t = t[rows, arg]
    best_prim = jnp.where(best_t < T_MAX, prim[rows, arg], -1)
    return best_t, best_prim, u[rows, arg], v[rows, arg], jnp.any(hit, axis=1)


def traverse_closest(
    bvh: Bvh, tri_v0, tri_e1, tri_e2, orig, dir, t_min, active, t_max=None
):
    """Closest-hit traversal. Returns (t, prim, u, v) per lane with prim = -1
    on miss. `tri_*` must be the same arrays the BVH was built over (prim ids
    index into them)."""
    R = orig.shape[0]
    n_leaves = bvh.num_leaves
    leaf_base = n_leaves - 1
    inv_dir = 1.0 / dir  # inf on zero components; slab test handles it

    best_t = jnp.full((R,), T_MAX, jnp.float32)
    if t_max is not None:
        best_t = jnp.minimum(best_t, t_max)
    best_prim = jnp.full((R,), -1, jnp.int32)
    best_u = jnp.zeros((R,), jnp.float32)
    best_v = jnp.zeros((R,), jnp.float32)

    if n_leaves == 1:
        t, prim, u, v, _ = _leaf_intersect(
            bvh, tri_v0, tri_e1, tri_e2, jnp.zeros((R,), jnp.int32), orig, dir, t_min, best_t
        )
        take = active & (t < best_t)
        return (
            jnp.where(take, t, T_MAX),
            jnp.where(take, prim, -1),
            jnp.where(take, u, 0.0),
            jnp.where(take, v, 0.0),
        )

    stack = jnp.full((R, STACK_DEPTH), _SENTINEL, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    cur = jnp.where(active, 0, _SENTINEL)  # root; inactive lanes start done

    def cond(state):
        cur, *_ = state
        return jnp.any(cur != _SENTINEL)

    def body(state):
        cur, stack, sp, best_t, best_prim, best_u, best_v = state
        lane_on = cur != _SENTINEL
        node = jnp.maximum(cur, 0)
        is_leaf = lane_on & (cur >= leaf_base)
        is_int = lane_on & ~is_leaf

        # ---- internal step: test both children
        left = bvh.node_left[node]
        right = bvh.node_right[node]
        lhit, lt = _slab_test(
            orig, inv_dir, t_min, best_t, bvh.node_min[left], bvh.node_max[left]
        )
        rhit, rt = _slab_test(
            orig, inv_dir, t_min, best_t, bvh.node_min[right], bvh.node_max[right]
        )
        lhit = lhit & is_int
        rhit = rhit & is_int
        both = lhit & rhit
        near_is_left = lt <= rt
        near = jnp.where(near_is_left, left, right)
        far = jnp.where(near_is_left, right, left)
        one = lhit ^ rhit
        only = jnp.where(lhit, left, right)
        next_int = jnp.where(both, near, jnp.where(one, only, _SENTINEL))
        # push far child when both hit
        stack = jnp.where(
            both[:, None]
            & (jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :] == sp[:, None]),
            far[:, None],
            stack,
        )
        sp = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH - 1), sp)

        # ---- leaf step: rectangular triangle block
        leaf_id = jnp.maximum(cur - leaf_base, 0)
        lt_t, lt_prim, lt_u, lt_v, _ = _leaf_intersect(
            bvh, tri_v0, tri_e1, tri_e2, leaf_id, orig, dir, t_min, best_t
        )
        take = is_leaf & (lt_t < best_t)
        best_t = jnp.where(take, lt_t, best_t)
        best_prim = jnp.where(take, lt_prim, best_prim)
        best_u = jnp.where(take, lt_u, best_u)
        best_v = jnp.where(take, lt_v, best_v)

        # ---- advance: internal lanes go to next_int (or pop); leaf lanes pop
        want_pop = (is_leaf | (is_int & (next_int == _SENTINEL))) & lane_on
        can_pop = want_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = stack[jnp.arange(R), jnp.maximum(sp, 0)]
        cur = jnp.where(
            is_int & (next_int != _SENTINEL),
            next_int,
            jnp.where(can_pop, popped, _SENTINEL),
        )
        return cur, stack, sp, best_t, best_prim, best_u, best_v

    state = (cur, stack, sp, best_t, best_prim, best_u, best_v)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, best_t, best_prim, best_u, best_v = state
    return best_t, best_prim, best_u, best_v


def traverse_any(bvh: Bvh, tri_v0, tri_e1, tri_e2, orig, dir, t_min, t_max, mask):
    """Any-hit (occlusion) traversal with per-lane early-out. Returns (R,)
    bool occluded."""
    R = orig.shape[0]
    n_leaves = bvh.num_leaves
    leaf_base = n_leaves - 1
    inv_dir = 1.0 / dir

    if n_leaves == 1:
        _, _, _, _, anyhit = _leaf_intersect(
            bvh,
            tri_v0,
            tri_e1,
            tri_e2,
            jnp.zeros((R,), jnp.int32),
            orig,
            dir,
            t_min,
            t_max,
        )
        return anyhit & mask

    stack = jnp.full((R, STACK_DEPTH), _SENTINEL, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    cur = jnp.where(mask, 0, _SENTINEL)
    occluded = jnp.zeros((R,), bool)

    def cond(state):
        cur, *_ = state
        return jnp.any(cur != _SENTINEL)

    def body(state):
        cur, stack, sp, occluded = state
        lane_on = (cur != _SENTINEL) & ~occluded
        node = jnp.maximum(cur, 0)
        is_leaf = lane_on & (cur >= leaf_base)
        is_int = lane_on & ~is_leaf

        left = bvh.node_left[node]
        right = bvh.node_right[node]
        lhit, _ = _slab_test(
            orig, inv_dir, t_min, t_max, bvh.node_min[left], bvh.node_max[left]
        )
        rhit, _ = _slab_test(
            orig, inv_dir, t_min, t_max, bvh.node_min[right], bvh.node_max[right]
        )
        lhit = lhit & is_int
        rhit = rhit & is_int
        both = lhit & rhit
        one = lhit ^ rhit
        only = jnp.where(lhit, left, right)
        next_int = jnp.where(both, left, jnp.where(one, only, _SENTINEL))
        stack = jnp.where(
            both[:, None]
            & (jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :] == sp[:, None]),
            right[:, None],
            stack,
        )
        sp = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH - 1), sp)

        leaf_id = jnp.maximum(cur - leaf_base, 0)
        _, _, _, _, anyhit = _leaf_intersect(
            bvh, tri_v0, tri_e1, tri_e2, leaf_id, orig, dir, t_min, t_max
        )
        occluded = occluded | (is_leaf & anyhit)

        done_lane = occluded
        want_pop = ((is_leaf | (is_int & (next_int == _SENTINEL))) & lane_on) | (
            (cur != _SENTINEL) & done_lane
        )
        can_pop = want_pop & (sp > 0) & ~done_lane
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = stack[jnp.arange(R), jnp.maximum(sp, 0)]
        cur = jnp.where(
            done_lane,
            _SENTINEL,
            jnp.where(
                is_int & (next_int != _SENTINEL),
                next_int,
                jnp.where(can_pop, popped, _SENTINEL),
            ),
        )
        return cur, stack, sp, occluded

    state = (cur, stack, sp, occluded)
    state = jax.lax.while_loop(cond, body, state)
    return state[3] & mask
