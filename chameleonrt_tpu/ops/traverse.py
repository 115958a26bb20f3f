"""Vectorized BVH traversal (jax) — the TPU replacement for hardware ray
traversal (rtcIntersectV / optixTrace / TraceRay in the reference backends).

Design: the whole ray wavefront traverses in lockstep inside one
`lax.while_loop`. Each lane carries a short stack (int32) and a current node;
every iteration performs, per lane, either an internal-node step or a leaf
step, selected by mask.

HBM gathers are the scarce resource on TPU, so the loop runs on the
`PackedBvh` layout (ops/lbvh.py): an internal step is ONE 16-float row
gather (both children's AABBs + child pointers fused into the parent), and a
leaf step is ONE (LEAF_SIZE, 9) row gather followed by a rectangular
Möller–Trumbore block on the VPU. Child pointers encode leaves as negative
values (-(leaf+1)), so leaf-ness is a sign test.

Divergence is bounded by ordered near-first descent and, for occlusion rays,
per-lane early-out on first hit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from chameleonrt_tpu.ops.intersect import T_MAX, moller_trumbore
from chameleonrt_tpu.ops.lbvh import PackedBvh

STACK_DEPTH = 48
_DONE = jnp.int32(0x7FFFFFFF)  # sentinel current-node value: lane finished

# Rays per lockstep block. The while_loop runs until the LAST lane of a
# block finishes, so the whole wavefront pays one global worst-case if
# traversed at once; mapping over blocks bounds each block's cost by its own
# worst lane (long-tailed divergence makes this a ~10x lever) and keeps the
# loop carry (stack, best-hit state) small enough to live in VMEM.
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


def _slab_test(orig, inv_dir, t_min, t_max, box_min, box_max):
    """Ray/AABB slab test. Returns (hit, t_entry). Robust to inf inv_dir."""
    t0 = (box_min - orig) * inv_dir
    t1 = (box_max - orig) * inv_dir
    tnear = jnp.minimum(t0, t1)
    tfar = jnp.maximum(t0, t1)
    tnear = jnp.where(jnp.isnan(tnear), -jnp.inf, tnear)
    tfar = jnp.where(jnp.isnan(tfar), jnp.inf, tfar)
    entry = jnp.maximum(jnp.max(tnear, axis=-1), t_min)
    exit_ = jnp.minimum(jnp.min(tfar, axis=-1), t_max)
    return entry <= exit_, entry


def _leaf_step(pbvh: PackedBvh, leaf_id, orig, dir, t_min, t_max):
    """Rectangular leaf intersection from the packed leaf rows.
    Returns (t, prim, u, v, anyhit): t=T_MAX / prim=-1 on miss."""
    rows = pbvh.leaf_tris[leaf_id]  # (R, L, 9)
    prim = pbvh.leaf_prim[leaf_id]  # (R, L)
    v0 = rows[..., 0:3]
    e1 = rows[..., 3:6]
    e2 = rows[..., 6:9]
    hit, t, u, v = moller_trumbore(
        orig[:, None, :], dir[:, None, :], v0, e1, e2, t_min[:, None], t_max[:, None]
    )
    hit = hit & (prim >= 0)
    t = jnp.where(hit, t, T_MAX)
    arg = jnp.argmin(t, axis=1)
    rows_i = jnp.arange(orig.shape[0])
    best_t = t[rows_i, arg]
    best_prim = jnp.where(best_t < T_MAX, prim[rows_i, arg], -1)
    return best_t, best_prim, u[rows_i, arg], v[rows_i, arg], jnp.any(hit, axis=1)


def _decode(row):
    """Split a packed node row into child AABBs + pointers."""
    lmin = row[..., 0:3]
    lmax = row[..., 3:6]
    rmin = row[..., 6:9]
    rmax = row[..., 9:12]
    kids = jax.lax.bitcast_convert_type(row[..., 12:14], jnp.int32)
    return lmin, lmax, rmin, rmax, kids[..., 0], kids[..., 1]


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

    stack = jnp.full((R, STACK_DEPTH), _DONE, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    cur = jnp.where(active, 0, _DONE)  # root row 0
    lane_ids = jnp.arange(R)
    stack_iota = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]

    def cond(state):
        cur = state[0]
        return jnp.any(cur != _DONE)

    def body(state):
        cur, stack, sp, best_t, best_prim, best_u, best_v = state
        lane_on = cur != _DONE
        is_leaf = lane_on & (cur < 0)
        is_int = lane_on & (cur >= 0)

        # ---- internal step: one fused row gather
        row = pbvh.nodes[jnp.clip(cur, 0, pbvh.nodes.shape[0] - 1)]
        lmin, lmax, rmin, rmax, left, right = _decode(row)
        lhit, lt = _slab_test(orig, inv_dir, t_min, best_t, lmin, lmax)
        rhit, rt = _slab_test(orig, inv_dir, t_min, best_t, rmin, rmax)
        lhit = lhit & is_int
        rhit = rhit & is_int
        both = lhit & rhit
        near_is_left = lt <= rt
        near = jnp.where(near_is_left, left, right)
        far = jnp.where(near_is_left, right, left)
        one = lhit ^ rhit
        only = jnp.where(lhit, left, right)
        next_int = jnp.where(both, near, jnp.where(one, only, _DONE))
        stack = jnp.where(
            both[:, None] & (stack_iota == sp[:, None]), far[:, None], stack
        )
        sp = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH - 1), sp)

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
        popped = stack[lane_ids, jnp.maximum(sp, 0)]
        cur = jnp.where(
            is_int & (next_int != _DONE),
            next_int,
            jnp.where(can_pop, popped, _DONE),
        )
        return cur, stack, sp, best_t, best_prim, best_u, best_v

    state = (cur, stack, sp, best_t, best_prim, best_u, best_v)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, best_t, best_prim, best_u, best_v = state
    miss = best_prim < 0
    return jnp.where(miss, T_MAX, best_t), best_prim, best_u, best_v


def traverse_any(pbvh: PackedBvh, orig, dir, t_min, t_max, mask):
    """Any-hit (occlusion) traversal with per-lane early-out. Returns (R,)
    bool occluded."""
    R = orig.shape[0]
    inv_dir = 1.0 / dir

    if pbvh.num_leaves == 1:
        _, _, _, _, anyhit = _leaf_step(
            pbvh, jnp.zeros((R,), jnp.int32), orig, dir, t_min, t_max
        )
        return anyhit & mask

    stack = jnp.full((R, STACK_DEPTH), _DONE, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    cur = jnp.where(mask, 0, _DONE)
    occluded = jnp.zeros((R,), bool)
    lane_ids = jnp.arange(R)
    stack_iota = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]

    def cond(state):
        cur = state[0]
        return jnp.any(cur != _DONE)

    def body(state):
        cur, stack, sp, occluded = state
        lane_on = cur != _DONE
        is_leaf = lane_on & (cur < 0)
        is_int = lane_on & (cur >= 0)

        row = pbvh.nodes[jnp.clip(cur, 0, pbvh.nodes.shape[0] - 1)]
        lmin, lmax, rmin, rmax, left, right = _decode(row)
        lhit, _ = _slab_test(orig, inv_dir, t_min, t_max, lmin, lmax)
        rhit, _ = _slab_test(orig, inv_dir, t_min, t_max, rmin, rmax)
        lhit = lhit & is_int
        rhit = rhit & is_int
        both = lhit & rhit
        one = lhit ^ rhit
        only = jnp.where(lhit, left, right)
        next_int = jnp.where(both, left, jnp.where(one, only, _DONE))
        stack = jnp.where(
            both[:, None] & (stack_iota == sp[:, None]), right[:, None], stack
        )
        sp = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH - 1), sp)

        leaf_id = jnp.where(is_leaf, -cur - 1, 0)
        _, _, _, _, anyhit = _leaf_step(pbvh, leaf_id, orig, dir, t_min, t_max)
        newly = is_leaf & anyhit
        occluded = occluded | newly

        done_lane = occluded
        want_pop = (is_leaf | (is_int & (next_int == _DONE))) & lane_on & ~done_lane
        can_pop = want_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = stack[lane_ids, jnp.maximum(sp, 0)]
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

    state = (cur, stack, sp, occluded)
    state = jax.lax.while_loop(cond, body, state)
    return state[3] & mask


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
