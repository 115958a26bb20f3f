"""Native binned-SAH builder (native/bvhbuilder.cpp): structural invariants
of the packed layout + traversal parity with the on-device LBVH.

The role filled is the reference's vendor SAH build (rtcCommitScene,
backends/embree/embree_utils.cpp:63-83): same input (triangle soup), same
contract (every primitive reachable exactly once, bounded depth), checked
here explicitly because we own the builder."""

import numpy as np
import pytest

from chameleonrt_tpu import native
from chameleonrt_tpu.ops.lbvh import LEAF_SIZE

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


def _random_tris(n, seed=0):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = r.uniform(-1, 1, (n, 3)).astype(np.float32)
    e2 = r.uniform(-1, 1, (n, 3)).astype(np.float32)
    return v0, e1, e2


def _walk(nodes, leaf_rows, L):
    """Decode the packed tree; return (leaf prim ids seen, max depth)."""
    prims = []
    max_depth = 0
    stack = [(0, 1)]
    while stack:
        node, depth = stack.pop()
        max_depth = max(max_depth, depth)
        kids = nodes[node][12:14].view(np.int32)
        if nodes.shape[0] == 1 and kids[0] == kids[1] == -1:
            kids = kids[:1]  # single-leaf tree: right child is an empty box
        for k in kids:
            if k >= 0:
                assert k < nodes.shape[0]
                stack.append((int(k), depth + 1))
            else:
                ids = leaf_rows[-int(k) - 1][9 * L : 10 * L].view(np.int32)
                prims.extend(int(p) for p in ids if p >= 0)
    return prims, max_depth


@pytest.mark.parametrize("n", [1, 3, 4, 5, 17, 1000])
def test_every_prim_once(n):
    v0, e1, e2 = _random_tris(n)
    nodes, leaf_rows, depth = native.build_bvh_native(v0, e1, e2, LEAF_SIZE)
    prims, walked_depth = _walk(nodes, leaf_rows, LEAF_SIZE)
    assert sorted(prims) == list(range(n))
    assert depth <= 44
    assert walked_depth <= depth + 1


def test_boxes_contain_triangles():
    n = 500
    v0, e1, e2 = _random_tris(n, seed=3)
    nodes, leaf_rows, _ = native.build_bvh_native(v0, e1, e2, LEAF_SIZE)
    L = LEAF_SIZE
    # root row's union box must contain every triangle vertex
    lo = np.minimum(nodes[0, 0:3], nodes[0, 6:9])
    hi = np.maximum(nodes[0, 3:6], nodes[0, 9:12])
    lo = np.where(np.isfinite(lo), lo, nodes[0, 0:3])
    hi = np.where(np.isfinite(hi), hi, nodes[0, 3:6])
    for p in (v0, v0 + e1, v0 + e2):
        assert (p >= lo - 1e-4).all() and (p <= hi + 1e-4).all()
    # each leaf's triangles sit inside SOME parent box chain; check leaf
    # data round-trips exactly
    ids = leaf_rows[:, 9 * L : 10 * L].view(np.int32).reshape(-1)
    real = ids[ids >= 0]
    got_v0x = leaf_rows[:, 0:L].reshape(-1)[ids >= 0]
    assert np.array_equal(got_v0x, v0[real, 0])


def _walk4(nodes4, leaf_rows, L):
    """Decode the packed BVH4 tree; returns (prims, max concurrent pushes
    lower bound via DFS depth accounting)."""
    prims = []
    stack = [0]
    visited = set()
    while stack:
        node = stack.pop()
        assert node not in visited, "cycle in BVH4"
        visited.add(node)
        row = nodes4[node]
        codes = row[24:28].view(np.int32)
        for c in range(4):
            lo = row[6 * c : 6 * c + 3]
            hi = row[6 * c + 3 : 6 * c + 6]
            if lo[0] >= 1e29 and hi[0] >= 1e29:
                continue  # empty slot
            k = int(codes[c])
            if k >= 0:
                assert k < nodes4.shape[0]
                stack.append(k)
            else:
                ids = leaf_rows[-k - 1][9 * L : 10 * L].view(np.int32)
                prims.extend(int(p) for p in ids if p >= 0)
    return prims


@pytest.mark.parametrize("n", [1, 3, 4, 5, 17, 1000, 20000])
def test_bvh4_every_prim_once(n):
    v0, e1, e2 = _random_tris(n, seed=11)
    nodes4, leaf_rows, max_stack = native.build_bvh4_native(v0, e1, e2, LEAF_SIZE)
    assert nodes4.shape[1] == 32
    prims = _walk4(nodes4, leaf_rows, LEAF_SIZE)
    assert sorted(prims) == list(range(n))
    assert 1 <= max_stack <= 3 * 44 + 1


def test_bvh4_traversal_matches_brute_force():
    import jax.numpy as jnp

    from chameleonrt_tpu.ops.intersect import brute_force_closest
    from chameleonrt_tpu.ops.lbvh import PackedBvh
    from chameleonrt_tpu.ops.traverse import traverse_any, traverse_closest

    n = 5000
    v0, e1, e2 = _random_tris(n, seed=5)
    nodes4, leaf_rows, max_stack = native.build_bvh4_native(v0, e1, e2, LEAF_SIZE)
    pbvh = PackedBvh(
        nodes=jnp.asarray(nodes4), leaf_rows=jnp.asarray(leaf_rows), max_depth=max_stack
    )
    assert pbvh.arity == 4

    r = np.random.default_rng(9)
    R = 400
    orig = jnp.asarray(r.uniform(-8, 8, (R, 3)).astype(np.float32))
    d = r.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_min = jnp.zeros((R,), jnp.float32)
    active = jnp.ones((R,), bool)

    t, prim, u, v = traverse_closest(pbvh, orig, d, t_min, active)
    bt, btri, bu, bv = brute_force_closest(orig, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2))
    np.testing.assert_allclose(np.asarray(t), np.asarray(bt), rtol=1e-4, atol=1e-5)
    assert ((np.asarray(prim) >= 0) == (np.asarray(btri) >= 0)).all()

    occ = traverse_any(
        pbvh, orig, d, t_min, jnp.full((R,), 3.0, jnp.float32), active
    )
    has_near = np.asarray(bt) < 3.0
    np.testing.assert_array_equal(np.asarray(occ), has_near)


def test_identical_centroids_terminate():
    # all triangles identical: SAH has no split; median fallback must
    # terminate and still emit every prim once
    n = 37
    v0 = np.zeros((n, 3), np.float32)
    e1 = np.tile(np.array([1, 0, 0], np.float32), (n, 1))
    e2 = np.tile(np.array([0, 1, 0], np.float32), (n, 1))
    nodes, leaf_rows, depth = native.build_bvh_native(v0, e1, e2, LEAF_SIZE)
    prims, _ = _walk(nodes, leaf_rows, LEAF_SIZE)
    assert sorted(prims) == list(range(n))
    assert depth <= 44
