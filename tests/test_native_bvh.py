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
