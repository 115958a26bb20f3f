"""LBVH build validity + traversal-vs-brute-force agreement (the traversal
test strategy from SURVEY.md §4: BVH traversal checked against brute-force
intersection on small scenes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chameleonrt_tpu.ops import lbvh
from chameleonrt_tpu.ops.intersect import brute_force_any, brute_force_closest
from chameleonrt_tpu.ops.lbvh import pack_bvh
from chameleonrt_tpu.ops.traverse import traverse_any, traverse_closest
from chameleonrt_tpu.scene.procedural import random_triangles


def make_tris(n, seed=0):
    scene = random_triangles(n_tris=n, seed=seed)
    g = scene.meshes[0].geometries[0]
    idx = g.indices.astype(np.int64)
    v = g.vertices
    v0 = v[idx[:, 0]]
    e1 = v[idx[:, 1]] - v0
    e2 = v[idx[:, 2]] - v0
    return jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)


def make_rays(n, seed=1, spread=3.0):
    rs = np.random.default_rng(seed)
    orig = rs.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(orig), jnp.asarray(d.astype(np.float32))


class TestLbvhBuild:
    @pytest.mark.parametrize("n_tris", [1, 2, 3, 4, 5, 17, 64, 333, 1024])
    def test_structure_valid(self, n_tris):
        v0, e1, e2 = make_tris(n_tris)
        tmin, tmax = lbvh.triangle_aabbs(v0, e1, e2)
        bvh = lbvh.build_bvh(tmin, tmax)
        n_leaves = bvh.num_leaves
        total = 2 * n_leaves - 1
        order = np.asarray(bvh.prim_order)
        # permutation: every prim exactly once, padding is -1
        real = order[order >= 0]
        assert sorted(real.tolist()) == list(range(n_tris))
        assert (order == -1).sum() == n_leaves * lbvh.LEAF_SIZE - n_tris

        if n_leaves > 1:
            left = np.asarray(bvh.node_left)[: n_leaves - 1]
            right = np.asarray(bvh.node_right)[: n_leaves - 1]
            # each non-root node has exactly one parent
            child_count = np.zeros(total, np.int32)
            np.add.at(child_count, left, 1)
            np.add.at(child_count, right, 1)
            assert child_count[0] == 0  # root
            assert (child_count[1:] == 1).all()
            # parent AABBs contain child AABBs
            nmin = np.asarray(bvh.node_min)
            nmax = np.asarray(bvh.node_max)
            for parent in range(n_leaves - 1):
                for child in (left[parent], right[parent]):
                    assert (nmin[parent] <= nmin[child] + 1e-6).all()
                    assert (nmax[parent] >= nmax[child] - 1e-6).all()
            assert np.isfinite(nmin).all() and np.isfinite(nmax).all()

    def test_build_jits(self):
        v0, e1, e2 = make_tris(100)
        tmin, tmax = lbvh.triangle_aabbs(v0, e1, e2)
        bvh = jax.jit(lbvh.build_bvh)(tmin, tmax)
        assert np.isfinite(np.asarray(bvh.node_min)).all()

    def test_morton_ordering_locality(self):
        """Nearby centroids get nearby morton codes: sorted order clusters
        spatially (weak check: average hop distance much below random)."""
        v0, e1, e2 = make_tris(512)
        tmin, tmax = lbvh.triangle_aabbs(v0, e1, e2)
        cent = np.asarray(0.5 * (tmin + tmax))
        codes = np.asarray(
            lbvh.morton_codes(
                jnp.asarray(cent), jnp.asarray(cent.min(0)), jnp.asarray(cent.max(0))
            )
        )
        order = np.argsort(codes, kind="stable")
        sorted_c = cent[order]
        hop = np.linalg.norm(np.diff(sorted_c, axis=0), axis=1).mean()
        rand_hop = np.linalg.norm(
            np.diff(cent[np.random.default_rng(0).permutation(512)], axis=0), axis=1
        ).mean()
        assert hop < 0.6 * rand_hop


class TestTraversalAgreesWithBruteForce:
    @pytest.mark.parametrize("n_tris,n_rays", [(1, 64), (7, 128), (200, 512), (2000, 512)])
    def test_closest_hit_exact(self, n_tris, n_rays):
        v0, e1, e2 = make_tris(n_tris, seed=n_tris)
        tmin, tmax = lbvh.triangle_aabbs(v0, e1, e2)
        bvh = lbvh.build_bvh(tmin, tmax)
        orig, dir = make_rays(n_rays, seed=n_tris + 1)
        t_min = jnp.zeros((n_rays,), jnp.float32)
        active = jnp.ones((n_rays,), bool)
        t_b, tri_b, u_b, v_b = brute_force_closest(orig, dir, v0, e1, e2)
        pbvh = pack_bvh(bvh, v0, e1, e2)
        t_t, tri_t, u_t, v_t = traverse_closest(pbvh, orig, dir, t_min, active)
        t_b, tri_b, t_t, tri_t = map(np.asarray, (t_b, tri_b, t_t, tri_t))
        hit_b = tri_b >= 0
        hit_t = np.asarray(tri_t) >= 0
        np.testing.assert_array_equal(hit_b, hit_t)
        # same triangle or same t (duplicate-surface ties allowed)
        same = (tri_b == tri_t) | np.isclose(t_b, t_t, rtol=1e-5, atol=1e-6)
        assert same[hit_b].all()
        np.testing.assert_allclose(t_t[hit_t], t_b[hit_b], rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("n_tris", [5, 100, 1500])
    def test_any_hit_matches(self, n_tris):
        v0, e1, e2 = make_tris(n_tris, seed=2 * n_tris + 1)
        tmin, tmax = lbvh.triangle_aabbs(v0, e1, e2)
        bvh = lbvh.build_bvh(tmin, tmax)
        orig, dir = make_rays(512, seed=5)
        t_max = jnp.full((512,), 2.5, jnp.float32)
        mask = jnp.ones((512,), bool)
        occ_b = np.asarray(
            brute_force_any(orig, dir, v0, e1, e2, t_min=1e-4, t_max=t_max)
        )
        occ_t = np.asarray(
            traverse_any(
                pack_bvh(bvh, v0, e1, e2), orig, dir,
                jnp.full((512,), 1e-4, jnp.float32), t_max, mask,
            )
        )
        np.testing.assert_array_equal(occ_b, occ_t)

    def test_masked_lanes_report_nothing(self):
        v0, e1, e2 = make_tris(64)
        tmin, tmax = lbvh.triangle_aabbs(v0, e1, e2)
        bvh = lbvh.build_bvh(tmin, tmax)
        orig, dir = make_rays(64)
        active = jnp.asarray(np.arange(64) % 2 == 0)
        t, tri, u, v = traverse_closest(
            pack_bvh(bvh, v0, e1, e2), orig, dir, jnp.zeros((64,), jnp.float32), active
        )
        tri = np.asarray(tri)
        assert (tri[1::2] == -1).all()

    def test_t_min_respected(self):
        """Continuation rays start at EPSILON: a triangle at t<EPSILON must
        be skipped."""
        v0 = jnp.asarray([[-1.0, -1.0, 0.0]], jnp.float32)
        e1 = jnp.asarray([[2.0, 0.0, 0.0]], jnp.float32)
        e2 = jnp.asarray([[0.0, 2.0, 0.0]], jnp.float32)
        tmin, tmax = lbvh.triangle_aabbs(v0, e1, e2)
        bvh = lbvh.build_bvh(tmin, tmax)
        orig = jnp.asarray([[0.0, 0.0, -1e-6]], jnp.float32)
        dir = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        t, tri, _, _ = traverse_closest(
            pack_bvh(bvh, v0, e1, e2), orig, dir, jnp.asarray([1e-4], jnp.float32),
            jnp.ones((1,), bool),
        )
        assert int(tri[0]) == -1
