"""Pallas packet-traversal kernels vs the XLA lockstep oracle.

Runs the packet kernels in interpret mode (no TPU needed) on a small
clustered-soup scene and requires BIT-EXACT agreement of (t, prim, u, v)
and occlusion with the XLA traversal. On real TPU hardware the engine
switches to these kernels (engine/trace_bvh._packet_enabled); the same
comparison at bench scale is scripts/packet_hall.py (measured 100% match
at 224K tris / 921K rays)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chameleonrt_tpu import native
from chameleonrt_tpu.ops import traverse_packet as tp
from chameleonrt_tpu.ops.lbvh import PackedBvh
from chameleonrt_tpu.ops.traverse import (
    ray_sort_perm,
    traverse_any_blocked,
    traverse_closest_blocked,
)

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native builder unavailable"
)


@pytest.fixture(scope="module")
def scene_and_rays():
    rng = np.random.default_rng(0)
    # 4096 rays = 16 packets at p_sub=2: more packets than the suite's
    # K=8 slots (conftest), so the persistent kernels' swap path runs
    n_tri, n_rays = 3000, 4096
    centers = rng.uniform(-10, 10, (n_tri, 3)).astype(np.float32)
    v0 = centers + rng.uniform(-0.3, 0.3, (n_tri, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (n_tri, 3)).astype(np.float32)
    nodes2, _, leaf_rows, depth2, _ = native.build_bvh_pair_native(v0, e1, e2, 4)
    pbvh = PackedBvh(jnp.asarray(nodes2), jnp.asarray(leaf_rows), max_depth=depth2)

    orig = jnp.asarray(rng.uniform(-12, 12, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    active = jnp.ones((n_rays,), bool).at[:100].set(False)
    perm, _ = ray_sort_perm(orig, d, active)
    return pbvh, orig[perm], d[perm], active[perm]


def test_packet_closest_matches_xla(scene_and_rays):
    pbvh, orig, d, active = scene_and_rays
    t_min = jnp.full(orig.shape[:1], 1e-4, jnp.float32)
    t0, p0, u0, v0 = traverse_closest_blocked(pbvh, orig, d, t_min, active)
    t1, p1, u1, v1 = tp.traverse_closest_packet(
        pbvh, orig, d, t_min, active, interpret=True
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    # barycentrics agree to float associativity (different fusion order)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    assert int(np.asarray(p1 >= 0).sum()) > 0  # scene actually hit


def test_packet_any_matches_xla(scene_and_rays):
    pbvh, orig, d, active = scene_and_rays
    t_min = jnp.full(orig.shape[:1], 1e-4, jnp.float32)
    t0, p0, _, _ = traverse_closest_blocked(pbvh, orig, d, t_min, active)
    # t_max just beyond each hit: occluded exactly where closest-hit found one
    tmax = jnp.where(t0 < 1e19, t0 * 1.001, 30.0)
    o0 = traverse_any_blocked(pbvh, orig, d, t_min, tmax, active)
    o1 = tp.traverse_any_packet(pbvh, orig, d, t_min, tmax, active, interpret=True)
    assert np.array_equal(np.asarray(o0), np.asarray(o1))
    assert int(np.asarray(o1).sum()) > 0


def test_persistent_closest_matches_xla(scene_and_rays):
    pbvh, orig, d, active = scene_and_rays
    t_min = jnp.full(orig.shape[:1], 1e-4, jnp.float32)
    t0, p0, u0, v0 = traverse_closest_blocked(pbvh, orig, d, t_min, active)
    t1, p1, u1, v1 = tp.traverse_closest_persistent(
        pbvh, orig, d, t_min, active, interpret=True
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    assert int(np.asarray(p1 >= 0).sum()) > 0


def test_persistent_any_matches_xla(scene_and_rays):
    pbvh, orig, d, active = scene_and_rays
    t_min = jnp.full(orig.shape[:1], 1e-4, jnp.float32)
    t0, p0, _, _ = traverse_closest_blocked(pbvh, orig, d, t_min, active)
    tmax = jnp.where(t0 < 1e19, t0 * 1.001, 30.0)
    o0 = traverse_any_blocked(pbvh, orig, d, t_min, tmax, active)
    o1 = tp.traverse_any_persistent(
        pbvh, orig, d, t_min, tmax, active, interpret=True
    )
    assert np.array_equal(np.asarray(o0), np.asarray(o1))
    assert int(np.asarray(o1).sum()) > 0


def test_persistent_small_wavefront(scene_and_rays):
    # fewer packets than K slots: idle slots must not deadlock or corrupt
    pbvh, orig, d, active = scene_and_rays
    n = 300  # ~2.3 packets at p_sub=1? use p_sub default: 300 rays < 512
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t0, p0, _, _ = traverse_closest_blocked(
        pbvh, orig[:n], d[:n], t_min, active[:n]
    )
    t1, p1, _, _ = tp.traverse_closest_persistent(
        pbvh, orig[:n], d[:n], t_min, active[:n], interpret=True
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))


def test_packet_eligibility_gates():
    # uncertified depth -> not eligible
    nodes = jnp.zeros((4, 16), jnp.float32)
    leafs = jnp.zeros((5, 40), jnp.float32)
    assert not tp.packet_eligible(PackedBvh(nodes, leafs, max_depth=None))
    assert tp.packet_eligible(PackedBvh(nodes, leafs, max_depth=3))
    # single leaf -> not eligible
    assert not tp.packet_eligible(
        PackedBvh(jnp.zeros((1, 16)), jnp.zeros((1, 40)), max_depth=1)
    )


def test_vmem_footprint_is_lane_padded():
    """Eligibility must account for Mosaic's untiled-window lane padding
    (minor dim -> 128, sublanes -> 8). The values below are the exact
    allocations from the v5e compiler dump that rejected the San
    Miguel-class unified kernel (135 MiB scoped) after the unpadded
    estimate (77 MiB) had green-lit it."""
    from chameleonrt_tpu.ops.lbvh import UnifiedBvh

    leafs = np.zeros((122880, 40), np.float32)
    nodes = np.zeros((61440, 32), np.float32)
    assert tp._vmem_window_bytes(leafs) == 60 * 1024 * 1024
    assert tp._vmem_window_bytes(nodes) == 30 * 1024 * 1024

    ub = UnifiedBvh(
        jnp.asarray(nodes), jnp.asarray(leafs),
        n_tri_leaves=120355, tlas_lo=57424, stack_bound=48,
    )
    # tables + 921600 resident rays = ~140 MiB padded: NOT persistent-
    # eligible, but the DMA-streamed tier (tables stay in HBM) must accept
    # a UnifiedBvh (it has no num_leaves attribute — this crashed once)
    assert not tp.unified_persistent_eligible(ub, 921600)
    assert tp.persistent_stream_eligible(ub, 921600)


@pytest.fixture(scope="module")
def bvh4_and_rays(scene_and_rays):
    """The BVH4 slot of the same scene (native builder emits both layouts
    from one SAH tree; leaf rows are shared)."""
    rng = np.random.default_rng(0)
    n_tri = 3000
    centers = rng.uniform(-10, 10, (n_tri, 3)).astype(np.float32)
    v0 = centers + rng.uniform(-0.3, 0.3, (n_tri, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (n_tri, 3)).astype(np.float32)
    _, nodes4, leaf_rows, _, stack4 = native.build_bvh_pair_native(v0, e1, e2, 4)
    p4 = PackedBvh(jnp.asarray(nodes4), jnp.asarray(leaf_rows), max_depth=stack4)
    assert p4.arity == 4
    _, orig, d, active = scene_and_rays
    return p4, orig, d, active


def test_persistent_closest_bvh4_matches_xla(scene_and_rays, bvh4_and_rays):
    """Arity-4 persistent closest traversal must agree with the binary XLA
    oracle (same SAH tree collapsed; multi-push stacking + nearest-entry
    child selection are the BVH4-specific code paths)."""
    pbvh2, orig, d, active = scene_and_rays
    p4 = bvh4_and_rays[0]
    t_min = jnp.full(orig.shape[:1], 1e-4, jnp.float32)
    t0, p0, _, _ = traverse_closest_blocked(pbvh2, orig, d, t_min, active)
    t1, p1, _, _ = tp.traverse_closest_persistent(
        p4, orig, d, t_min, active, interpret=True
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    assert int(np.asarray(p1 >= 0).sum()) > 0


def test_persistent_any_bvh4_matches_xla(scene_and_rays, bvh4_and_rays):
    pbvh2, orig, d, active = scene_and_rays
    p4 = bvh4_and_rays[0]
    t_min = jnp.full(orig.shape[:1], 1e-4, jnp.float32)
    t0, _, _, _ = traverse_closest_blocked(pbvh2, orig, d, t_min, active)
    tmax = jnp.where(t0 < 1e19, t0 * 1.001, 30.0)
    o0 = traverse_any_blocked(p4, orig, d, t_min, tmax, active)
    o1 = tp.traverse_any_persistent(
        p4, orig, d, t_min, tmax, active, interpret=True
    )
    assert np.array_equal(np.asarray(o0), np.asarray(o1))
    assert int(np.asarray(o1).sum()) > 0


@pytest.mark.slow
def test_persistent_stream_matches_vmem(scene_and_rays):
    """The DMA-streamed table variant must agree bit-exactly with the
    VMEM-table variant (same kernel, tables fetched from HBM with padded
    128-wide rows)."""
    pbvh, orig, d, active = scene_and_rays
    # subset: the stream path changes the FETCH, not the scheduling; the
    # swap paths are covered by the full-wavefront tests above
    n = 1536
    orig, d, active = orig[:n], d[:n], active[:n]
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t0, p0, _, _ = tp.traverse_closest_persistent(
        pbvh, orig, d, t_min, active, interpret=True
    )
    t1, p1, _, _ = tp.traverse_closest_persistent(
        pbvh, orig, d, t_min, active, interpret=True, stream=True
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))


@pytest.mark.slow
def test_persistent_stream_pinned_top_matches_vmem(scene_and_rays):
    """The VMEM-pinned-top streamed variant (n_top rows of the BFS-ordered
    node table fetched from a VMEM prefix, deeper rows DMA'd) must agree
    bit-exactly with the VMEM-table variant, including n_top mid-table and
    n_top >= all rows (the whole node table pinned, leaves still
    streamed)."""
    pbvh, orig, d, active = scene_and_rays
    n = 1536  # fetch-path test; see test_persistent_stream_matches_vmem
    orig, d, active = orig[:n], d[:n], active[:n]
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t0, p0, _, _ = tp.traverse_closest_persistent(
        pbvh, orig, d, t_min, active, interpret=True
    )
    n_nodes = int(pbvh.nodes.shape[0])
    for n_top in (max(1, n_nodes // 3), n_nodes):
        t1, p1, _, _ = tp.traverse_closest_persistent(
            pbvh, orig, d, t_min, active, interpret=True, stream=True,
            n_top=n_top,
        )
        assert np.array_equal(np.asarray(p0), np.asarray(p1)), n_top
        assert np.array_equal(np.asarray(t0), np.asarray(t1)), n_top
    tmax = jnp.where(t0 < 1e19, t0 * 1.001, 30.0)
    o0 = tp.traverse_any_persistent(
        pbvh, orig, d, t_min, tmax, active, interpret=True
    )
    o1 = tp.traverse_any_persistent(
        pbvh, orig, d, t_min, tmax, active, interpret=True, stream=True,
        n_top=max(1, n_nodes // 3),
    )
    assert np.array_equal(np.asarray(o0), np.asarray(o1))
