"""Slot-lane traversal kernels vs the XLA lockstep oracle.

Interpret mode (no TPU needed); bit-exact agreement on (t, prim) and
occlusion is required, as for the work-queue kernels
(tests/test_traverse_packet.py). Production shapes (K=128 lanes, S=256)
are machine-checked at bench scale on the real chip by bench.py's parity
gate; the suite uses K=8 / S=16 so the unrolled fetch loops stay small in
interpret mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from chameleonrt_tpu import native
from chameleonrt_tpu.ops import traverse_slotlane as tsl
from chameleonrt_tpu.ops.lbvh import PackedBvh
from chameleonrt_tpu.ops.traverse import (
    ray_sort_perm,
    traverse_any_blocked,
    traverse_closest_blocked,
)

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native builder unavailable"
)

S, KK = 16, 8  # suite shapes (production: S=256, K=128)


@pytest.fixture(scope="module")
def scene_and_rays():
    rng = np.random.default_rng(7)
    # 2048 rays = 128 S=16 packets = 16 groups at K=8: the grid pipeline
    # crosses many group boundaries
    n_tri, n_rays = 3000, 2048
    centers = rng.uniform(-10, 10, (n_tri, 3)).astype(np.float32)
    v0 = centers + rng.uniform(-0.3, 0.3, (n_tri, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (n_tri, 3)).astype(np.float32)
    nodes2, nodes4, leaf_rows, depth2, depth4 = native.build_bvh_pair_native(
        v0, e1, e2, 4
    )
    pbvh2 = PackedBvh(jnp.asarray(nodes2), jnp.asarray(leaf_rows), max_depth=depth2)
    pbvh4 = PackedBvh(jnp.asarray(nodes4), jnp.asarray(leaf_rows), max_depth=depth4)

    orig = jnp.asarray(rng.uniform(-12, 12, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    active = jnp.ones((n_rays,), bool).at[:60].set(False)
    perm, _ = ray_sort_perm(orig, d, active)
    return pbvh2, pbvh4, orig[perm], d[perm], active[perm]


def test_slotlane_closest_matches_xla(scene_and_rays):
    pbvh2, _, orig, d, active = scene_and_rays
    t_min = jnp.full(orig.shape[:1], 1e-4, jnp.float32)
    t0, p0, u0, v0 = traverse_closest_blocked(pbvh2, orig, d, t_min, active)
    t1, p1, u1, v1 = tsl.traverse_closest_slotlane(
        pbvh2, orig, d, t_min, active, interpret=True, S=S, k_slots=KK
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    assert int(np.asarray(p1 >= 0).sum()) > 0


def test_slotlane_any_matches_xla(scene_and_rays):
    pbvh2, pbvh4, orig, d, active = scene_and_rays
    t_min = jnp.full(orig.shape[:1], 1e-4, jnp.float32)
    t0, _, _, _ = traverse_closest_blocked(pbvh2, orig, d, t_min, active)
    tmax = jnp.where(t0 < 1e19, t0 * 1.001, 30.0)
    for pb in (pbvh2, pbvh4):  # binary and BVH4 (the any-hit slot) layouts
        o0 = traverse_any_blocked(pb, orig, d, t_min, tmax, active)
        o1 = tsl.traverse_any_slotlane(
            pb, orig, d, t_min, tmax, active, interpret=True, S=S, k_slots=KK
        )
        assert np.array_equal(np.asarray(o0), np.asarray(o1))
        assert int(np.asarray(o1).sum()) > 0


def test_slotlane_closest_bvh4(scene_and_rays):
    _, pbvh4, orig, d, active = scene_and_rays
    n = 512
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t0, p0, _, _ = traverse_closest_blocked(
        pbvh4, orig[:n], d[:n], t_min, active[:n]
    )
    t1, p1, _, _ = tsl.traverse_closest_slotlane(
        pbvh4, orig[:n], d[:n], t_min, active[:n],
        interpret=True, S=S, k_slots=KK,
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))


def test_slotlane_small_wavefront(scene_and_rays):
    # fewer packets than one group: padded slots must retire cleanly
    pbvh2, _, orig, d, active = scene_and_rays
    n = 50  # 4 packets of S=16 < K=8 slots
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t0, p0, _, _ = traverse_closest_blocked(
        pbvh2, orig[:n], d[:n], t_min, active[:n]
    )
    t1, p1, _, _ = tsl.traverse_closest_slotlane(
        pbvh2, orig[:n], d[:n], t_min, active[:n],
        interpret=True, S=S, k_slots=KK,
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))


def test_slotlane_tmax_prefilter(scene_and_rays):
    # closest with a t_max cap (multi-BLAS flat path passes best.t)
    pbvh2, _, orig, d, active = scene_and_rays
    n = 256
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t0, p0, _, _ = traverse_closest_blocked(
        pbvh2, orig[:n], d[:n], t_min, active[:n]
    )
    cap = jnp.where(t0 < 1e19, t0 * 0.5, 8.0)  # exclude every found hit
    t1, p1, _, _ = tsl.traverse_closest_slotlane(
        pbvh2, orig[:n], d[:n], t_min, active[:n], t_max=cap,
        interpret=True, S=S, k_slots=KK,
    )
    p1 = np.asarray(p1)
    t1 = np.asarray(t1)
    t0 = np.asarray(t0)
    found = p1 >= 0
    # any hit the capped run reports must beat the cap (and the oracle t)
    assert (t1[found] <= np.asarray(cap)[found]).all()


def test_slotlane_eligibility():
    nodes = jnp.zeros((64, 16), jnp.float32)
    leafs = jnp.zeros((64, 40), jnp.float32)
    ok = PackedBvh(nodes, leafs, max_depth=8)
    assert tsl.slotlane_eligible(ok, 4096)
    uncert = PackedBvh(nodes, leafs, max_depth=None)
    assert not tsl.slotlane_eligible(uncert, 4096)


def test_slotlane_unified_matches_blocked():
    """The unified slot-lane kernels (interpret mode) must agree
    bit-exactly with the XLA unified traversal on (t, prim, inst) and
    occlusion — dense entry transform, inline world-ray restore, and
    lane-masked leaf commits."""
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops.lbvh import UnifiedPair
    from chameleonrt_tpu.ops.traverse import (
        traverse_any_unified_blocked,
        traverse_closest_unified_blocked,
    )
    from test_unified_tlas import _scene

    scene = _scene()
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    assert isinstance(flat.blas[0], UnifiedPair)
    ubvh = flat.blas[0].closest

    r = np.random.default_rng(11)
    R = 2048  # 128 S=16 packets = 16 groups at K=8
    orig = jnp.asarray(r.uniform(-5, 5, (R, 3)).astype(np.float32))
    d = r.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    active = jnp.ones((R,), bool).at[:50].set(False)
    t_min = jnp.zeros((R,), jnp.float32)

    t0, p0, i0, u0, v0 = traverse_closest_unified_blocked(
        ubvh, orig, d, t_min, active
    )
    t1, p1, i1, u1, v1 = tsl.traverse_closest_unified_slotlane(
        ubvh, orig, d, t_min, active, interpret=True, S=S, k_slots=KK
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    assert int(np.asarray(p1 >= 0).sum()) > 0

    tmax = jnp.where(t0 < 1e19, t0 * 1.001, 20.0)
    o0 = traverse_any_unified_blocked(ubvh, orig, d, t_min, tmax, active)
    o1 = tsl.traverse_any_unified_slotlane(
        ubvh, orig, d, t_min, tmax, active, interpret=True, S=S, k_slots=KK
    )
    assert np.array_equal(np.asarray(o0), np.asarray(o1))
    assert int(np.asarray(o1).sum()) > 0


def test_slotlane_no_leafq_matches_xla(scene_and_rays):
    # phase-alternation mode (leafq=0) must also match bit-exactly
    pbvh2, _, orig, d, active = scene_and_rays
    n = 512
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t0, p0, _, _ = traverse_closest_blocked(
        pbvh2, orig[:n], d[:n], t_min, active[:n]
    )
    t1, p1, _, _ = tsl.traverse_closest_slotlane(
        pbvh2, orig[:n], d[:n], t_min, active[:n],
        interpret=True, S=S, k_slots=KK, leafq=0,
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))


def test_slotlane_stream_matches_vmem(scene_and_rays):
    # HBM-table (per-slot row DMA) variant must match the VMEM variant
    pbvh2, _, orig, d, active = scene_and_rays
    n = 512
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t0, p0, _, _ = tsl.traverse_closest_slotlane(
        pbvh2, orig[:n], d[:n], t_min, active[:n],
        interpret=True, S=S, k_slots=KK,
    )
    t1, p1, _, _ = tsl.traverse_closest_slotlane(
        pbvh2, orig[:n], d[:n], t_min, active[:n],
        interpret=True, S=S, k_slots=KK, stream=True,
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    tmax = jnp.where(t0 < 1e19, t0 * 1.001, 30.0)
    o0 = tsl.traverse_any_slotlane(
        pbvh2, orig[:n], d[:n], t_min, tmax, active[:n] & (np.asarray(p0) >= 0),
        interpret=True, S=S, k_slots=KK,
    )
    o1 = tsl.traverse_any_slotlane(
        pbvh2, orig[:n], d[:n], t_min, tmax, active[:n] & (np.asarray(p0) >= 0),
        interpret=True, S=S, k_slots=KK, stream=True,
    )
    assert np.array_equal(np.asarray(o0), np.asarray(o1))


def test_slotlane_unified_stream_matches_vmem():
    # unified HBM-table variant vs the unified VMEM variant
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops.lbvh import UnifiedPair
    from test_unified_tlas import _scene

    scene = _scene()
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    assert isinstance(flat.blas[0], UnifiedPair)
    ubvh = flat.blas[0].closest

    r = np.random.default_rng(13)
    R = 768
    orig = jnp.asarray(r.uniform(-5, 5, (R, 3)).astype(np.float32))
    d = r.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    active = jnp.ones((R,), bool)
    t_min = jnp.zeros((R,), jnp.float32)

    t0, p0, i0, _, _ = tsl.traverse_closest_unified_slotlane(
        ubvh, orig, d, t_min, active, interpret=True, S=S, k_slots=KK
    )
    t1, p1, i1, _, _ = tsl.traverse_closest_unified_slotlane(
        ubvh, orig, d, t_min, active, interpret=True, S=S, k_slots=KK,
        stream=True,
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
