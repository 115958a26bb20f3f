"""Unified two-level (TLAS+BLAS) traversal vs the brute-force oracle.

The instanced cross-backend image test covers one shared mesh; this one
stresses the table REBASING: several distinct meshes (different node/leaf
table sizes), instances with rotation + non-uniform scale + translation,
closest-hit and occlusion. Role parity: every reference backend's
TopLevelBVH (backends/embree/embree_utils.cpp:121-136)."""

import numpy as np
import pytest

from chameleonrt_tpu import native
from chameleonrt_tpu.scene.types import (
    Camera,
    DisneyMaterial,
    Geometry,
    Instance,
    Mesh,
    ParameterizedMesh,
    Scene,
    default_obj_light,
)

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


def _rand_mesh(n_tris, seed, scale=1.0):
    r = np.random.default_rng(seed)
    v = r.uniform(-scale, scale, (n_tris * 3, 3)).astype(np.float32)
    idx = np.arange(n_tris * 3, dtype=np.uint32).reshape(-1, 3)
    return Mesh(geometries=[Geometry(vertices=v, indices=idx)])


def _scene():
    scene = Scene()
    scene.materials = [DisneyMaterial()]
    scene.meshes = [
        _rand_mesh(40, 0),
        _rand_mesh(333, 1, scale=0.6),
        _rand_mesh(7, 2, scale=1.4),
    ]
    scene.parameterized_meshes = [
        ParameterizedMesh(0, [0]),
        ParameterizedMesh(1, [0]),
        ParameterizedMesh(2, [0]),
    ]
    r = np.random.default_rng(3)
    for i in range(5):
        t = np.eye(4, dtype=np.float32)
        ang = r.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        sc = np.diag(r.uniform(0.5, 1.8, 3).astype(np.float32))
        t[:3, :3] = rot @ sc
        t[:3, 3] = r.uniform(-3, 3, 3)
        scene.instances.append(Instance(t, i % 3))
    scene.lights = [default_obj_light()]
    scene.cameras = [
        Camera(
            position=np.array([0, 0, 9], np.float32),
            center=np.zeros(3, np.float32),
            up=np.array([0, 1, 0], np.float32),
            fov_y=55.0,
        )
    ]
    return scene


def test_unified_matches_brute_force():
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set, make_trace_fns
    from chameleonrt_tpu.ops.intersect import T_MAX, brute_force_closest
    from chameleonrt_tpu.ops.lbvh import UnifiedPair
    from chameleonrt_tpu.ops.math import transform_point, transform_vector

    scene = _scene()
    flat, meta = build_device_scene(scene)
    flat = flat._replace(blas=build_blas_set(flat, meta))
    assert isinstance(flat.blas[0], UnifiedPair), "expected the unified TLAS path"
    tc, ta = make_trace_fns(meta)

    r = np.random.default_rng(7)
    R = 600
    orig = jnp.asarray(r.uniform(-5, 5, (R, 3)).astype(np.float32))
    d = r.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    active = jnp.ones((R,), bool)

    hit = tc(flat, orig, d, 0.0, active)

    # oracle: per-instance brute force in object space, min over instances
    bt = np.full((R,), float(T_MAX), np.float32)
    bhit = np.zeros((R,), bool)
    for inst_id, mesh_id in enumerate(meta.inst_mesh):
        start, count = meta.mesh_tri_ranges[mesh_id]
        inv = flat.inst_inv[inst_id]
        o = transform_point(inv[None], orig)
        dd = transform_vector(inv[None], d)
        t, tri, _, _ = brute_force_closest(
            o, dd,
            flat.tri_v0[start : start + count],
            flat.tri_e1[start : start + count],
            flat.tri_e2[start : start + count],
        )
        t = np.asarray(t)
        got = np.asarray(tri) >= 0
        better = got & (t < bt)
        bt = np.where(better, t, bt)
        bhit |= got

    np.testing.assert_array_equal(np.asarray(hit.hit), bhit)
    np.testing.assert_allclose(
        np.asarray(hit.t)[bhit], bt[bhit], rtol=1e-4, atol=1e-5
    )
    # instance attribution: the reported instance's own brute force must
    # reproduce the winning t
    inst_ids = np.asarray(hit.inst)
    assert (inst_ids[bhit] >= 0).all()

    # occlusion vs oracle-derived expectation
    t_max = jnp.full((R,), 2.5, jnp.float32)
    occ = np.asarray(ta(flat, orig, d, t_max, active))
    expected = bhit & (bt > 0) & (bt < 2.5)
    # any-hit uses t_min=EPSILON; near-zero oracle hits can legitimately
    # differ, so compare only clear cases
    clear = ~np.isclose(bt, 2.5, atol=1e-3) & (bt > 1e-3)
    np.testing.assert_array_equal(occ[clear], expected[clear])


@pytest.mark.slow
def test_unified_persistent_matches_blocked():
    """The persistent unified packet kernels (interpret mode) must agree
    bit-exactly with the XLA unified traversal on (t, prim, inst) and
    occlusion (entry transform-and-jump, world-ray restore, poisoned
    entry prim slots)."""
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.ops.lbvh import UnifiedPair
    from chameleonrt_tpu.ops.traverse import (
        traverse_any_unified_blocked,
        traverse_closest_unified_blocked,
    )

    scene = _scene()
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    assert isinstance(flat.blas[0], UnifiedPair)
    ubvh = flat.blas[0].closest

    r = np.random.default_rng(11)
    # 10 packets vs the suite's 8 slots: swap + entry + restore paths all
    # run (the round-2 stale-leaf-row divergence lived exactly there)
    R = 2560
    orig = jnp.asarray(r.uniform(-5, 5, (R, 3)).astype(np.float32))
    d = r.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    active = jnp.ones((R,), bool).at[:50].set(False)
    t_min = jnp.zeros((R,), jnp.float32)

    t0, p0, i0, u0, v0 = traverse_closest_unified_blocked(
        ubvh, orig, d, t_min, active
    )
    t1, p1, i1, u1, v1 = tp.traverse_closest_unified_persistent(
        ubvh, orig, d, t_min, active, interpret=True
    )
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    assert int(np.asarray(p1 >= 0).sum()) > 0

    tmax = jnp.where(t0 < 1e19, t0 * 1.001, 20.0)
    o0 = traverse_any_unified_blocked(ubvh, orig, d, t_min, tmax, active)
    o1 = tp.traverse_any_unified_persistent(
        ubvh, orig, d, t_min, tmax, active, interpret=True
    )
    assert np.array_equal(np.asarray(o0), np.asarray(o1))
    assert int(np.asarray(o1).sum()) > 0
