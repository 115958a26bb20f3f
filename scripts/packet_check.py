"""Correctness + perf check of the Pallas packet traversal vs the XLA
lockstep oracle, on the real chip. Run: python scripts/packet_check.py [ntri]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from chameleonrt_tpu import native
from chameleonrt_tpu.ops.lbvh import PackedBvh
from chameleonrt_tpu.ops.traverse import (
    ray_sort_perm,
    traverse_closest_blocked,
    traverse_any_blocked,
)
from chameleonrt_tpu.ops.traverse_packet import (
    traverse_closest_packet,
    traverse_any_packet,
    packet_eligible,
)


def make_scene(n_tri, seed=0):
    rng = np.random.default_rng(seed)
    # clustered tris: structured-ish scene
    centers = rng.uniform(-10, 10, (n_tri, 3)).astype(np.float32)
    v0 = centers + rng.uniform(-0.3, 0.3, (n_tri, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (n_tri, 3)).astype(np.float32)
    return v0, e1, e2


def make_rays(n_rays, seed=1):
    rng = np.random.default_rng(seed)
    orig = rng.uniform(-12, 12, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(orig), jnp.asarray(d)


def main():
    n_tri = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    v0, e1, e2 = make_scene(n_tri)
    res = native.build_bvh_pair_native(v0, e1, e2, 4)
    assert res is not None, "native builder unavailable"
    nodes2, nodes4, leaf_rows, depth2, stack4 = res
    pbvh = PackedBvh(jnp.asarray(nodes2), jnp.asarray(leaf_rows), max_depth=depth2)
    print(f"tris={n_tri} nodes={nodes2.shape} leaves={leaf_rows.shape} depth={depth2} "
          f"eligible={packet_eligible(pbvh)}")

    orig, d = make_rays(n_rays)
    active = jnp.ones((n_rays,), bool).at[: n_rays // 50].set(False)
    t_min = jnp.full((n_rays,), 1e-4, jnp.float32)

    perm, _ = ray_sort_perm(orig, d, active)
    orig, d, active, t_min = orig[perm], d[perm], active[perm], t_min[perm]

    # ---- closest
    t0, p0, u0, v0_ = jax.jit(traverse_closest_blocked, static_argnames=())(
        pbvh, orig, d, t_min, active
    )
    t1, p1, u1, v1_ = traverse_closest_packet(pbvh, orig, d, t_min, active)
    t0, p0, u0, v0_ = map(np.asarray, (t0, p0, u0, v0_))
    t1, p1, u1, v1_ = map(np.asarray, (t1, p1, u1, v1_))
    prim_match = (p0 == p1).mean()
    # t compare on common hits
    hit = (p0 >= 0) & (p1 >= 0)
    dt = np.abs(t0[hit] - t1[hit]).max() if hit.any() else 0.0
    print(f"closest: prim match {prim_match*100:.3f}%  max|dt|={dt:.2e}  "
          f"hits xla={np.sum(p0>=0)} pallas={np.sum(p1>=0)}")
    if prim_match < 1.0:
        bad = np.nonzero(p0 != p1)[0][:10]
        for i in bad:
            print(f"  ray {i}: xla prim={p0[i]} t={t0[i]:.6f} | pallas prim={p1[i]} t={t1[i]:.6f}")

    # ---- any
    tmax = jnp.where(jnp.asarray(t0) < 1e30, jnp.asarray(t0) * 0.999, 30.0)
    o0 = np.asarray(jax.jit(traverse_any_blocked)(pbvh, orig, d, t_min, tmax, active))
    o1 = np.asarray(traverse_any_packet(pbvh, orig, d, t_min, tmax, active))
    print(f"any: match {(o0==o1).mean()*100:.3f}%  occ xla={o0.sum()} pallas={o1.sum()}")

    # ---- perf
    def bench(fn, *args, n=3):
        np.asarray(fn(*args)[0] if isinstance(fn(*args), tuple) else fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            out = out[0] if isinstance(out, tuple) else out
            np.asarray(out)
        return (time.perf_counter() - t0) / n

    jc = jax.jit(traverse_closest_blocked)
    ja = jax.jit(traverse_any_blocked)
    tc_x = bench(jc, pbvh, orig, d, t_min, active)
    tc_p = bench(traverse_closest_packet, pbvh, orig, d, t_min, active)
    ta_x = bench(ja, pbvh, orig, d, t_min, tmax, active)
    ta_p = bench(traverse_any_packet, pbvh, orig, d, t_min, tmax, active)
    print(f"closest: xla {tc_x*1e3:8.2f} ms   pallas {tc_p*1e3:8.2f} ms   ({tc_x/tc_p:.1f}x)")
    print(f"any:     xla {ta_x*1e3:8.2f} ms   pallas {ta_p*1e3:8.2f} ms   ({ta_x/ta_p:.1f}x)")
    print(f"pallas closest Mray/s: {n_rays/tc_p/1e6:.1f}  any: {n_rays/ta_p/1e6:.1f}")


if __name__ == "__main__":
    main()
