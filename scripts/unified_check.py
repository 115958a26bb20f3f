"""Bench-scale compiled parity + perf of the UNIFIED persistent kernels vs
the XLA unified traversal, on the instanced bench scene's real wavefronts.

This is the machine check for the round-2 "compiled image diverges" gate:
the suspected mechanism (stale cached leaf rows surviving ray-space
changes) only triggers at >= LEAF_THRESH resident packets, i.e. >= 4096
rays — beyond what interpret-mode tests can afford. Run on the real chip:

    python -u scripts/unified_check.py [nx] [ny] [subdiv]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np


def main() -> int:
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    subdiv = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops.traverse import (
        traverse_any_unified_blocked,
        traverse_closest_unified_blocked,
    )
    from chameleonrt_tpu.ops.traverse_packet import (
        traverse_any_unified_persistent,
        traverse_closest_unified_persistent,
        unified_persistent_eligible,
    )
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    scene = load_scene(f"proc://instances?nx={nx}&ny={ny}&subdiv={subdiv}")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pair = flat.blas[0]
    ubvh_c = pair.closest
    ubvh_a = pair.any
    print(
        f"tris={scene.unique_tris()} inst={meta.num_instances} "
        f"nodes={ubvh_c.nodes.shape} leaves={ubvh_c.leaf_rows.shape} "
        f"stack={ubvh_c.stack_bound} eligible={unified_persistent_eligible(ubvh_c, W * H)}",
        flush=True,
    )

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    _, orig, dirs = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    R = orig.shape[0]
    t_min = jnp.zeros((R,), jnp.float32)
    active = jnp.ones((R,), bool)
    perm, _ = traverse.ray_sort_perm(orig, dirs, active)
    orig, dirs = orig[perm], dirs[perm]
    print(f"R={R} rays (sorted primary wavefront)", flush=True)

    xla_c = jax.jit(traverse_closest_unified_blocked)
    xla_a = jax.jit(traverse_any_unified_blocked)

    def compare(tag, o, dd, tn, act):
        t0, p0, i0, u0, v0 = map(
            np.asarray, xla_c(ubvh_c, o, dd, tn, act)
        )
        t1, p1, i1, u1, v1 = map(
            np.asarray,
            traverse_closest_unified_persistent(ubvh_c, o, dd, tn, act),
        )
        pm = (p0 == p1).mean()
        im = (i0 == i1).mean()
        hit = (p0 >= 0) & (p1 >= 0)
        dt = np.abs(t0[hit] - t1[hit]).max() if hit.any() else 0.0
        print(
            f"{tag} closest: prim match {pm*100:.4f}%  inst match {im*100:.4f}%  "
            f"max|dt|={dt:.2e}  hits xla={int((p0>=0).sum())} pallas={int((p1>=0).sum())}",
            flush=True,
        )
        benign = 0
        if pm < 1.0:
            inst_inv = np.asarray(flat.inst_inv)
            tv0 = np.asarray(flat.tri_v0)
            te1 = np.asarray(flat.tri_e1)
            te2 = np.asarray(flat.tri_e2)
            bad = np.nonzero(p0 != p1)[0][:8]
            for i in bad:
                print(
                    f"  ray {i}: xla prim={p0[i]} inst={i0[i]} t={t0[i]:.6f} | "
                    f"pallas prim={p1[i]} inst={i1[i]} t={t1[i]:.6f}"
                )
                # host-MT verify whichever side claims a hit: is it genuine?
                side_genuine = {}
                for side, pp, ii, tt in (
                    ("xla", p0[i], i0[i], t0[i]),
                    ("pallas", p1[i], i1[i], t1[i]),
                ):
                    if pp < 0:
                        continue
                    m = inst_inv[ii]
                    ow = np.asarray(o)[i]
                    dw = np.asarray(dd)[i]
                    oo = m[:3, :3] @ ow + m[:3, 3]
                    od = m[:3, :3] @ dw
                    v0t, e1t, e2t = tv0[pp], te1[pp], te2[pp]
                    pv = np.cross(od, e2t)
                    det = float(e1t @ pv)
                    if abs(det) < 1e-12:
                        print(f"    {side}: degenerate det={det}")
                        continue
                    tvec = oo - v0t
                    uu = float(tvec @ pv) / det
                    qv = np.cross(tvec, e1t)
                    vv = float(od @ qv) / det
                    th = float(e2t @ qv) / det
                    genuine = 0 <= uu and 0 <= vv and uu + vv <= 1 and th > 0
                    side_genuine[side] = genuine
                    print(
                        f"    {side} host-MT: u={uu:.5f} v={vv:.5f} t={th:.6f} "
                        f"genuine={genuine} (kernel t={tt:.6f})"
                    )
                    # benign class 1: the XLA oracle missed a hit the
                    # kernel found, and the hit is host-verified genuine
                    # (f32 borderline edge/t_min cases where pallas is the
                    # more correct side)
                    if side == "pallas" and p0[i] < 0 and genuine:
                        benign += 1
                # benign class 2: exact-t tie between two coincident
                # prims, both host-verified genuine — descent-order
                # dependent, either answer is correct
                if (
                    p0[i] >= 0
                    and p1[i] >= 0
                    and side_genuine.get("xla")
                    and side_genuine.get("pallas")
                    and abs(t0[i] - t1[i]) <= 1e-6 * max(1.0, abs(t0[i]))
                ):
                    benign += 1
        # shadow rays toward a fixed point above the grid (semi-coherent)
        hit_p = np.asarray(o) + t0[:, None] * np.asarray(dd)
        target = np.array([0.0, 14.0, 0.0], np.float32)
        sd = target - hit_p
        dist = np.linalg.norm(sd, axis=1, keepdims=True)
        sd = sd / np.maximum(dist, 1e-6)
        mask = jnp.asarray(p0 >= 0)
        so = jnp.asarray(hit_p)
        sdj = jnp.asarray(sd)
        stmax = jnp.asarray(dist[:, 0] * 0.999)
        stmin = jnp.full((R,), 1e-4, jnp.float32)
        o0 = np.asarray(xla_a(ubvh_a, so, sdj, stmin, stmax, mask))
        o1 = np.asarray(
            traverse_any_unified_persistent(ubvh_c, so, sdj, stmin, stmax, mask)
        )
        print(
            f"{tag} any: match {(o0==o1).mean()*100:.4f}%  occ xla={int(o0.sum())} "
            f"pallas={int(o1.sum())}",
            flush=True,
        )
        n_bad = int((p0 != p1).sum())
        ok = (n_bad == benign) and (o0 == o1).all()
        return ok, (o, dd, tn, act, so, sdj, stmin, stmax, mask)

    ok_b0, rays_b0 = compare("b0", orig, dirs, t_min, active)

    # bounce-1-like wavefront: cosine-hemisphere continuations from the b0
    # hits, re-sorted, ~30% dead lanes
    t0x, p0x, i0x, u0x, v0x = xla_c(ubvh_c, orig, dirs, t_min, active)
    hitm = np.asarray(p0x) >= 0
    hp = np.asarray(orig) + np.asarray(t0x)[:, None] * np.asarray(dirs)
    rngn = np.random.default_rng(7)
    zax = rngn.normal(size=(R, 3)).astype(np.float32)
    zax /= np.maximum(np.linalg.norm(zax, axis=1, keepdims=True), 1e-6)
    act1 = jnp.asarray(hitm & (rngn.uniform(size=R) > 0.3))
    o1r = jnp.asarray(hp)
    d1r = jnp.asarray(zax)
    tn1 = jnp.full((R,), 1e-4, jnp.float32)
    perm1, _ = traverse.ray_sort_perm(o1r, d1r, act1)
    o1r, d1r, act1 = o1r[perm1], d1r[perm1], act1[perm1]
    ok_b1, rays_b1 = compare("b1", o1r, d1r, tn1, act1)

    # ---- perf
    def bench(fn, *args, n=3):
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        np.asarray(first)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            first = out[0] if isinstance(out, tuple) else out
            np.asarray(first)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    o, dd, tn, act, so, sdj, stmin, stmax, mask = rays_b0
    tc_x = bench(xla_c, ubvh_c, o, dd, tn, act)
    tc_p = bench(traverse_closest_unified_persistent, ubvh_c, o, dd, tn, act)
    ta_x = bench(xla_a, ubvh_a, so, sdj, stmin, stmax, mask)
    ta_p = bench(traverse_any_unified_persistent, ubvh_c, so, sdj, stmin, stmax, mask)
    print(f"b0 closest: xla {tc_x*1e3:8.2f} ms   pallas {tc_p*1e3:8.2f} ms  ({tc_x/tc_p:.2f}x)")
    print(f"b0 any:     xla {ta_x*1e3:8.2f} ms   pallas {ta_p*1e3:8.2f} ms  ({ta_x/ta_p:.2f}x)")
    o, dd, tn, act = rays_b1[:4]
    tc_x1 = bench(xla_c, ubvh_c, o, dd, tn, act)
    tc_p1 = bench(traverse_closest_unified_persistent, ubvh_c, o, dd, tn, act)
    print(f"b1 closest: xla {tc_x1*1e3:8.2f} ms   pallas {tc_p1*1e3:8.2f} ms  ({tc_x1/tc_p1:.2f}x)")

    print(f"PARITY: b0={'OK' if ok_b0 else 'FAIL'} b1={'OK' if ok_b1 else 'FAIL'}")
    return 0 if (ok_b0 and ok_b1) else 1


if __name__ == "__main__":
    sys.exit(main())
