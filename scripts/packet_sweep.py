"""Sweep packet height (p_sub) x BVH leaf size on the hall workload for
coherent (b0) and incoherent (b1) closest passes + semi-coherent shadow.

Usage: python -u scripts/packet_sweep.py [p_sub ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np


def main() -> int:
    p_subs = [int(a) for a in sys.argv[1:]] or [8, 4, 2]

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu import native
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.ops.lbvh import PackedBvh
    from chameleonrt_tpu.ops.math import ortho_basis
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    scene = load_scene("proc://hall?subdiv=4")
    flat, meta, host = build_device_scene(scene, want_host=True)
    v0, e1, e2 = host[:3]

    bvhs = {}
    for L in (4, 2):
        nodes2, _, leaf_rows, depth2, _ = native.build_bvh_pair_native(v0, e1, e2, L)
        bvhs[L] = PackedBvh(jnp.asarray(nodes2), jnp.asarray(leaf_rows), max_depth=depth2)
        print(f"L={L}: nodes {nodes2.shape} leafs {leaf_rows.shape} depth {depth2}", flush=True)

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    _, orig, dirs = camera_ops.generate_primary_rays(view, px, py, float(W), float(H), state)
    R = orig.shape[0]
    t_min = jnp.zeros((R,), jnp.float32)
    active = jnp.ones((R,), bool)
    perm, _ = traverse.ray_sort_perm(orig, dirs, active)
    orig, dirs = orig[perm], dirs[perm]

    def bench(fn, *args, n=3, **kw):
        out = fn(*args, **kw)
        first = out[0] if isinstance(out, tuple) else out
        np.asarray(first)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args, **kw)
            first = out[0] if isinstance(out, tuple) else out
            np.asarray(first)
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3, out

    ms_rb, _ = bench(lambda x: x + 1.0, jnp.zeros((R,), jnp.float32))
    print(f"readback floor {ms_rb:.1f} ms", flush=True)

    # prepare incoherent bounce inputs once (L=4 hits)
    ref = bvhs[4]
    t, p, _, _ = tp.traverse_closest_packet(ref, orig, dirs, t_min, active)
    rngnp = np.random.default_rng(3)
    hp = orig + jnp.where(p[:, None] >= 0, t[:, None] * 0.999, 1.0) * dirs
    n = -dirs
    vx, vy = ortho_basis(n)
    u1 = jnp.asarray(rngnp.uniform(size=(R,)).astype(np.float32))
    u2 = jnp.asarray(rngnp.uniform(size=(R,)).astype(np.float32))
    rad = jnp.sqrt(u1)
    phi = 2 * np.pi * u2
    bd = (
        vx * (rad * jnp.cos(phi))[:, None]
        + vy * (rad * jnp.sin(phi))[:, None]
        + n * jnp.sqrt(jnp.maximum(1 - u1, 0))[:, None]
    )
    bd = bd / jnp.linalg.norm(bd, axis=1, keepdims=True)
    mask = p >= 0
    sperm, _ = traverse.ray_sort_perm(hp, bd, mask)
    hp_s, bd_s, mask_s = hp[sperm], bd[sperm], mask[sperm]

    lp = jnp.asarray([0.0, float(np.asarray(hp[:, 1]).max() + 1.0), 0.0], jnp.float32)
    sd = lp[None, :] - hp
    dist = jnp.linalg.norm(sd, axis=1)
    sd = sd / dist[:, None]
    sperm2, _ = traverse.ray_sort_perm(hp, sd, mask)

    base_p = np.asarray(p)
    for L in (4, 2):
        pb = bvhs[L]
        for ps in p_subs:
            ms0, out0 = bench(tp.traverse_closest_packet, pb, orig, dirs, t_min, active, p_sub=ps)
            ok = float(np.asarray(out0[1] == jnp.asarray(base_p)).mean())
            it0 = int(np.asarray(tp.traverse_closest_packet(pb, orig, dirs, t_min, active, p_sub=ps, return_iters=True)).sum())
            ms1, _ = bench(tp.traverse_closest_packet, pb, hp_s, bd_s, t_min + 1e-4, mask_s, p_sub=ps)
            it1 = int(np.asarray(tp.traverse_closest_packet(pb, hp_s, bd_s, t_min + 1e-4, mask_s, p_sub=ps, return_iters=True)).sum())
            ms2, _ = bench(tp.traverse_any_packet, pb, hp[sperm2], sd[sperm2], t_min + 1e-4, dist[sperm2], mask[sperm2], p_sub=ps)
            print(
                f"L={L} p_sub={ps}: b0 {ms0-ms_rb:7.1f} ms ({it0:6d} it)  "
                f"b1 {ms1-ms_rb:7.1f} ms ({it1:6d} it)  "
                f"shadow {ms2-ms_rb:7.1f} ms  match={ok*100:.2f}%",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
