"""Persistent work-queue packet kernels vs the grid packet kernels on the
hall bench workload: coherent b0, incoherent b1, semi-coherent shadow.

Usage: python -u scripts/persistent_probe.py [subdiv] [p_sub ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np


def main() -> int:
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    p_subs = [int(a) for a in sys.argv[2:]] or [2]

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.ops.math import ortho_basis
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    scene = load_scene(f"proc://hall?subdiv={subdiv}")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pair = flat.blas[0]
    pbvh = pair.closest
    print(f"tris={scene.unique_tris()} nodes={pbvh.nodes.shape} depth={pbvh.max_depth}", flush=True)

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

    # incoherent bounce directions (cosine hemisphere around -dir)
    rng = np.random.default_rng(3)
    u1 = jnp.asarray(rng.uniform(size=(R,)).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=(R,)).astype(np.float32))

    for ps in p_subs:
        ms_g0, outg = bench(tp.traverse_closest_packet, pbvh, orig, dirs, t_min, active, p_sub=ps)
        ms_p0, outp = bench(tp.traverse_closest_persistent, pbvh, orig, dirs, t_min, active, p_sub=ps)
        m0 = float(np.asarray(outg[1] == outp[1]).mean())

        t_hit, prim = outg[0], outg[1]
        hp = orig + jnp.where(prim[:, None] >= 0, t_hit[:, None] * 0.999, 1.0) * dirs
        rad = jnp.sqrt(u1)
        phi = 2.0 * np.pi * u2
        n = -dirs
        vx, vy = ortho_basis(n)
        bd = (
            vx * (rad * jnp.cos(phi))[:, None]
            + vy * (rad * jnp.sin(phi))[:, None]
            + n * jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))[:, None]
        )
        bd = bd / jnp.linalg.norm(bd, axis=1, keepdims=True)
        mask = prim >= 0
        sperm, _ = traverse.ray_sort_perm(hp, bd, mask)
        hp_s, bd_s, mask_s = hp[sperm], bd[sperm], mask[sperm]
        tmin2 = jnp.full((R,), 1e-4, jnp.float32)

        ms_g1, outg1 = bench(tp.traverse_closest_packet, pbvh, hp_s, bd_s, tmin2, mask_s, p_sub=ps)
        ms_p1, outp1 = bench(tp.traverse_closest_persistent, pbvh, hp_s, bd_s, tmin2, mask_s, p_sub=ps)
        m1 = float(np.asarray(outg1[1] == outp1[1]).mean())

        # shadow: from b0 hit points toward light
        lp = jnp.asarray([0.0, float(np.asarray(hp[:, 1]).max() + 1.0), 0.0], jnp.float32)
        sd = lp[None, :] - hp
        dist = jnp.linalg.norm(sd, axis=1)
        sd = sd / dist[:, None]
        sperm2, _ = traverse.ray_sort_perm(hp, sd, mask)
        ms_ga, occg = bench(tp.traverse_any_packet, pbvh, hp[sperm2], sd[sperm2], tmin2, dist[sperm2], mask[sperm2], p_sub=ps)
        ms_pa, occp = bench(tp.traverse_any_persistent, pbvh, hp[sperm2], sd[sperm2], tmin2, dist[sperm2], mask[sperm2], p_sub=ps)
        ma = float(np.asarray(occg == occp).mean())

        print(
            f"p_sub={ps}: b0 grid {ms_g0-ms_rb:7.1f} | pers {ms_p0-ms_rb:7.1f} ms (match {m0*100:.2f}%)\n"
            f"          b1 grid {ms_g1-ms_rb:7.1f} | pers {ms_p1-ms_rb:7.1f} ms (match {m1*100:.2f}%)\n"
            f"          sh grid {ms_ga-ms_rb:7.1f} | pers {ms_pa-ms_rb:7.1f} ms (match {ma*100:.2f}%)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
