"""Slot-lane vs work-queue persistent kernels on the hall bench wavefronts
(coherent primaries + incoherent cosine bounces), real chip.

Usage: python -u scripts/slotlane_ab.py [subdiv] [S ...]
Prints per-kernel ms (net of the tunnel readback floor), Mray/s, prim
parity vs the persistent kernel, and iteration counts.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    s_list = [int(a) for a in sys.argv[2:]] or [256, 512]

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.ops import traverse_slotlane as tsl
    from chameleonrt_tpu.ops.math import ortho_basis
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    scene = load_scene(f"proc://hall?subdiv={subdiv}")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pair = flat.blas[0]
    pbvh = pair.closest
    print(f"tris={scene.unique_tris()} nodes={pbvh.nodes.shape} "
          f"depth={pbvh.max_depth}", flush=True)

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

    def bench(fn, *args, n=4, **kw):
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

    def report(tag, fn, ref_prim, *args, **kw):
        ms, out = bench(fn, *args, **kw)
        net = max(ms - ms_rb, 1e-3)
        extra = ""
        if ref_prim is not None:
            match = float(np.asarray(out[1] == ref_prim).mean())
            extra = f" prim-match {match*100:.3f}%"
        print(f"{tag:28s} {net:8.1f} ms  {R/net/1e3:6.2f} Mray/s{extra}",
              flush=True)
        return out

    # --- coherent primaries, closest
    print("--- b0 closest (coherent primaries)", flush=True)
    outp = report("persistent", tp.traverse_closest_persistent, None,
                  pbvh, orig, dirs, t_min, active)
    ref = np.asarray(outp[1])
    for S in s_list:
        report(f"slotlane S={S}", tsl.traverse_closest_slotlane, ref,
               pbvh, orig, dirs, t_min, active, S=S)

    # --- incoherent bounce, closest
    rng = np.random.default_rng(3)
    t_hit, prim = outp[0], outp[1]
    hp = orig + jnp.where(prim[:, None] >= 0, t_hit[:, None] * 0.999, 1.0) * dirs
    u1 = jnp.asarray(rng.uniform(size=(R,)).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=(R,)).astype(np.float32))
    rad = jnp.sqrt(u1)
    phi = 2.0 * np.pi * u2
    nrm = -dirs
    vx, vy = ortho_basis(nrm)
    bd = (
        vx * (rad * jnp.cos(phi))[:, None]
        + vy * (rad * jnp.sin(phi))[:, None]
        + nrm * jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))[:, None]
    )
    bd = bd / jnp.linalg.norm(bd, axis=1, keepdims=True)
    mask = prim >= 0
    sperm, _ = traverse.ray_sort_perm(hp, bd, mask)
    hp_s, bd_s, mask_s = hp[sperm], bd[sperm], mask[sperm]
    tmin2 = jnp.full((R,), 1e-4, jnp.float32)
    print(f"--- b1 closest (incoherent bounce, {int(np.asarray(mask).sum())} "
          "active)", flush=True)
    outb = report("persistent", tp.traverse_closest_persistent, None,
                  pbvh, hp_s, bd_s, tmin2, mask_s)
    refb = np.asarray(outb[1])
    for S in s_list:
        report(f"slotlane S={S}", tsl.traverse_closest_slotlane, refb,
               pbvh, hp_s, bd_s, tmin2, mask_s, S=S)

    # --- shadow any-hit (semi-coherent), BVH4 table
    lp = jnp.asarray([0.0, float(np.asarray(hp[:, 1]).max() + 1.0), 0.0],
                     jnp.float32)
    sd = lp[None, :] - hp
    dist = jnp.linalg.norm(sd, axis=1)
    sd = sd / dist[:, None]
    sperm2, _ = traverse.ray_sort_perm(hp, sd, mask)
    hp2, sd2, dist2, mask2 = hp[sperm2], sd[sperm2], dist[sperm2], mask[sperm2]
    print("--- shadow any (semi-coherent, BVH4)", flush=True)
    ms, occ0 = bench(tp.traverse_any_persistent, pair.any, hp2, sd2,
                     tmin2, dist2, mask2)
    print(f"{'persistent':28s} {max(ms-ms_rb,1e-3):8.1f} ms  "
          f"{R/max(ms-ms_rb,1e-3)/1e3:6.2f} Mray/s", flush=True)
    for S in s_list:
        ms, occ1 = bench(tsl.traverse_any_slotlane, pair.any, hp2, sd2,
                         tmin2, dist2, mask2, S=S)
        match = float(np.asarray(occ0 == occ1).mean())
        print(f"{f'slotlane S={S}':28s} {max(ms-ms_rb,1e-3):8.1f} ms  "
              f"{R/max(ms-ms_rb,1e-3)/1e3:6.2f} Mray/s  match {match*100:.3f}%",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
