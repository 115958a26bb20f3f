"""Packet-kernel vs XLA traversal on the real hall bench workload:
primary rays + shadow rays at 1280x720, 224K tris. Timing uses forced host
readback (block_until_ready does NOT synchronize through the axon tunnel —
measured); the fixed ~28 ms tunnel readback cost is reported separately.

Usage: python -u scripts/packet_hall.py [subdiv]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np


def main() -> int:
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.perf_counter()
    scene = load_scene(f"proc://hall?subdiv={subdiv}")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    print(f"scene build {time.perf_counter()-t0:.1f}s tris={scene.unique_tris()}", flush=True)
    pair = flat.blas[0]
    pbvh = pair.closest
    print(f"nodes {pbvh.nodes.shape} leaf_rows {pbvh.leaf_rows.shape} "
          f"depth {pbvh.max_depth} eligible {tp.packet_eligible(pbvh)}", flush=True)

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    pixel_id = (px + py * W).astype(jnp.uint32)
    state = rng_ops.get_rng(pixel_id, np.uint32(1))
    _, orig, dirs = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    R = orig.shape[0]
    t_min = jnp.zeros((R,), jnp.float32)
    active = jnp.ones((R,), bool)

    # sort (as the engine does)
    perm, _ = traverse.ray_sort_perm(orig, dirs, active)
    orig, dirs = orig[perm], dirs[perm]
    orig, dirs = np.asarray(orig), np.asarray(dirs)
    orig, dirs = jnp.asarray(orig), jnp.asarray(dirs)

    def bench(fn, *args, n=4):
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
        return min(ts) * 1e3, out

    # readback-only floor
    ms_rb, _ = bench(lambda x: x + 1.0, jnp.zeros((R,), jnp.float32))
    print(f"readback floor: {ms_rb:.1f} ms", flush=True)

    xla_closest = jax.jit(lambda o, dd, tn, a: traverse.traverse_closest_blocked(pbvh, o, dd, tn, a))
    ms_xc, out = bench(xla_closest, orig, dirs, t_min, active)
    hits = int(np.asarray(out[1] >= 0).sum())

    ms_pc, outp = bench(tp.traverse_closest_packet, pbvh, orig, dirs, t_min, active)
    match = float(np.asarray(out[1] == outp[1]).mean())
    print(f"closest: xla {ms_xc:7.1f} ms | packet {ms_pc:7.1f} ms "
          f"({ms_xc/ms_pc:.1f}x)  prim match {match*100:.3f}% hits={hits}", flush=True)

    # shadow rays from hit points toward the quad light center
    t_hit, prim = out[0], out[1]
    hp = orig + jnp.where(prim[:, None] >= 0, t_hit[:, None], 1.0) * dirs
    lp = jnp.asarray([0.0, float(np.asarray(hp[:, 1]).max() + 1.0), 0.0], jnp.float32)
    sd = lp[None, :] - hp
    dist = jnp.linalg.norm(sd, axis=1)
    sd = sd / dist[:, None]
    mask = prim >= 0
    # shadow rays resorted by new direction/origin
    sperm, _ = traverse.ray_sort_perm(hp, sd, mask)
    hp, sd, dist, mask = hp[sperm], sd[sperm], dist[sperm], mask[sperm]

    pbvh_any = pair.any
    xla_any = jax.jit(lambda o, dd, tn, tm, m: traverse.traverse_any_blocked(pbvh_any, o, dd, tn, tm, m))
    ms_xa, occ0 = bench(xla_any, hp, sd, t_min + 1e-4, dist, mask)
    ms_pa, occ1 = bench(tp.traverse_any_packet, pbvh, hp, sd, t_min + 1e-4, dist, mask)
    amatch = float(np.asarray(occ0 == occ1).mean())
    print(f"any:     xla {ms_xa:7.1f} ms | packet {ms_pa:7.1f} ms "
          f"({ms_xa/ms_pa:.1f}x)  match {amatch*100:.3f}% occl={int(np.asarray(occ0).sum())}", flush=True)

    net_c = max(ms_pc - ms_rb, 1e-3)
    net_a = max(ms_pa - ms_rb, 1e-3)
    print(f"packet net-of-readback: closest {net_c:.1f} ms ({R/net_c/1e3:.1f} Mray/s)  "
          f"any {net_a:.1f} ms ({R/net_a/1e3:.1f} Mray/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())


def bounce_probe(subdiv: int = 4) -> int:
    """Per-pass costs including INCOHERENT bounce rays (cosine-hemisphere
    at hit points) — the part of the frame the coherent probe misses."""
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
    print(f"tris={scene.unique_tris()} nodes={pbvh.nodes.shape}", flush=True)

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
        return min(ts) * 1e3, out

    ms_rb, _ = bench(lambda x: x + 1.0, jnp.zeros((R,), jnp.float32))
    print(f"readback floor {ms_rb:.1f} ms", flush=True)

    ms, out = bench(tp.traverse_closest_packet, pbvh, orig, dirs, t_min, active)
    t_hit, prim = out[0], out[1]
    print(f"b0 closest (coherent): {ms-ms_rb:7.1f} ms", flush=True)

    # cosine-hemisphere bounce dirs at hit points (realistic incoherence)
    import numpy as _np
    rng = _np.random.default_rng(3)
    hp = orig + jnp.where(prim[:, None] >= 0, t_hit[:, None] * 0.999, 1.0) * dirs
    # approximate normals via upward axis mix (enough for direction stats)
    u1 = jnp.asarray(rng.uniform(size=(R,)).astype(_np.float32))
    u2 = jnp.asarray(rng.uniform(size=(R,)).astype(_np.float32))
    rad = jnp.sqrt(u1)
    phi = 2.0 * _np.pi * u2
    n = -dirs  # face the camera: worst-case-ish spread
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

    ms, _ = bench(tp.traverse_closest_packet, pbvh, hp_s, bd_s, tmin2, mask_s)
    print(f"b1 closest (incoherent, {int(np.asarray(mask).sum())} active): {ms-ms_rb:7.1f} ms", flush=True)
    msx, _ = bench(jax.jit(lambda o, dd, tn, a: traverse.traverse_closest_blocked(pbvh, o, dd, tn, a)),
                   hp_s, bd_s, tmin2, mask_s)
    print(f"b1 closest XLA:                      {msx-ms_rb:7.1f} ms", flush=True)

    # shadow from bounce hit points toward light (semi-coherent)
    lp = jnp.asarray([0.0, float(np.asarray(hp[:, 1]).max() + 1.0), 0.0], jnp.float32)
    sd = lp[None, :] - hp
    dist = jnp.linalg.norm(sd, axis=1)
    sd = sd / dist[:, None]
    sperm2, _ = traverse.ray_sort_perm(hp, sd, mask)
    ms, _ = bench(tp.traverse_any_packet, pbvh, hp[sperm2], sd[sperm2],
                  tmin2, dist[sperm2], mask[sperm2])
    print(f"shadow any (semi-coherent): {ms-ms_rb:7.1f} ms", flush=True)
    return 0
