"""Iteration-count comparison: grid vs persistent packet kernels on the
hall b0/b1 wavefronts. Grid reports per-group iteration counts (sum =
total launch iterations); persistent reports its single global count.

Usage: python -u scripts/iters_probe.py [subdiv]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4

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
    pbvh = flat.blas[0].closest

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

    gi = np.asarray(tp.traverse_closest_packet(pbvh, orig, dirs, t_min, active, return_iters=True))
    pi = int(np.asarray(tp.traverse_closest_persistent(pbvh, orig, dirs, t_min, active, return_iters=True)[0]))
    print(f"b0: grid sum {int(gi.sum())} (groups min {gi.min()} max {gi.max()}) | persistent {pi}", flush=True)

    t, prim, _, _ = tp.traverse_closest_packet(pbvh, orig, dirs, t_min, active)
    rng = np.random.default_rng(3)
    hp = orig + jnp.where(prim[:, None] >= 0, t[:, None] * 0.999, 1.0) * dirs
    u1 = jnp.asarray(rng.uniform(size=(R,)).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=(R,)).astype(np.float32))
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

    gi = np.asarray(tp.traverse_closest_packet(pbvh, hp_s, bd_s, tmin2, mask_s, return_iters=True))
    pi = int(np.asarray(tp.traverse_closest_persistent(pbvh, hp_s, bd_s, tmin2, mask_s, return_iters=True)[0]))
    print(f"b1: grid sum {int(gi.sum())} (groups min {gi.min()} max {gi.max()}) | persistent {pi}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
