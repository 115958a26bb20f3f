"""Round-2 perf probe: traversal pass times on the real chip.

Measures closest-hit and any-hit traversal on the hall bench scene at
1280x720 across (block size, stack depth) variants, in ONE process
(two processes sharing the chip can fault it). Run with `python -u`.

Usage: python -u scripts/perf_probe.py [variant ...]
  variant = B<block>S<stack>  e.g. B65536S48 B8192S24
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    variants = sys.argv[1:] or ["B65536S48", "B16384S48", "B8192S48", "B8192S24"]

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.perf_counter()
    scene = load_scene("proc://hall?subdiv=4")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    print(f"scene build {time.perf_counter()-t0:.1f}s tris={scene.unique_tris()}", flush=True)
    pair = flat.blas[0]
    pbvh = pair.closest
    pbvh_any = pair.any
    print(
        f"nodes {pbvh.nodes.shape} any-nodes {pbvh_any.nodes.shape} "
        f"leaf_rows {pbvh.leaf_rows.shape}",
        flush=True,
    )

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
    orig, dirs = jax.block_until_ready((orig, dirs))
    R = orig.shape[0]
    t_min = jnp.zeros((R,), jnp.float32)
    active = jnp.ones((R,), bool)

    def bench(fn, *args, n=3):
        out = jax.block_until_ready(fn(*args))  # compile
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3, out

    for spec in variants:
        b_s = spec[1:].split("S")
        block, stack = int(b_s[0]), int(b_s[1])
        old_stack = traverse.STACK_DEPTH
        traverse.STACK_DEPTH = stack
        try:
            closest = jax.jit(
                lambda o, dd, tn, a: traverse.traverse_closest_blocked(
                    pbvh, o, dd, tn, a, block=block
                )
            )
            ms_c, out = bench(closest, orig, dirs, t_min, active)
            t_hit = out[0]
            hits = int((out[1] >= 0).sum())

            # shadow-like any-hit: rays from hit points toward a fixed light
            hp = orig + jnp.where(out[1][:, None] >= 0, t_hit[:, None], 1.0) * dirs
            lp = jnp.asarray(
                [0.0, float(np.asarray(hp[:, 1]).max() + 1.0), 0.0], jnp.float32
            )
            sd = lp[None, :] - hp
            dist = jnp.linalg.norm(sd, axis=1)
            sd = sd / dist[:, None]
            mask = out[1] >= 0
            anyf = jax.jit(
                lambda o, dd, tn, tm, m: traverse.traverse_any_blocked(
                    pbvh_any, o, dd, tn, tm, m, block=block
                )
            )
            ms_a, occ = bench(anyf, hp, sd, t_min + 1e-4, dist, mask)
            print(
                f"{spec}: closest {ms_c:8.1f} ms ({R/ms_c/1e3:.2f} Mray/s)  "
                f"any {ms_a:8.1f} ms ({R/ms_a/1e3:.2f} Mray/s)  "
                f"hits={hits} occl={int(occ.sum())}",
                flush=True,
            )
        finally:
            traverse.STACK_DEPTH = old_stack
    return 0


if __name__ == "__main__":
    sys.exit(main())
