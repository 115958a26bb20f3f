"""Isolate the large-scene TPU fault: run one closest-hit pass on a random
soup of N triangles at 1280x720, N from argv. Run each N in its own process
(a kernel fault wedges the process). Driver mode: no args = spawn child
processes over a size ladder and report pass/fail per size.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(n: int, rays: int = 0, block: int = 0, unroll: int = 0) -> int:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    t0 = time.perf_counter()
    scene = load_scene(f"proc://random?n_tris={n}&spread=12")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pair = flat.blas[0]
    print(
        f"n={n}: build {time.perf_counter()-t0:.1f}s nodes {pair.closest.nodes.shape} "
        f"leaves {pair.closest.leaf_rows.shape} depth {pair.closest.max_depth}",
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
    _, orig, dirs = camera_ops.generate_primary_rays(view, px, py, float(W), float(H), state)
    R = orig.shape[0]

    if unroll:
        traverse.UNROLL = unroll
    if rays:
        orig, dirs = orig[:rays], dirs[:rays]
        R = rays
    kwargs = {"block": block} if block else {}
    fn = jax.jit(
        lambda o, dd: traverse.traverse_closest_blocked(
            pair.closest, o, dd, jnp.zeros((R,), jnp.float32),
            jnp.ones((R,), bool), **kwargs
        )
    )
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(orig, dirs))
    print(f"n={n}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(orig, dirs))
    hits = int((out[1] >= 0).sum())
    print(
        f"n={n}: OK pass {1e3*(time.perf_counter()-t0):.1f} ms hits={hits}",
        flush=True,
    )
    return 0


def main() -> int:
    if len(sys.argv) > 2:
        return child(*(int(a) for a in sys.argv[1:]))
    if len(sys.argv) > 1 and sys.argv[1] != "bisect":
        return child(int(sys.argv[1]))
    if len(sys.argv) > 1:  # bisect mode: vary one traversal knob at a time
        cases = [
            (2_000_000, 65536, 0, 0),   # small ray count
            (2_000_000, 0, 65536, 0),   # bigger blocks (fewer map steps)
            (2_000_000, 0, 0, 1),       # no unroll
            (1_500_000, 0, 0, 0),       # size threshold
        ]
    else:
        cases = [(n, 0, 0, 0) for n in (1_000_000, 2_000_000, 4_000_000, 6_700_000)]
    for case in cases:
        args = [str(a) for a in case]
        r = subprocess.run(
            [sys.executable, "-u", __file__, *args],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
            timeout=3000,
        )
        print(f"--- case {case}", flush=True)
        print(r.stdout, end="", flush=True)
        if r.returncode != 0:
            tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-4:])
            print(f"case {case}: FAILED rc={r.returncode}\n{tail}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
