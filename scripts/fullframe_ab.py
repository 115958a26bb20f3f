"""A/B the full hall frame under engine knobs that are read at trace time:
sparse-occlusion compaction on/off, closest-hit arity 2/4. One process,
one scene build; each variant is its own jit trace.

Usage: python -u scripts/fullframe_ab.py [url] [W] [H]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401


def bench(fn, *args, n=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    url = sys.argv[1] if len(sys.argv) > 1 else "proc://hall?subdiv=4&textured=1"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 720

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine import path_tracer
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set, make_trace_fns
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.scene.loader import load_scene

    print(f"device={jax.devices()[0].device_kind} scene={url} {W}x{H}", flush=True)
    scene = load_scene(url)
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)

    variants = [
        ("base (arity=4, unblocked)", {}),
        ("blocked shading 65536", {"CHAMELEONRT_SHADE_BLOCK": "65536"}),
        ("closest arity=2", {"CHAMELEONRT_CLOSEST_ARITY": "2"}),
    ]
    keys = ["CHAMELEONRT_SHADE_BLOCK", "CHAMELEONRT_CLOSEST_ARITY"]
    base_img = None
    for name, env in variants:
        for k in keys:
            os.environ.pop(k, None)
        os.environ.update(env)
        tc, ta = make_trace_fns(meta)

        @jax.jit
        def full_frame(flat_, _tc=tc, _ta=ta):
            illum, rays = path_tracer.render_pixels(
                flat_, meta, _tc, _ta, view, np.uint32(0), px, py, W, H, 1
            )
            return illum

        t = bench(full_frame, flat)
        img = np.asarray(full_frame(flat))
        if base_img is None:
            base_img = img
            tag = ""
        else:
            d = np.abs(img - base_img)
            frac = (d.max(axis=-1) > 1e-2).mean() if d.ndim > 1 else 0.0
            tag = f"  maxdiff={d.max():.2e} frac>{1e-2:g}={frac:.5f}"
        print(f"{name:28s} {t * 1e3:8.1f} ms{tag}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
