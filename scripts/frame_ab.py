"""Whole-frame stage A/B with FORCED host readback (np.asarray — the only
sync that reliably closes an axon-tunnel execution; block_until_ready can
return early, which made per-stage launches in frame_budget.py report
dispatch time, e.g. an impossible 0.1 ms coherent closest).

Each variant renders the REAL full frame with exactly one stage replaced
by a stub, so stage cost = full - variant on identical wavefront shapes.
Usage: python -u scripts/frame_ab.py [url] [W] [H]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401


def bench(fn, *args, n=3):
    out = fn(*args)
    np.asarray(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
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
    from chameleonrt_tpu.ops.intersect import Hit, T_MAX
    from chameleonrt_tpu.scene.loader import load_scene

    print(f"device={jax.devices()[0].device_kind} scene={url} {W}x{H}", flush=True)
    scene = load_scene(url)
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    tc, ta = make_trace_fns(meta)

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    num_tris = meta.num_tris

    # readback floor: time an already-computed tiny array... no — time a
    # trivially-cheap jit at frame output shape to bound sync+transfer.
    @jax.jit
    def trivial():
        return jnp.zeros((H * W, 3), jnp.float32) + 1.0

    floor = bench(lambda: trivial())
    print(f"readback+dispatch floor (frame-shaped zeros): {floor*1e3:.1f} ms", flush=True)

    def fake_closest(flat_, orig, dir, t_min, active):
        lane2 = jnp.arange(orig.shape[0], dtype=jnp.int32)
        hv = active & (lane2 % 9 != 0)
        tri = (
            (lane2.astype(jnp.uint32) * np.uint32(2654435761))
            % np.uint32(max(num_tris, 1))
        ).astype(jnp.int32)
        tt = 1.0 + 0.25 * (lane2 % 13).astype(jnp.float32)
        return Hit(
            t=jnp.where(hv, tt, T_MAX),
            tri=jnp.where(hv, tri, -1),
            inst=jnp.where(hv, 0, -1),
            u=jnp.full_like(tt, 0.3),
            v=jnp.full_like(tt, 0.3),
        )

    def fake_any(flat_, orig, dir, t_max, mask):
        lane2 = jnp.arange(orig.shape[0], dtype=jnp.int32)
        return mask & (lane2 % 3 == 0)

    def frame(tc_fn, ta_fn):
        @jax.jit
        def f(flat_):
            illum, _ = path_tracer.render_pixels(
                flat_, meta, tc_fn, ta_fn, view, np.uint32(0), px, py, W, H, 1
            )
            return illum

        return f

    variants = [
        ("FULL", tc, ta),
        ("no closest (stub)", fake_closest, ta),
        ("no any (stub)", tc, fake_any),
        ("no traversal at all", fake_closest, fake_any),
    ]
    results = {}
    for name, tcf, taf in variants:
        t = bench(frame(tcf, taf), flat)
        results[name] = t * 1e3
        print(f"{name:24s} {t*1e3:8.1f} ms", flush=True)

    full = results["FULL"]
    print(f"\nclosest total  = {full - results['no closest (stub)']:.1f} ms")
    print(f"any total      = {full - results['no any (stub)']:.1f} ms")
    print(f"non-traversal  = {results['no traversal at all']:.1f} ms (incl floor {floor*1e3:.1f})")

    # ---- decompose the non-traversal remainder: texture cost (same frame
    # on the untextured twin scene) and the per-bounce machinery slope
    # (stub frame at MAX_PATH_DEPTH 1 vs 5)
    if "textured=1" in url:
        from chameleonrt_tpu.engine.trace_bvh import build_blas_set as _bb
        scene_u = load_scene(url.replace("textured=1", "textured=0"))
        flat_u, meta_u, host_u = build_device_scene(scene_u, want_host=True)
        flat_u = flat_u._replace(blas=build_blas_set(flat_u, meta_u, host_u))

        @jax.jit
        def stub_frame_u(flat_):
            illum, _ = path_tracer.render_pixels(
                flat_, meta_u, fake_closest, fake_any, view, np.uint32(0),
                px, py, W, H, 1,
            )
            return illum

        t_u = bench(stub_frame_u, flat_u) * 1e3
        print(f"stub frame untextured    {t_u:8.1f} ms  (texture cost ~= "
              f"{results['no traversal at all'] - t_u:.1f})", flush=True)

    import chameleonrt_tpu.ops.math as math_ops
    saved = math_ops.MAX_PATH_DEPTH
    try:
        path_tracer.MAX_PATH_DEPTH = 1

        @jax.jit
        def stub_frame_b1(flat_):
            illum, _ = path_tracer.render_pixels(
                flat_, meta, fake_closest, fake_any, view, np.uint32(0),
                px, py, W, H, 1,
            )
            return illum

        t_b1 = bench(stub_frame_b1, flat) * 1e3
        print(f"stub frame 1 bounce      {t_b1:8.1f} ms  (per-bounce ~= "
              f"{(results['no traversal at all'] - t_b1) / 4:.1f})", flush=True)
    finally:
        path_tracer.MAX_PATH_DEPTH = saved
    return 0


if __name__ == "__main__":
    main()
