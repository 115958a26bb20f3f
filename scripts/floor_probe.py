"""Decompose the non-traversal frame floor (the stub-traversal frame from
scripts/frame_budget.py measured 366 ms at 921K lanes while a standalone
whole-wavefront shade is 0.2 ms): time the stub frame across
CHAMELEONRT_SHADE_BLOCK settings, plus sub-stage variants (no shading, no
sort, no scatter) to find where the floor lives.
Usage: python -u scripts/floor_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401


def bench(fn, *args, n=3, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    np.asarray(out if not isinstance(out, tuple) else out[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        np.asarray(out if not isinstance(out, tuple) else out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine import path_tracer
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops.intersect import Hit, T_MAX
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    scene = load_scene("proc://hall?subdiv=4&textured=1")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    R = W * H
    num_tris = meta.num_tris

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)

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

    def stub_frame():
        @jax.jit
        def f(flat_):
            illum, rays = path_tracer.render_pixels(
                flat_, meta, fake_closest, fake_any, view, np.uint32(0),
                px, py, W, H, 1,
            )
            return illum

        return f

    for blk in ("65536", "131072", "262144", "0"):
        os.environ["CHAMELEONRT_SHADE_BLOCK"] = blk
        t = bench(stub_frame(), flat) * 1e3
        print(f"stub frame SHADE_BLOCK={blk}: {t:.1f} ms", flush=True)
    os.environ["CHAMELEONRT_SHADE_BLOCK"] = "65536"

    # single whole-wavefront shade stage alone (the 0.2 ms claim, re-checked)
    from chameleonrt_tpu.ops import rng as rng_ops

    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    state, orig, dirs = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    active = jnp.ones((R,), bool)
    tp_ = jnp.ones((R, 3), jnp.float32)
    hit = fake_closest(flat, orig, dirs, 0.0, active)
    hp = orig + hit.t[..., None] * dirs

    shade_j = jax.jit(
        lambda st, o, dd, t, a, hpp, tri, inst, u, v: path_tracer._shade_bounce(
            flat, meta, 0, st, o, dd, t, a, hpp, tri, inst, u, v
        )
    )
    t = bench(shade_j, state, orig, dirs, tp_, active, hp, hit.tri, hit.inst,
              hit.u, hit.v) * 1e3
    print(f"single whole-wavefront shade: {t:.2f} ms", flush=True)

    blocked_j = jax.jit(
        lambda st, o, dd, t, a, hpp, h: path_tracer._shade_bounce_blocked(
            flat, meta, 0, st, o, dd, t, a, hpp, h
        )
    )
    t = bench(blocked_j, state, orig, dirs, tp_, active, hp, hit) * 1e3
    print(f"single BLOCKED shade (65536): {t:.2f} ms", flush=True)

    # frame with shading REPLACED by a trivial passthrough: isolates the
    # loop/sort/scatter machinery (uses the real sort + fake traversal)
    import chameleonrt_tpu.engine.path_tracer as ptm

    real_shade = ptm._shade_bounce_blocked

    def trivial_shade(flat_, meta_, bounce, state, orig, dir, throughput,
                      active, hit_p, hit):
        R2 = orig.shape[0]
        z1 = jnp.zeros((R2,), jnp.float32)
        z3 = jnp.zeros((R2, 3), jnp.float32)
        return ptm.ShadeOut(
            state=state, c1=z3, c2=z3, shoot1=active,
            light_dir=z3.at[:, 2].set(1.0), light_dist=z1 + 1.0,
            shoot2=active, w_i2=z3.at[:, 2].set(1.0), t_light=z1 + 1.0,
            new_throughput=throughput, cont_dir=dir, new_active=active,
        )

    ptm._shade_bounce_blocked = trivial_shade
    try:
        t = bench(stub_frame(), flat) * 1e3
        print(f"stub frame, TRIVIAL shading (machinery only): {t:.1f} ms", flush=True)
    finally:
        ptm._shade_bounce_blocked = real_shade

    # machinery without the per-bounce sort
    real_sort = ptm._sort_wavefront

    def no_sort(state, orig, dir, tp_2, il, active, lane):
        return state, orig, dir, tp_2, il, active, lane

    ptm._sort_wavefront = no_sort
    ptm._shade_bounce_blocked = trivial_shade
    try:
        t = bench(stub_frame(), flat) * 1e3
        print(f"stub frame, trivial shading, NO sort: {t:.1f} ms", flush=True)
    finally:
        ptm._sort_wavefront = real_sort
        ptm._shade_bounce_blocked = real_shade

    # real shading, no sort
    ptm._sort_wavefront = no_sort
    try:
        t = bench(stub_frame(), flat) * 1e3
        print(f"stub frame, real shading, NO sort: {t:.1f} ms", flush=True)
    finally:
        ptm._sort_wavefront = real_sort

    return 0


if __name__ == "__main__":
    main()
