"""Per-stage frame budget at bench scale (VERDICT r2 weak #1): where does
the hall frame go? Times each stage as its own device launch on real
wavefronts and prints a markdown table for docs/ARCHITECTURE.md.

Stages: wavefront sort, closest traversal (coherent b0 / incoherent b1),
occlusion traversal (light-branch converging / bsdf-branch sparse),
whole-frame shading (traversal stubbed), full real frame.

Usage: python -u scripts/frame_budget.py [url] [W] [H]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401  (persistent XLA cache)


def bench(fn, *args, n=3, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
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
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops.intersect import Hit, T_MAX
    from chameleonrt_tpu.ops.lights import LightArrays, quad_intersect
    from chameleonrt_tpu.scene.loader import load_scene

    print(f"device={jax.devices()[0].device_kind} scene={url} {W}x{H}", flush=True)
    scene = load_scene(url)
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    tc, ta = make_trace_fns(meta)
    R = W * H

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    _, orig0, dir0 = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    active0 = jnp.ones((R,), bool)
    t_min0 = jnp.zeros((R,), jnp.float32)
    perm, _ = traverse.ray_sort_perm(orig0, dir0, active0)
    orig0, dir0 = orig0[perm], dir0[perm]

    rows = []

    # --- sort stage (key build + argsort + ONE (R,16) packed row gather)
    @jax.jit
    def sort_stage(state, orig, dir, tp_, il, active, lane):
        return path_tracer._sort_wavefront(state, orig, dir, tp_, il, active, lane)

    tp_ = jnp.ones((R, 3), jnp.float32)
    il = jnp.zeros((R, 3), jnp.float32)
    lane = jnp.arange(R, dtype=jnp.int32)
    t = bench(sort_stage, state, orig0, dir0, tp_, il, active0, lane)
    rows.append(("wavefront sort (x5/frame)", t))

    # --- closest b0 (coherent primary)
    tc_j = jax.jit(lambda f, o, dd, tm, a: tc(f, o, dd, tm, a))
    t = bench(tc_j, flat, orig0, dir0, 0.0, active0)
    rows.append(("closest b0 coherent (x1)", t))

    hit0 = tc_j(flat, orig0, dir0, 0.0, active0)
    hitm = np.asarray(hit0.tri) >= 0
    hp = np.asarray(orig0) + np.asarray(hit0.t)[:, None] * np.asarray(dir0)
    print(f"b0 hit rate: {hitm.mean():.3f}", flush=True)

    # --- closest b1-like (incoherent continuations, ~hit-rate active)
    rngn = np.random.default_rng(7)
    zax = rngn.normal(size=(R, 3)).astype(np.float32)
    zax /= np.maximum(np.linalg.norm(zax, axis=1, keepdims=True), 1e-6)
    act1 = jnp.asarray(hitm)
    o1, d1 = jnp.asarray(hp), jnp.asarray(zax)
    p1, _ = traverse.ray_sort_perm(o1, d1, act1)
    o1s, d1s, act1s = o1[p1], d1[p1], act1[p1]
    t = bench(tc_j, flat, o1s, d1s, jnp.float32(1e-4), act1s)
    rows.append(("closest b1 incoherent (x4)", t))

    # --- any-hit: light-branch (converging on the light quad)
    light = scene.lights[0]
    lp = light.position + 0.5 * light.width * light.v_x + 0.5 * light.height * light.v_y
    sd = lp[None, :] - hp
    dist = np.linalg.norm(sd, axis=1, keepdims=True)
    sd = sd / np.maximum(dist, 1e-6)
    ta_j = jax.jit(lambda f, o, dd, tm, m: ta(f, o, dd, tm, m))
    t = bench(
        ta_j, flat, jnp.asarray(hp), jnp.asarray(sd),
        jnp.asarray(dist[:, 0] * 0.999), jnp.asarray(hitm),
    )
    rows.append(("any light-branch (x5)", t))

    # --- any-hit: bsdf-branch (sparse ~15% active, incoherent)
    sparse = jnp.asarray(hitm & (rngn.uniform(size=R) < 0.15))
    t = bench(ta_j, flat, o1, d1, jnp.full((R,), 10.0, jnp.float32), sparse)
    rows.append(("any bsdf-branch sparse (x5)", t))

    # --- shading-only frame (traversal stubbed with plausible fixed hits)
    num_tris = meta.num_tris

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

    @jax.jit
    def shade_frame(flat_):
        illum, rays = path_tracer.render_pixels(
            flat_, meta, fake_closest, fake_any, view, np.uint32(0),
            px, py, W, H, 1,
        )
        return illum

    t = bench(shade_frame, flat)
    rows.append(("shading whole frame (stub traversal)", t))

    # --- full real frame
    @jax.jit
    def full_frame(flat_):
        illum, rays = path_tracer.render_pixels(
            flat_, meta, tc, ta, view, np.uint32(0), px, py, W, H, 1,
        )
        return illum

    t_full = bench(full_frame, flat)
    rows.append(("FULL frame (real traversal)", t_full))

    print("\n| stage | ms | est x/frame | est ms/frame |")
    print("|---|---|---|---|")
    est_total = 0.0
    mults = {"wavefront sort (x5/frame)": 5, "closest b0 coherent (x1)": 1,
             "closest b1 incoherent (x4)": 4, "any light-branch (x5)": 5,
             "any bsdf-branch sparse (x5)": 5,
             "shading whole frame (stub traversal)": 1,
             "FULL frame (real traversal)": 0}
    for name, tt in rows:
        m = mults.get(name, 1)
        est = tt * 1e3 * m
        est_total += est
        print(f"| {name} | {tt*1e3:.1f} | {m} | {est:.1f} |")
    print(f"| SUM of stages | | | {est_total:.1f} |")
    print(f"| measured full frame | | | {t_full*1e3:.1f} |")
    return 0


if __name__ == "__main__":
    main()
