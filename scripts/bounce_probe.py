"""Per-bounce traversal cost on REAL frame wavefronts (textured hall):
replays the path-tracer bounce loop eagerly, records every traversal
call's actual (orig, dir, tmin/tmax, mask), then times the persistent
kernels on those wavefronts across a (K, p_sub, leaf_thresh) grid with
iteration counts — so per-iteration cost and iteration floors are
separable. Usage: python -u scripts/bounce_probe.py [grid]
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
    np.asarray(out[0] if isinstance(out, (tuple, list)) else out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        np.asarray(out[0] if isinstance(out, (tuple, list)) else out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    grid = len(sys.argv) > 1 and sys.argv[1] == "grid"

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine import path_tracer
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import (
        _closest_table,
        build_blas_set,
        make_trace_fns,
    )
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.ops.math import EPSILON
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    scene = load_scene("proc://hall?subdiv=4&textured=1")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    tc, ta = make_trace_fns(meta)
    pair = flat.blas[0]
    ctab = _closest_table(pair)  # production closest table (BVH4 by default)
    print(f"closest arity={ctab.arity} L={ctab.leaf_size} "
          f"nodes={ctab.nodes.shape} depth={ctab.max_depth}",
          flush=True)
    print(f"any     arity={pair.any.arity} L={pair.any.leaf_size} "
          f"nodes={pair.any.nodes.shape} depth={pair.any.max_depth}", flush=True)

    R = W * H
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    pixel_id = (px + py * W).astype(jnp.uint32)
    state = rng_ops.get_rng(pixel_id, np.uint32(1))
    state, orig, dirs = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    active = jnp.ones((R,), bool)
    throughput = jnp.ones((R, 3), jnp.float32)
    illum = jnp.zeros((R, 3), jnp.float32)
    lane = jnp.arange(R, dtype=jnp.int32)
    t_min = jnp.float32(0.0)

    sort_j = jax.jit(path_tracer._sort_wavefront)
    tc_j = jax.jit(lambda o, dd, tm, a: tc(flat, o, dd, tm, a))
    shade_j = jax.jit(
        lambda b, st, o, dd, tp_, a, hp, tri, inst, u, v: path_tracer._shade_bounce(
            flat, meta, b, st, o, dd, tp_, a, hp, tri, inst, u, v
        )
    )

    # capture per-bounce traversal workloads
    closest_w = []  # (orig, dir, t_min, active)
    any_w = []  # (orig, dir, t_max, mask, label)
    for bounce in range(5):
        state, orig, dirs, throughput, illum, active, lane = sort_j(
            state, orig, dirs, throughput, illum, active, lane
        )
        closest_w.append((orig, dirs, t_min, active))
        hit = tc_j(orig, dirs, t_min, active)
        active = active & hit.hit
        hit_p = orig + hit.t[..., None] * dirs
        sh = shade_j(
            bounce, state, orig, dirs, throughput, active,
            hit_p, hit.tri, hit.inst, hit.u, hit.v,
        )
        state = sh.state
        any_w.append((hit_p, sh.light_dir, sh.light_dist, sh.shoot1, f"light b{bounce}"))
        any_w.append((hit_p, sh.w_i2, sh.t_light, sh.shoot2, f"bsdf  b{bounce}"))
        throughput = sh.new_throughput
        active = sh.new_active
        orig = jnp.where(active[..., None], hit_p, orig)
        dirs = jnp.where(active[..., None], sh.cont_dir, dirs)
        t_min = jnp.float32(EPSILON)
        print(f"bounce {bounce}: active {int(np.asarray(active).sum())} "
              f"shoot1 {int(np.asarray(sh.shoot1).sum())} "
              f"shoot2 {int(np.asarray(sh.shoot2).sum())}", flush=True)

    # --- time each real call at defaults, with iterations
    def run_closest(w, **kw):
        o, dd, tm, a = w
        return tp.traverse_closest_persistent(ctab, o, dd, tm, a, **kw)

    def run_any(w, **kw):
        o, dd, tmx, m = w
        return tp.traverse_any_persistent(
            pair.any, o, dd, jnp.full((R,), EPSILON, jnp.float32), tmx, m, **kw
        )

    total = 0.0
    print("\n| call | ms | iters |", flush=True)
    for b, w in enumerate(closest_w):
        t = bench(run_closest, w) * 1e3
        it = int(run_closest(w, return_iters=True)[0])
        total += t
        print(f"| closest b{b} | {t:.1f} | {it} |", flush=True)
    for w in any_w:
        o, dd, tmx, m, label = w
        t = bench(run_any, (o, dd, tmx, m)) * 1e3
        it = int(run_any((o, dd, tmx, m), return_iters=True)[0])
        total += t
        print(f"| any {label} | {t:.1f} | {it} |", flush=True)
    print(f"| TOTAL traversal | {total:.1f} | |", flush=True)

    if not grid:
        return 0

    # --- parameter grid on the expensive calls: closest b1, light b1, bsdf b1
    picks = [
        ("closest b1", "c", closest_w[1]),
        ("closest b2", "c", closest_w[2]),
        ("light b1", "a", any_w[2][:4]),
        ("bsdf  b1", "a", any_w[3][:4]),
    ]
    print("\n| call | K | p_sub | lt | ms | iters |", flush=True)
    for label, kind, w in picks:
        for kk in (64, 128):
            for p_sub in (1, 2, 4):
                for lt in (8, 16, 32):
                    kw = dict(k_slots=kk, p_sub=p_sub, leaf_thresh=lt)
                    try:
                        if kind == "c":
                            t = bench(run_closest, w, **kw) * 1e3
                            it = int(run_closest(w, return_iters=True, **kw)[0])
                        else:
                            t = bench(run_any, w, **kw) * 1e3
                            it = int(run_any(w, return_iters=True, **kw))
                    except Exception as e:  # noqa: BLE001
                        print(f"| {label} | {kk} | {p_sub} | {lt} | FAIL {type(e).__name__} | |",
                              flush=True)
                        continue
                    print(f"| {label} | {kk} | {p_sub} | {lt} | {t:.1f} | {it} |",
                          flush=True)
    return 0


if __name__ == "__main__":
    main()
