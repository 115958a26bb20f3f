"""Measure the shading stage alone at bench scale: run trace_path with
traversal stubbed (fixed plausible hits, no while loops) so the remaining
cost is shading-row gathers + material decode + NEE/MIS + Disney BSDF
evals + RNG. Usage: python -u scripts/shade_probe.py [textured]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    textured = "textured" in sys.argv[1:]
    stubshade = "stubshade" in sys.argv[1:]

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine import path_tracer

    if stubshade:
        # Replace the whole shading stage with a trivial, activity-
        # preserving ShadeOut so the remaining frame time is the
        # sort + miss/accum soup + bounce-loop machinery floor.
        def _fake_shade(flat, meta, bounce, state, orig, dir, tp, active,
                        hit_p, hit):
            R = orig.shape[0]
            z1 = jnp.zeros((R,), jnp.float32)
            z3 = jnp.zeros((R, 3), jnp.float32)
            up = z3.at[:, 2].set(1.0)
            return path_tracer.ShadeOut(
                state=state + jnp.uint32(1),
                c1=z3 + 0.01,
                c2=z3,
                shoot1=active,
                light_dir=up,
                light_dist=z1 + 5.0,
                shoot2=active,
                w_i2=up,
                t_light=z1 + 5.0,
                new_throughput=tp * 0.8,
                cont_dir=jnp.where(active[:, None], -dir, dir),
                new_active=active,
            )

        path_tracer._shade_bounce_blocked = _fake_shade
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops.intersect import Hit, T_MAX
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    print(f"device: {jax.devices()[0].device_kind} textured={textured}", flush=True)
    url = "proc://hall?subdiv=4" + ("&textured=1" if textured else "")
    scene = load_scene(url)
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))

    num_tris = meta.num_tris

    def fake_closest(flat, orig, dir, t_min, active):
        # deterministic fake hits: ~78% hit rate, varied triangles
        R = orig.shape[0]
        lane = jnp.arange(R, dtype=jnp.int32)
        hit = active & (lane % 9 != 0)
        tri = (
            (lane.astype(jnp.uint32) * np.uint32(2654435761))
            % np.uint32(max(num_tris, 1))
        ).astype(jnp.int32)
        t = 1.0 + 0.25 * (lane % 13).astype(jnp.float32)
        return Hit(
            t=jnp.where(hit, t, T_MAX),
            tri=jnp.where(hit, tri, -1),
            inst=jnp.where(hit, 0, -1),
            u=jnp.full((R,), 0.3, jnp.float32),
            v=jnp.full((R,), 0.4, jnp.float32),
        )

    def fake_any(flat, orig, dir, t_max, mask):
        lane = jnp.arange(orig.shape[0], dtype=jnp.int32)
        return mask & (lane % 3 == 0)

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)

    @jax.jit
    def render(flat):
        illum, rays = path_tracer.render_pixels(
            flat, meta, fake_closest, fake_any, view, np.uint32(1), px, py, W, H, 1
        )
        return illum.sum(), rays

    # fetch-sync (block_until_ready does not reliably wait on the tunnel;
    # see scripts/_bench_util.py) — the scalar fetch adds ~30 ms RTT,
    # constant across configs
    out = render(flat)
    float(out[0])
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = render(flat)
        float(out[0])
        ts.append(time.perf_counter() - t0)
    print(
        f"shading-only frame (5 bounces, {W}x{H}): {min(ts)*1e3:.1f} ms "
        f"(sum={float(out[0]):.3f} rays={int(out[1])})",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
