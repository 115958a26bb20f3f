"""Rebalance EFFECTIVENESS measurement (VERDICT r4 #5): does `-rebalance`
(ppermute mid-path ray redistribution, SURVEY §2.3) actually reduce
per-device active-lane imbalance and wall time on a divergence-skewed
sharded config? Runs on the virtual CPU mesh (the same 8-device
shard_map path the driver's dryrun exercises).

Reports, for a deliberately imbalanced framing (tilted cornell: lower
devices' rays keep bouncing inside the box, upper devices' rays miss to
the background after bounce 0):
  1. per-device ACTIVE-lane counts after bounce 0, before and after the
     hypercube exchange rounds (the distribution the per-bounce schedule
     actually sees);
  2. wall time of the full sharded render step, rebalance on vs off.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/rebalance_probe.py [W H steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize preloads the axon plugin before this file runs, so env
# edits here are too late for XLA_FLAGS — the 8-device flag must come
# from the shell; the platform pin still works via jax.config.update
# (backends initialize lazily), as tests/conftest.py does.
import numpy as np


def main() -> int:
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from chameleonrt_tpu.engine import path_tracer
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set, make_trace_fns
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.parallel import sharded
    from chameleonrt_tpu.scene.loader import load_scene

    n_dev = min(8, len(jax.devices()))
    H = (H // n_dev) * n_dev
    print(f"devices={n_dev} frame={W}x{H}", flush=True)

    scene = load_scene("proc://cornell")
    flat, meta = build_device_scene(scene)
    flat = flat._replace(blas=build_blas_set(flat, meta))
    tc, ta = make_trace_fns(meta)
    cam = scene.cameras[0]
    # tilt: the box fills only the lower part of the frame
    d = (cam.center + np.array([0.0, 1.6, 0.0], np.float32)) - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)

    # --- 1. per-device active counts after bounce 0, pre/post exchange
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    pixel_id = (px + py * W).astype(jnp.uint32)
    state = rng_ops.get_rng(pixel_id, jnp.uint32(0))
    _, orig, dirs = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    R = orig.shape[0]
    hit = tc(flat, orig, dirs, 1e-4, jnp.ones((R,), bool))
    act = np.asarray(hit.tri >= 0)  # ~ lanes still alive entering bounce 1
    per_dev = act.reshape(n_dev, -1).sum(axis=1)
    tot = int(act.sum())
    print(f"bounce-1 actives/device (row-sharded): {per_dev.tolist()} "
          f"(total {tot}, max/mean {per_dev.max() / max(per_dev.mean(), 1e-9):.2f})",
          flush=True)

    mesh = sharded.make_mesh(jax.devices()[:n_dev])
    shard_R = R // n_dev
    bits = []
    b = 1
    while b < n_dev:
        bits.append(b)
        b <<= 1

    z3 = orig  # payload content irrelevant to the count measurement
    a = jnp.asarray(act)
    lane = jnp.arange(R, dtype=jnp.int32)
    st = jnp.zeros((R,), jnp.uint32)
    cur = (st, z3, z3, z3, z3, a, lane)
    for bit in bits:
        def body(s, o, dd, tp, il, aa, lp, bit=bit):
            return path_tracer._exchange_wavefront(
                s, o, dd, tp, il, aa, lp,
                axis=sharded.AXIS, bit=bit, n_dev=n_dev,
            )

        f = jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(sharded.AXIS),) * 7,
                out_specs=(P(sharded.AXIS),) * 7,
                check_vma=False,
            )
        )
        cur = f(*cur)
    post = np.asarray(cur[5]).reshape(n_dev, -1).sum(axis=1)
    print(f"after exchange rounds {bits}:              {post.tolist()} "
          f"(total {int(post.sum())}, max/mean "
          f"{post.max() / max(post.mean(), 1e-9):.2f})", flush=True)

    # --- 2. wall time of the full sharded step, rebalance off/on
    flat_r = sharded.replicate_scene(flat, mesh)
    for reb in (False, True):
        step = sharded.make_sharded_render_step(
            meta, tc, ta, mesh, W, H, 1, rebalance=reb
        )
        accum = sharded.shard_accum(jnp.zeros((H, W, 3), jnp.float32), mesh)
        accum, r = step(flat_r, view, accum, jnp.uint32(0))  # compile+warm
        jax.block_until_ready(accum)
        ts = []
        for i in range(steps):
            t0 = time.perf_counter()
            accum, r = step(flat_r, view, accum, jnp.uint32(i + 1))
            jax.block_until_ready(accum)
            ts.append(time.perf_counter() - t0)
        print(f"sharded step rebalance={reb}: min {min(ts)*1e3:.1f} ms "
              f"med {sorted(ts)[len(ts)//2]*1e3:.1f} ms (rays {int(r)})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
