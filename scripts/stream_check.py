"""Compiled check + perf of the DMA-streamed persistent kernels on a
Rungholt-class scene whose BVH tables exceed the VMEM budget (the round-2
wall: such scenes fell to the XLA gather path at 0.001 Mray/s).

Usage: python -u scripts/stream_check.py [n]   (city grid size, def 610)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401

import time

import numpy as np


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 610

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.scene.loader import load_scene

    t0 = time.perf_counter()
    scene = load_scene(f"proc://city?n={n}")
    print(f"scene gen {time.perf_counter()-t0:.1f}s tris={scene.unique_tris()}", flush=True)
    t0 = time.perf_counter()
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pbvh = flat.blas[0].closest
    tbl_mb = (pbvh.nodes.size + pbvh.leaf_rows.size) * 4 / 2**20
    print(
        f"build {time.perf_counter()-t0:.1f}s nodes={pbvh.nodes.shape} "
        f"leaves={pbvh.leaf_rows.shape} depth={pbvh.max_depth} "
        f"tables={tbl_mb:.0f} MiB "
        f"persistent={tp.persistent_eligible(pbvh, 230400)} "
        f"stream={tp.persistent_stream_eligible(pbvh, 230400)}",
        flush=True,
    )

    W, H = 640, 360
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    _, orig, dirs = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    R = orig.shape[0]
    active = jnp.ones((R,), bool)
    perm, _ = traverse.ray_sort_perm(orig, dirs, active)
    orig, dirs = orig[perm], dirs[perm]
    t_min = jnp.zeros((R,), jnp.float32)

    # --- correctness on a 16K-ray prefix vs the XLA path (the XLA gather
    # path is ~100x slower at this scale; a prefix keeps it under the
    # ~60 s execution wall)
    Rs = 4096
    stride = max(1, R // Rs)
    sel = slice(None, stride * Rs, stride)  # spans the whole sorted wavefront
    from chameleonrt_tpu.ops.traverse import traverse_closest_blocked

    t0 = time.perf_counter()
    tx, px_, _, _ = jax.block_until_ready(
        jax.jit(traverse_closest_blocked)(
            pbvh, orig[sel], dirs[sel], t_min[sel], active[sel]
        )
    )
    print(f"xla {Rs} rays: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    ts, ps, _, _ = jax.block_until_ready(
        tp.traverse_closest_persistent(
            pbvh, orig[sel], dirs[sel], t_min[sel], active[sel], stream=True
        )
    )
    print(f"stream {Rs} rays (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)
    px_, ps, tx, ts = map(np.asarray, (px_, ps, tx, ts))
    match = (px_ == ps).mean()
    both = (px_ >= 0) & (ps >= 0)
    dt = np.abs(tx[both] - ts[both]).max() if both.any() else 0.0
    print(
        f"closest sampled: prim match {match*100:.4f}% max|dt|={dt:.2e} "
        f"hits xla={int((px_>=0).sum())} stream={int((ps>=0).sum())}",
        flush=True,
    )

    # --- perf at the bench wavefront (full 230K rays)
    def bench(fn, *args, nrep=3, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out[0])
        ts_ = []
        for _ in range(nrep):
            a = time.perf_counter()
            out = fn(*args, **kw)
            jax.block_until_ready(out[0])
            ts_.append(time.perf_counter() - a)
        return min(ts_)

    t = bench(
        tp.traverse_closest_persistent, pbvh, orig, dirs, t_min, active,
        stream=True,
    )
    print(
        f"stream closest {R} rays: {t*1e3:.1f} ms = {R/t/1e6:.2f} Mray/s",
        flush=True,
    )
    return 0 if match > 0.9999 else 1


if __name__ == "__main__":
    sys.exit(main())
