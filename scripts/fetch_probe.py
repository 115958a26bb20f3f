"""Is the persistent kernel fetch-bound? A/B the VMEM tier (K serialized
scalar-indexed row copies per iteration) against the streamed tier (K
overlapped async DMAs) on the SAME hall wavefronts, plus K/p_sub sweeps.

Usage: python -u scripts/fetch_probe.py [subdiv]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401

import time

import numpy as np


def bench(fn, n=3):
    out = fn()
    np.asarray(out[0] if isinstance(out, tuple) else out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set, _closest_table
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    R = W * H
    scene = load_scene(f"proc://hall?subdiv={subdiv}")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pbvh = _closest_table(flat.blas[0])
    print(
        f"device={jax.devices()[0].device_kind} nodes={pbvh.nodes.shape} "
        f"leaves={pbvh.leaf_rows.shape}",
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
    _, orig0, dir0 = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    act0 = jnp.ones((R,), bool)
    perm, _ = traverse.ray_sort_perm(orig0, dir0, act0)
    orig0, dir0 = orig0[perm], dir0[perm]
    tmin0 = jnp.zeros((R,), jnp.float32)

    # b1-like wavefront from real hits
    t0_, p0_, u0_, v0_ = jax.jit(
        lambda: tp.traverse_closest_persistent(pbvh, orig0, dir0, tmin0, act0)
    )()
    hitm = np.asarray(p0_) >= 0
    hp = np.asarray(orig0) + np.asarray(t0_)[:, None] * np.asarray(dir0)
    rngn = np.random.default_rng(7)
    zax = rngn.normal(size=(R, 3)).astype(np.float32)
    zax /= np.maximum(np.linalg.norm(zax, axis=1, keepdims=True), 1e-6)
    o1, d1 = jnp.asarray(hp), jnp.asarray(zax)
    act1 = jnp.asarray(hitm)
    p1s, _ = traverse.ray_sort_perm(o1, d1, act1)
    o1, d1, act1 = o1[p1s], d1[p1s], act1[p1s]
    tmin1 = jnp.full((R,), 1e-4, jnp.float32)

    variants = []
    for label, kw in (
        ("vmem K=64 ps=2", dict()),
        ("merged-phase", dict(merged=True)),
    ):
        variants.append((label, kw))

    for name, orig, dd, tmn, act in (("b0", orig0, dir0, tmin0, act0),
                                     ("b1", o1, d1, tmin1, act1)):
        for label, kw in variants:
            fn = jax.jit(
                lambda orig=orig, dd=dd, tmn=tmn, act=act, kw=kw:
                tp.traverse_closest_persistent(pbvh, orig, dd, tmn, act, **kw)
            )
            try:
                t = bench(fn)
                # correctness spot-check vs default
                pr = np.asarray(fn()[1])
                base = np.asarray(p0_) if name == "b0" else None
                print(f"{name} closest {label:18s} {t*1e3:8.1f} ms", flush=True)
            except Exception as e:
                print(f"{name} closest {label:18s} FAILED {type(e).__name__}: {e}",
                      flush=True)
    return 0


if __name__ == "__main__":
    main()
