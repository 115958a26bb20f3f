"""Sort-key A/B for bounce-ray packet formation: the persistent kernel
pays the UNION of each 256-ray packet's node visits, so the sort key
directly sets the iteration count. Tests direction-major (current),
origin-major, and mixed keys on the hall b1 wavefront.

Usage: python -u scripts/sortkey_probe.py [subdiv]
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
    from chameleonrt_tpu.ops.lbvh import _expand_bits_10
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    R = W * H
    scene = load_scene(f"proc://hall?subdiv={subdiv}")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pbvh = _closest_table(flat.blas[0])

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    _, o0, d0 = camera_ops.generate_primary_rays(view, px, py, float(W), float(H), state)
    a0 = jnp.ones((R,), bool)
    perm, _ = traverse.ray_sort_perm(o0, d0, a0)
    o0, d0 = o0[perm], d0[perm]
    t0_ = jnp.zeros((R,), jnp.float32)
    tt, pp, _, _ = jax.jit(
        lambda: tp.traverse_closest_persistent(pbvh, o0, d0, t0_, a0)
    )()
    hitm = np.asarray(pp) >= 0
    hp = np.asarray(o0) + np.asarray(tt)[:, None] * np.asarray(d0)
    rn = np.random.default_rng(7)
    z = rn.normal(size=(R, 3)).astype(np.float32)
    z /= np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-6)
    o1n, d1n, a1n = hp, z, hitm

    def key_current(o, dd, act):
        return traverse.ray_sort_perm_only(
            jnp.asarray(o), jnp.asarray(dd), jnp.asarray(act)
        )

    def _morton(o, bits):
        lo = o.min(axis=0)
        hi = o.max(axis=0)
        scale = (2.0 ** (bits) - 1.0) / np.maximum(hi - lo, 1e-20)
        q = np.clip((o - lo) * scale, 0, 2.0**bits - 1).astype(np.uint32)
        m = (
            (np.asarray(_expand_bits_10(jnp.asarray(q[:, 0]))) << 2)
            | (np.asarray(_expand_bits_10(jnp.asarray(q[:, 1]))) << 1)
            | np.asarray(_expand_bits_10(jnp.asarray(q[:, 2])))
        )
        return m.astype(np.uint64)

    def key_origin_major(o, dd, act, obits=7, dbits_oct=True):
        m = _morton(o, obits)  # 3*obits bits
        oct_ = ((dd[:, 0] < 0) * 4 + (dd[:, 1] < 0) * 2 + (dd[:, 2] < 0)).astype(
            np.uint64
        )
        dq = np.clip(np.abs(dd) * 3.999, 0, 3).astype(np.uint64)
        dirq = (dq[:, 0] << 4) | (dq[:, 1] << 2) | dq[:, 2]
        key = (m << np.uint64(9)) | (oct_ << np.uint64(6)) | dirq
        key |= (~act).astype(np.uint64) << np.uint64(62)
        return jnp.asarray(np.argsort(key, kind="stable").astype(np.int32))

    def key_interleave(o, dd, act, split=9, dbits=0):
        # origin morton top, then octant (+dbits dir bits), then finer origin
        m = _morton(o, 10)
        hi = m >> np.uint64(split)
        lo = m & np.uint64((1 << split) - 1)
        oct_ = ((dd[:, 0] < 0) * 4 + (dd[:, 1] < 0) * 2 + (dd[:, 2] < 0)).astype(
            np.uint64
        )
        db = np.uint64(0)
        if dbits:
            dq = np.clip(np.abs(dd) * 1.999, 0, 1).astype(np.uint64)
            db = (dq[:, 0] << 2) | (dq[:, 1] << 1) | dq[:, 2]
        key = (hi << np.uint64(split + 6)) | (oct_ << np.uint64(split + 3)) | (
            db << np.uint64(split)
        ) | lo
        key |= (~act).astype(np.uint64) << np.uint64(62)
        return jnp.asarray(np.argsort(key, kind="stable").astype(np.int32))

    variants = [
        ("current dir-major", lambda: key_current(o1n, d1n, a1n)),
        ("split6/oct", lambda: key_interleave(o1n, d1n, a1n, 6)),
        ("split9/oct", lambda: key_interleave(o1n, d1n, a1n, 9)),
        ("split12/oct", lambda: key_interleave(o1n, d1n, a1n, 12)),
        ("split15/oct", lambda: key_interleave(o1n, d1n, a1n, 15)),
        ("split9/oct+3db", lambda: key_interleave(o1n, d1n, a1n, 9, 3)),
        ("split12/oct+3db", lambda: key_interleave(o1n, d1n, a1n, 12, 3)),
    ]
    for name, kf in variants:
        p = np.asarray(kf())
        o1 = jnp.asarray(o1n[p])
        d1 = jnp.asarray(d1n[p])
        a1 = jnp.asarray(a1n[p])
        tmn = jnp.full((R,), 1e-4, jnp.float32)
        iters = int(
            tp.traverse_closest_persistent(pbvh, o1, d1, tmn, a1, return_iters=True)[0]
        )
        fn = jax.jit(
            lambda o1=o1, d1=d1, a1=a1: tp.traverse_closest_persistent(
                pbvh, o1, d1, tmn, a1
            )
        )
        t = bench(fn)
        print(f"b1 {name:28s} iters={iters:7d}  {t*1e3:8.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    main()
