"""Decompose the shading stage's cost at bench width (R=W*H lanes): time
unpack_material (textured decode), disney_pdf, disney_brdf,
sample_disney_brdf, the RNG, and the full _shade_bounce, each as its own
jitted launch on realistic hall inputs. Identifies which of the ~4 Disney
passes per bounce the frame actually pays for.

Usage: python -u scripts/bsdf_probe.py [W] [H]
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
    return min(ts) * 1e3


def main() -> int:
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 720

    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine import path_tracer
    from chameleonrt_tpu.engine.device_scene import build_device_scene, unpack_material
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops import bsdf as bsdf_ops
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops.intersect import Hit, T_MAX
    from chameleonrt_tpu.ops.math import ortho_basis, normalize
    from chameleonrt_tpu.scene.loader import load_scene

    R = W * H
    print(f"device={jax.devices()[0].device_kind} R={R}", flush=True)
    scene = load_scene("proc://hall?subdiv=4&textured=1")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))

    rngn = np.random.default_rng(5)
    tri = jnp.asarray(rngn.integers(0, meta.num_tris, size=R, dtype=np.int32))
    uv = jnp.asarray(rngn.uniform(0, 1, size=(R, 2)).astype(np.float32))
    nrm = rngn.normal(size=(R, 3)).astype(np.float32)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-6)
    n = jnp.asarray(nrm)
    w_o = normalize(jnp.asarray(rngn.normal(size=(R, 3)).astype(np.float32)))
    w_o = jnp.where(jnp.sum(w_o * n, axis=1, keepdims=True) < 0, -w_o, w_o)
    w_i = normalize(jnp.asarray(rngn.normal(size=(R, 3)).astype(np.float32)))
    state = rng_ops.get_rng(jnp.arange(R, dtype=jnp.uint32), np.uint32(1))

    srow = jax.jit(lambda f, t: f.shade_rows[t])(flat, tri)
    mat_id = jax.lax.bitcast_convert_type(srow[:, 13], jnp.int32)

    um = jax.jit(lambda f, m, u: unpack_material(f, meta, m, u))
    print(f"unpack_material (tex decode): {bench(um, flat, mat_id, uv):8.1f} ms", flush=True)
    mat = um(flat, mat_id, uv)
    v_x, v_y = jax.jit(ortho_basis)(n)

    f_pdf = jax.jit(lambda m, a, b, c, x, y: bsdf_ops.disney_pdf(m, a, b, c, x, y))
    print(f"disney_pdf:                   {bench(f_pdf, mat, n, w_o, w_i, v_x, v_y):8.1f} ms", flush=True)
    f_brdf = jax.jit(lambda m, a, b, c, x, y: bsdf_ops.disney_brdf(m, a, b, c, x, y))
    print(f"disney_brdf:                  {bench(f_brdf, mat, n, w_o, w_i, v_x, v_y):8.1f} ms", flush=True)
    f_samp = jax.jit(
        lambda m, a, b, x, y, s: bsdf_ops.sample_disney_brdf(m, a, b, x, y, s)
    )
    print(f"sample_disney_brdf:           {bench(f_samp, mat, n, w_o, v_x, v_y, state):8.1f} ms", flush=True)

    f_rng = jax.jit(lambda s: rng_ops.lcg_randomf2(rng_ops.lcg_randomf(s)[0])[0])
    print(f"rng (randomf+randomf2):       {bench(f_rng, state):8.1f} ms", flush=True)

    # full shading stage, one bounce, all lanes active
    hit_p = jnp.asarray(rngn.uniform(-5, 5, size=(R, 3)).astype(np.float32))
    hit_u = jnp.asarray(rngn.uniform(0, 0.5, size=R).astype(np.float32))
    hit_v = jnp.asarray(rngn.uniform(0, 0.5, size=R).astype(np.float32))
    active = jnp.ones((R,), bool)
    inst = jnp.zeros((R,), jnp.int32)
    dirs = -w_o
    tp = jnp.ones((R, 3), jnp.float32)

    f_shade = jax.jit(
        lambda f, s, o, d, t, a, hp, ht, hu, hv: path_tracer._shade_bounce(
            f, meta, 0, s, o, d, t, a, hp, ht, inst, hu, hv
        )
    )
    print(
        f"_shade_bounce (1 bounce, all active): {bench(f_shade, flat, state, hit_p, dirs, tp, active, hit_p, tri, hit_u, hit_v):8.1f} ms",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
