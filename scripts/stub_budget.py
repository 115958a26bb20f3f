"""HONEST decomposition of the traversal-stubbed frame (362 ms at
defaults, scripts/shade_probe.py) using chained-jit timing
(scripts/_bench_util.py — block_until_ready loops under-measure on the
tunneled TPU).

Measures per-call cost at bench width (1280x720 = 921600 lanes) of:
  - _sort_wavefront        (pack + argsort + (R,16) row gather + unpack)
  - _shade_bounce          (full width, all lanes active)
  - _shade_bounce_blocked  (B=65536, ~70% active, actives-first)
The frame pays each 5x (MAX_PATH_DEPTH bounces).

Usage: python -u scripts/stub_budget.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401
from scripts._bench_util import chain_time  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine import path_tracer
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set
    from chameleonrt_tpu.ops.intersect import Hit, T_MAX
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    R = W * H
    print(f"device={jax.devices()[0].device_kind} R={R}", flush=True)

    scene = load_scene("proc://hall?subdiv=4&textured=1")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))

    rngn = np.random.default_rng(7)
    orig = jnp.asarray(rngn.uniform(-5, 5, size=(R, 3)).astype(np.float32))
    d = rngn.normal(size=(R, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-6)
    dir = jnp.asarray(d)
    # actives-first 70%, like a sorted mid-path wavefront
    act_np = np.zeros(R, bool)
    act_np[: int(R * 0.7)] = True
    active = jnp.asarray(act_np)
    all_active = jnp.ones((R,), bool)
    state = jnp.asarray(rngn.integers(0, 2**32, size=R, dtype=np.uint32))
    tp = jnp.ones((R, 3), jnp.float32)
    il = jnp.zeros((R, 3), jnp.float32)
    lane = jnp.arange(R, dtype=jnp.int32)
    tri = jnp.asarray(rngn.integers(0, meta.num_tris, size=R, dtype=np.int32))
    inst = jnp.zeros((R,), jnp.int32)
    hu = jnp.asarray(rngn.uniform(0, 0.5, size=R).astype(np.float32))
    hv = jnp.asarray(rngn.uniform(0, 0.5, size=R).astype(np.float32))
    hit = Hit(
        t=jnp.where(active, 2.0, T_MAX),
        tri=jnp.where(active, tri, -1),
        inst=jnp.where(active, inst, -1),
        u=hu,
        v=hv,
    )

    # --- sort: chain by feeding outputs back as inputs
    def mk_sort(n):
        def f(state, orig, dir, tp, il, active, lane):
            for _ in range(n):
                state, orig, dir, tp, il, active, lane = (
                    path_tracer._sort_wavefront(
                        state, orig, dir, tp, il, active, lane
                    )
                )
            return il.sum() + lane.sum()

        return jax.jit(f)

    t = chain_time(mk_sort, (state, orig, dir, tp, il, active, lane), n=6)
    print(f"_sort_wavefront:            {t*1e3:8.2f} ms/call", flush=True)

    # --- full-width shade, all active: EVERY input must vary per
    # iteration or XLA hoists the state-independent work (texture decode,
    # light setup) out of the chain and the per-call number lies low.
    ntris = max(meta.num_tris, 1)

    def perturb(sh, orig, dir, tp, tri2, hu2, hv2):
        b = (sh.state & np.uint32(1)).astype(jnp.int32)
        bf = b.astype(jnp.float32)[..., None] * 1e-6
        return (
            orig + bf,
            dir + bf,
            tp * (1.0 + bf),
            (tri2 + b) % ntris,
            hu2 + bf[:, 0] * 0.5,
            hv2 + bf[:, 0] * 0.5,
        )

    def mk_shade(n):
        def f(state, orig, dir, tp, tri2, hu2, hv2):
            acc = jnp.float32(0)
            for _ in range(n):
                sh = path_tracer._shade_bounce(
                    flat, meta, 0, state, orig, dir, tp, all_active,
                    orig, tri2, inst, hu2, hv2,
                )
                state = sh.state
                acc = acc + sh.c1.sum() + sh.c2.sum() + sh.cont_dir.sum()
                orig, dir, tp, tri2, hu2, hv2 = perturb(
                    sh, orig, dir, tp, tri2, hu2, hv2
                )
            return acc + state.astype(jnp.float32).sum()

        return jax.jit(f)

    t = chain_time(mk_shade, (state, orig, dir, tp, tri, hu, hv), n=6)
    print(f"_shade_bounce (all active): {t*1e3:8.2f} ms/call", flush=True)

    # --- blocked shade at 70% active, same perturbation discipline
    def mk_shade_blk(n):
        def f(state, orig, dir, tp, tri2, hu2, hv2):
            acc = jnp.float32(0)
            for _ in range(n):
                h = Hit(
                    t=jnp.where(active, 2.0, T_MAX),
                    tri=jnp.where(active, tri2, -1),
                    inst=jnp.where(active, inst, -1),
                    u=hu2,
                    v=hv2,
                )
                sh = path_tracer._shade_bounce_blocked(
                    flat, meta, 0, state, orig, dir, tp, active, orig, h
                )
                state = sh.state
                acc = acc + sh.c1.sum() + sh.c2.sum() + sh.cont_dir.sum()
                orig, dir, tp, tri2, hu2, hv2 = perturb(
                    sh, orig, dir, tp, tri2, hu2, hv2
                )
            return acc + state.astype(jnp.float32).sum()

        return jax.jit(f)

    t = chain_time(mk_shade_blk, (state, orig, dir, tp, tri, hu, hv), n=6)
    print(f"_shade_bounce_blocked 70%:  {t*1e3:8.2f} ms/call", flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
