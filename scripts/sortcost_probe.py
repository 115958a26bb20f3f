"""Time the per-bounce wavefront sort in isolation at bench width: the
key computation, the argsort alone, and the full _sort_wavefront
(pack + perm + (R,16) row gather + unpack). The frame pays this 5x per
frame; scripts/shade_probe.py shows the traversal-stubbed frame costs
~70 ns/ray/bounce, far above the measured cost of the shading math
(scripts/bsdf_probe.py: 0.2 ms), so this probe pins how much of that is
the sort.

Usage: python -u scripts/sortcost_probe.py [W] [H]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401


def bench(fn, *args, n=5):
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
    from chameleonrt_tpu.ops.traverse import ray_sort_perm_only

    R = W * H
    print(f"device={jax.devices()[0].device_kind} R={R}", flush=True)

    rngn = np.random.default_rng(7)
    orig = jnp.asarray(rngn.uniform(-5, 5, size=(R, 3)).astype(np.float32))
    d = rngn.normal(size=(R, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-6)
    dir = jnp.asarray(d)
    active = jnp.asarray(rngn.uniform(size=R) < 0.7)
    state = jnp.asarray(rngn.integers(0, 2**32, size=R, dtype=np.uint32))
    tp = jnp.ones((R, 3), jnp.float32)
    il = jnp.zeros((R, 3), jnp.float32)
    lane = jnp.arange(R, dtype=jnp.int32)

    keys = jnp.asarray(rngn.integers(0, 2**31, size=R, dtype=np.uint32))

    f_argsort = jax.jit(jnp.argsort)
    print(f"argsort (random u32 keys):   {bench(f_argsort, keys):8.2f} ms", flush=True)

    f_sortv = jax.jit(lambda k: jnp.sort(k))
    print(f"sort values only:            {bench(f_sortv, keys):8.2f} ms", flush=True)

    f_perm = jax.jit(ray_sort_perm_only)
    print(f"ray_sort_perm_only:          {bench(f_perm, orig, dir, active):8.2f} ms", flush=True)

    perm = f_perm(orig, dir, active)
    f_gather = jax.jit(lambda x, p: x[p])
    packed = jnp.zeros((R, 16), jnp.int32)
    print(f"(R,16) row gather:           {bench(f_gather, packed, perm):8.2f} ms", flush=True)

    f_full = jax.jit(path_tracer._sort_wavefront)
    print(
        f"_sort_wavefront (full):      {bench(f_full, state, orig, dir, tp, il, active, lane):8.2f} ms",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
