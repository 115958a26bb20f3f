"""Bisect why rng_probe's chains measure ~27 ms while identical chains in
dispatch_probe measure 0.05 ms. Run the f32 fma chain FIRST (clean
process), then a u32 chain, then the fma chain again.

Usage: python -u scripts/rng_bisect.py
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
    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rngn = np.random.default_rng(9)
    R = 921600
    CH = 12
    f = jnp.asarray(rngn.uniform(1.0, 2.0, size=R).astype(np.float32))
    s = jnp.asarray(rngn.integers(0, 2**32, size=R, dtype=np.uint32))

    @jax.jit
    def fma_chain(y):
        for _ in range(CH):
            y = y * jnp.float32(1.0000001) + jnp.float32(1e-7)
        return y

    @jax.jit
    def u32_chain(x):
        for _ in range(CH):
            x = (x * jnp.uint32(1664525) + jnp.uint32(1013904223)).astype(jnp.uint32)
        return x

    print(f"fma chain (clean process): {bench(fma_chain, f):8.2f} ms", flush=True)
    print(f"u32 chain:                 {bench(u32_chain, s):8.2f} ms", flush=True)
    print(f"fma chain (after u32):     {bench(fma_chain, f):8.2f} ms", flush=True)
    print(f"u32 chain again:           {bench(u32_chain, s):8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
