"""Test: do jitted functions that CAPTURE eagerly-created device scalars
(e.g. module-level jnp.uint32 constants, as ops/rng.py has) execute ~3
orders of magnitude slower through the axon tunnel than ones using inline
literals?

Usage: python -u scripts/capture_probe.py
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
    def fma_inline(y):
        for _ in range(CH):
            y = y * jnp.float32(1.0000001) + jnp.float32(1e-7)
        return y

    print(f"1 fma inline consts:          {bench(fma_inline, f):8.2f} ms", flush=True)

    CAP_A = jnp.float32(1.0000001)  # eager -> device scalar
    CAP_B = jnp.float32(1e-7)

    @jax.jit
    def fma_captured(y):
        for _ in range(CH):
            y = y * CAP_A + CAP_B
        return y

    print(f"2 fma captured dev scalars:   {bench(fma_captured, f):8.2f} ms", flush=True)
    print(f"3 fma inline again:           {bench(fma_inline, f):8.2f} ms", flush=True)

    UMUL = jnp.uint32(1664525)
    UADD = jnp.uint32(1013904223)

    @jax.jit
    def u32_captured(x):
        for _ in range(CH):
            x = (x * UMUL + UADD).astype(jnp.uint32)
        return x

    print(f"4 u32 captured dev scalars:   {bench(u32_captured, x=s) if False else bench(u32_captured, s):8.2f} ms", flush=True)

    from chameleonrt_tpu.ops import rng as rng_ops

    @jax.jit
    def lcg3(x):
        x, _ = rng_ops.lcg_randomf(x)
        x, _ = rng_ops.lcg_randomf(x)
        x, ab = rng_ops.lcg_randomf2(x)
        return ab

    print(f"5 ops.rng lcg draws (module consts): {bench(lcg3, s):8.2f} ms", flush=True)

    # workaround check: pass the scalars as ARGUMENTS instead of captures
    @jax.jit
    def fma_arg(y, a, b):
        for _ in range(CH):
            y = y * a + b
        return y

    print(f"6 fma scalars as args:        {bench(fma_arg, f, CAP_A, CAP_B):8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
