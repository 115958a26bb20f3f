"""Isolate the poison: is it (a) merely CREATING an eager device scalar,
(b) running a program that captures one, or (c) np-scalar args/captures
too? Each step re-times the same compiled inline-consts fma chain.

Usage: python -u scripts/capture_probe2.py
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

    @jax.jit
    def fma_inline(y):
        for _ in range(CH):
            y = y * jnp.float32(1.0000001) + jnp.float32(1e-7)
        return y

    def probe(tag):
        print(f"fma inline [{tag:32s}]: {bench(fma_inline, f):8.2f} ms", flush=True)

    probe("clean process")

    npc_a = np.float32(1.0000001)
    npc_b = np.float32(1e-7)

    @jax.jit
    def fma_np_captured(y):
        for _ in range(CH):
            y = y * npc_a + npc_b
        return y

    print(f"fma np-scalar captures:       {bench(fma_np_captured, f):8.2f} ms", flush=True)
    probe("after np-captured run")

    @jax.jit
    def fma_arg(y, a, b):
        for _ in range(CH):
            y = y * a + b
        return y

    print(f"fma np scalars as args:       {bench(fma_arg, f, npc_a, npc_b):8.2f} ms", flush=True)
    probe("after np-args run")

    big = jnp.zeros((721, 1281, 3), jnp.float32)  # eager non-scalar creation
    jax.block_until_ready(big)
    probe("after eager jnp.zeros (big)")

    CAP = jnp.float32(1.0000001)  # eager device scalar creation only
    jax.block_until_ready(CAP)
    probe("after eager scalar CREATION")

    @jax.jit
    def fma_dev_captured(y):
        for _ in range(CH):
            y = y * CAP + jnp.float32(1e-7)
        return y

    print(f"fma dev-scalar capture run:   {bench(fma_dev_captured, f):8.2f} ms", flush=True)
    probe("after dev-captured run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
