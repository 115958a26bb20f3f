"""Pin down the per-execution floor on the axon tunnel: time trivial and
non-trivial jitted calls at several shapes/chain lengths in one process.

Usage: python -u scripts/dispatch_probe.py
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
    return min(ts) * 1e3, sorted(ts)[len(ts) // 2] * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rngn = np.random.default_rng(1)

    for R in (128, 921600):
        x = jnp.asarray(rngn.uniform(1, 2, size=R).astype(np.float32))

        @jax.jit
        def add1(v):
            return v + 1.0

        mn, md = bench(add1, x)
        print(f"R={R:7d} x+1:        min {mn:7.2f} ms  med {md:7.2f} ms", flush=True)

        for CH in (1, 12, 96):

            @jax.jit
            def fma_chain(v, _CH=CH):
                for i in range(_CH):
                    v = v * jnp.float32(1.0000001) + jnp.float32(1e-7)
                return v

            mn, md = bench(fma_chain, x)
            print(
                f"R={R:7d} fma x{CH:3d}:   min {mn:7.2f} ms  med {md:7.2f} ms",
                flush=True,
            )

    # two outputs vs one
    x = jnp.asarray(rngn.uniform(1, 2, size=921600).astype(np.float32))

    @jax.jit
    def two_out(v):
        return v + 1.0, v * 2.0

    mn, md = bench(two_out, x)
    print(f"two outputs:           min {mn:7.2f} ms  med {md:7.2f} ms", flush=True)

    # a transcendental-heavy body (like disney): many fused elementwise ops
    @jax.jit
    def heavy(v):
        y = v
        for _ in range(8):
            y = jnp.sqrt(jnp.abs(y) + 1.0) * 1.1 + jnp.exp(-y)
        return y

    mn, md = bench(heavy, x)
    print(f"heavy transcendental:  min {mn:7.2f} ms  med {md:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
