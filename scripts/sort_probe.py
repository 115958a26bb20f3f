"""Microbenchmark: sorting/permutation primitives for ray reordering.

Decides whether between-bounce ray sorting (direction octant + origin
Morton) is affordable on v5e: argsort on uint32 keys, row gathers by the
permutation, and scatter of results back.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    r = np.random.default_rng(0)

    def bench(name, fn, *args, n=5):
        out = jax.block_until_ready(jax.jit(fn)(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = jax.block_until_ready(jax.jit(fn)(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:8.2f} ms", flush=True)
        return out

    for N in (921_600, 1_843_200):
        keys = jnp.asarray(r.integers(0, 2**31, N, dtype=np.int64).astype(np.uint32))
        rows = jnp.asarray(r.normal(size=(N, 8)).astype(np.float32))
        vals = jnp.asarray(r.normal(size=(N,)).astype(np.float32))
        print(f"--- N={N}", flush=True)
        perm = bench("argsort u32", lambda k: jnp.argsort(k), keys)
        bench("sort u32 (keys only)", lambda k: jnp.sort(k), keys)
        bench("gather rows (N,8) by perm", lambda p, x: x[p], perm, rows)
        bench("gather vals (N,) by perm", lambda p, x: x[p], perm, vals)
        bench(
            "inv perm via scatter iota",
            lambda p: jnp.zeros((N,), jnp.int32).at[p].set(jnp.arange(N, dtype=jnp.int32)),
            perm,
        )
        bench(
            "scatter vals by perm",
            lambda p, v: jnp.zeros((N,), jnp.float32).at[p].set(v),
            perm,
            vals,
        )
        # cheaper alternative: 8-bucket stable partition via one cumsum
        bench(
            "bucket partition (8) via argsort of 3-bit key",
            lambda k: jnp.argsort(k >> np.uint32(29)),
            keys,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
