"""Why is the LCG ~9 ms/draw at 921K lanes on v5e when the full Disney
BSDF eval is 0.1 ms? Microbench the integer ops the RNG uses (u32
multiply, shifts/xors, u32<->f32 converts) against an exact float-digit
reformulation of the same LCG (3x11-bit digits, all products exact in
f32). Each variant runs a CHAIN of steps so per-dispatch overhead
amortizes.

Usage: python -u scripts/rng_probe.py [R] [chain]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401

A = 1664525
C = 1013904223
B = 2048  # 11-bit digit base


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
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 921600
    CH = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0].device_kind} R={R} chain={CH}", flush=True)
    rngn = np.random.default_rng(9)
    s_np = rngn.integers(0, 2**32, size=R, dtype=np.uint32)
    s = jnp.asarray(s_np)
    f = jnp.asarray(rngn.uniform(1.0, 2.0, size=R).astype(np.float32))

    MUL = jnp.uint32(A)
    ADD = jnp.uint32(C)

    @jax.jit
    def u32_lcg_chain(x):
        for _ in range(CH):
            x = (x * MUL + ADD).astype(jnp.uint32)
        return x

    @jax.jit
    def u32_shift_xor_chain(x):
        for _ in range(CH):
            x = x ^ (x >> jnp.uint32(16))
            x = (x + jnp.uint32(0x9E3779B9)).astype(jnp.uint32)
            x = x ^ (x << jnp.uint32(5))
        return x

    @jax.jit
    def u32_to_f32_chain(x):
        acc = jnp.float32(0)
        for i in range(CH):
            acc = acc + (x + jnp.uint32(i)).astype(jnp.float32)
        return acc

    @jax.jit
    def f32_to_u32_chain(y):
        acc = jnp.uint32(0)
        for i in range(CH):
            acc = acc ^ (y * jnp.float32(1e9) + jnp.float32(i)).astype(jnp.uint32)
        return acc

    @jax.jit
    def f32_fma_chain(y):
        for _ in range(CH):
            y = y * jnp.float32(1.0000001) + jnp.float32(1e-7)
        return y

    # exact float-digit LCG: state = (s0,s1,s2) f32 digits, base 2048
    # (11+11+10 bits). All partial products <= 2^23 -> exact in f32.
    a0, a1 = A % B, A // B  # A < 2^22
    c0, c1, c2 = C % B, (C // B) % B, C // (B * B)

    def digit_lcg(d0, d1, d2):
        t0 = d0 * a0 + c0
        t1 = d1 * a0 + d0 * a1 + c1
        t2 = d2 * a0 + d1 * a1 + c2
        q0 = jnp.floor(t0 * (1.0 / B))
        d0n = t0 - q0 * B
        t1 = t1 + q0
        q1 = jnp.floor(t1 * (1.0 / B))
        d1n = t1 - q1 * B
        t2 = t2 + q1
        # top digit keeps 10 bits (32 = 11 + 11 + 10)
        d2n = t2 - jnp.floor(t2 * (1.0 / 1024.0)) * 1024.0
        return d0n, d1n, d2n

    @jax.jit
    def digit_lcg_chain(d0, d1, d2):
        for _ in range(CH):
            d0, d1, d2 = digit_lcg(d0, d1, d2)
        # uniform float: single rounding, same as float(u32)*2^-32
        return (d2 * (B * B) + d1 * B + d0) * jnp.float32(2.0**-32)

    d0 = jnp.asarray((s_np % B).astype(np.float32))
    d1 = jnp.asarray(((s_np // B) % B).astype(np.float32))
    d2 = jnp.asarray((s_np // (B * B)).astype(np.float32))

    for name, fn, args in [
        ("u32 LCG chain", u32_lcg_chain, (s,)),
        ("u32 shift/xor/add chain", u32_shift_xor_chain, (s,)),
        ("u32->f32 convert chain", u32_to_f32_chain, (s,)),
        ("f32->u32 convert chain", f32_to_u32_chain, (f,)),
        ("f32 fma chain", f32_fma_chain, (f,)),
        ("digit LCG chain (f32)", digit_lcg_chain, (d0, d1, d2)),
    ]:
        t = bench(fn, *args)
        print(f"{name:28s} {t:8.2f} ms  ({t / CH * 1e3:7.1f} us/step)", flush=True)

    # correctness: digit LCG == u32 LCG bit-for-bit over the chain
    want = s_np.copy()
    for _ in range(CH):
        want = (want * np.uint32(A) + np.uint32(C)).astype(np.uint32)
    got_f = np.asarray(digit_lcg_chain(d0, d1, d2))
    want_f = (want.astype(np.float32) * np.float32(2.0**-32)).astype(np.float32)
    print(
        f"digit-LCG uniform matches u32 LCG: {np.array_equal(got_f, want_f)}"
        f" (maxdiff {np.abs(got_f - want_f).max():.3e})",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
