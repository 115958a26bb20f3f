"""Bisect the table-size threshold of the >1M-tri gather fault: one
R-row gather from an (N, 40) leaf table per subprocess, increasing N.
A case that exceeds its timeout is recorded HANG (the fault wedges the
process; the chip itself recovers once the process dies).

Usage: python -u scripts/gather_size_probe.py            # driver
       python -u scripts/gather_size_probe.py <N> [R]    # one case
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [65_536, 131_072, 262_144, 524_288, 720_896, 1_048_576]


def child(n: int, r: int) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    leaf = jnp.asarray(rng.normal(size=(n, 40)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, r).astype(np.int32))
    f = jax.jit(lambda i: leaf[i].sum())
    out = jax.block_until_ready(f(idx))  # compile + run
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(idx))
    dt = (time.perf_counter() - t0) * 1e3
    print(f"N={n} R={r}: OK {dt:.1f} ms ({float(out):.3f})", flush=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1:
        n = int(sys.argv[1])
        r = int(sys.argv[2]) if len(sys.argv) > 2 else 921_600
        return child(n, r)
    for n in SIZES:
        t0 = time.perf_counter()
        try:
            res = subprocess.run(
                [sys.executable, "-u", __file__, str(n)],
                capture_output=True,
                text=True,
                timeout=420,
            )
            print(res.stdout, end="", flush=True)
            if res.returncode != 0:
                tail = "\n".join((res.stdout + res.stderr).strip().splitlines()[-3:])
                print(f"N={n}: FAILED rc={res.returncode}\n{tail}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"N={n}: HANG (> 420 s, killed)", flush=True)
        print(f"  [case wall {time.perf_counter()-t0:.0f}s]", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
