"""Minimal repro hunt for the >1M-tri TPU traversal fault: isolated pieces
of the traversal at the failing scale (leaf table (720896, 40)), each case
in its own subprocess (a kernel fault wedges the process)."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = [
    "gather_leaf",
    "gather_node",
    "gather_leaf_64k",
    "mt_rows",
    "while_mini",
]


def child(case: str) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    r = np.random.default_rng(0)
    NL = 720_896
    R = 921_600
    leaf = jnp.asarray(r.normal(size=(NL, 40)).astype(np.float32))
    nodes = jnp.asarray(r.normal(size=(NL, 16)).astype(np.float32))
    idx = jnp.asarray(r.integers(0, NL, R).astype(np.int32))
    if case == "gather_leaf":
        out = jax.jit(lambda i: leaf[i].sum())(idx)
    elif case == "gather_node":
        out = jax.jit(lambda i: nodes[i].sum())(idx)
    elif case == "gather_leaf_64k":
        out = jax.jit(lambda i: leaf[i].sum())(idx[:65536])
    elif case == "mt_rows":
        from chameleonrt_tpu.ops.traverse import _mt_rows

        o = jnp.asarray(r.normal(size=(65536, 3)).astype(np.float32))
        d = jnp.asarray(r.normal(size=(65536, 3)).astype(np.float32))
        tmin = jnp.zeros((65536,), jnp.float32)
        tmax = jnp.full((65536,), 1e20, jnp.float32)
        out = jax.jit(
            lambda i: _mt_rows(leaf[i], 4, o, d, tmin, tmax)[1].sum()
        )(idx[:65536])
    elif case == "while_mini":
        def body(c):
            i, acc = c
            rows = leaf[jnp.clip(i, 0, NL - 1)]
            acc = acc + rows[:, 0:4].sum(axis=1)
            return i + 1, acc

        def run(i0):
            return jax.lax.while_loop(
                lambda c: jnp.any(c[0] < 40),
                body,
                (i0, jnp.zeros((65536,), jnp.float32)),
            )[1].sum()

        out = jax.jit(run)(idx[:65536] % 37)
    out = jax.block_until_ready(out)
    print(f"{case}: OK ({float(out):.3f})", flush=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1:
        return child(sys.argv[1])
    for case in CASES:
        r = subprocess.run(
            [sys.executable, "-u", __file__, case],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        print(r.stdout, end="", flush=True)
        if r.returncode != 0:
            tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-3:])
            print(f"{case}: FAILED rc={r.returncode}\n{tail}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
