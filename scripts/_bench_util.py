"""Honest TPU timing on the tunneled device.

jax.block_until_ready in a timing loop does NOT wait on this runtime's
tunnel (verified: 30 chained 4096^3 matmuls "complete" in 0.05 ms; a
host fetch of the same result takes 54 ms). Only host fetches
(np.asarray / int()) round-trip and drain the device queue, and each
fetch pays a ~30 ms tunnel RTT.

chain_time cancels both effects: build a jitted function that runs the
stage N times with a data dependency between iterations, fetch one
scalar from the result, and report (t_N - t_1) / (N - 1). The RTT, the
dispatch overhead, and any one-time costs subtract out.
"""

from __future__ import annotations

import time

import numpy as np


def fetch_scalar(out):
    """Force completion by pulling one scalar to the host."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    arr = np.asarray(leaf)
    return arr.ravel()[:1]


def _timed(fn, args, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch_scalar(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_time(make_chain, args, n=8, reps=3, warm=True):
    """Per-iteration seconds of a stage.

    make_chain(n) must return a jitted callable running the stage n
    times with a data dependency between iterations (so the tunnel
    cannot overlap or elide them) and returning something fetchable.
    """
    f1 = make_chain(1)
    fn = make_chain(n)
    if warm:
        fetch_scalar(f1(*args))
        fetch_scalar(fn(*args))
    t1 = _timed(f1, args, reps)
    tn = _timed(fn, args, reps)
    return max(tn - t1, 0.0) / (n - 1)
