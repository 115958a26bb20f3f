"""Persistent XLA compilation cache.

Wavefront render graphs take minutes to compile on the axon-tunneled TPU;
the cache amortizes that across processes (benchmarks, CLI runs, driver
checks). Importing this module enables it idempotently.
"""

from __future__ import annotations

import os


def enable() -> None:
    import jax

    cache_dir = os.environ.get(
        "CHAMELEONRT_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "chameleonrt_tpu", "xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


enable()
