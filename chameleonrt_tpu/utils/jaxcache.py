"""Persistent XLA compilation cache.

Wavefront render graphs take minutes to compile on the axon-tunneled TPU;
the cache amortizes that across processes (benchmarks, CLI runs, driver
checks). Importing this module enables it idempotently.
"""

from __future__ import annotations

import os


def enable() -> None:
    import jax

    # TPU (axon) only: on this environment CPU compiles also route through
    # the remote compile helper, and reloading its CPU AOT blobs on the
    # local host breaks ("Execution supplied 20 buffers but compiled
    # program expected 28" + machine-feature mismatch warnings). CPU
    # compiles are fast anyway; the cache only pays off for the
    # minutes-long TPU compiles.
    configured = getattr(jax.config, "jax_platforms", None) or os.environ.get(
        "JAX_PLATFORMS", ""
    )
    platform = configured.split(",")[0]
    if platform != "axon" and "CHAMELEONRT_JAX_CACHE" not in os.environ:
        return
    cache_dir = os.environ.get(
        "CHAMELEONRT_JAX_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "chameleonrt_tpu", f"xla-{platform}"
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


enable()
