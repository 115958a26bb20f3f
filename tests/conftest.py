"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

The environment preloads the axon TPU PJRT plugin via sitecustomize and
pins JAX_PLATFORMS=axon before any of our code runs, so plain env-var
edits are too late; jax.config.update still works because backends
initialize lazily. Benchmarks (bench.py) use the real chip."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
