"""Backend plugin registry.

The reference loads backends as dlopen'd shared libraries resolved by name
(crt_<backend>, /root/reference/util/render_plugin.cpp:14-59). The TPU-native
equivalent is a name -> factory registry with lazy imports, so adding a
backend is registering one more entry against the same seam.
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict

from chameleonrt_tpu.core.backend import RenderBackend

_REGISTRY: Dict[str, Callable[..., RenderBackend]] = {}

# Built-in backends: name -> "module:attribute", imported on first use.
_BUILTIN = {
    # The correctness oracle: brute-force pure-jax path tracer (plays the
    # role of the reference's Embree CPU backend).
    "reference": "chameleonrt_tpu.engine.backend_reference:ReferenceBackend",
    # The flagship: wavefront path tracer with LBVH + vectorized traversal.
    "tpu": "chameleonrt_tpu.engine.backend_tpu:TpuBackend",
}


def register_backend(name: str, factory: Callable[..., RenderBackend]) -> None:
    _REGISTRY[name] = factory


def list_backends():
    return sorted(set(_BUILTIN) | set(_REGISTRY))


def get_backend(name: str, **kwargs) -> RenderBackend:
    """Instantiate a backend by name (the `crt_<name>` plugin-loading seam)."""
    if name in _REGISTRY:
        return _REGISTRY[name](**kwargs)
    if name in _BUILTIN:
        module_name, _, attr = _BUILTIN[name].partition(":")
        module = importlib.import_module(module_name)
        factory = getattr(module, attr)
        register_backend(name, factory)
        return factory(**kwargs)
    raise ValueError(
        f"Unknown render backend '{name}'. Available: {', '.join(list_backends())}"
    )
