"""The `reference` backend: brute-force pure-jax path tracer.

The correctness oracle of the framework (SURVEY.md §7 step 2) — plays the
role the Embree CPU backend plays among the reference's backends: the image
every other backend must match within Monte-Carlo noise. No acceleration
structure; every ray tests every triangle. Use on small scenes only.
"""

from __future__ import annotations

from chameleonrt_tpu.engine.backend_base import JaxRenderBackend
from chameleonrt_tpu.engine.trace_bruteforce import make_trace_fns


class ReferenceBackend(JaxRenderBackend):
    @property
    def name(self) -> str:
        return "Reference (brute-force jax)"

    def make_trace_fns(self, meta):
        return make_trace_fns(meta)
