"""Per-pixel LCG random number generation (jax, uint32).

Matches the reference scheme exactly so images agree sample-for-sample with
the Embree backend (backends/embree/lcg_rng.ih:8-59): a murmurhash3-style
seed from (pixel_id, frame_id) followed by the Numerical-Recipes 32-bit LCG.
State is a batched uint32 array threaded functionally through the wavefront.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# np scalars, NOT jnp: a jitted program that captures an eagerly-created
# device scalar runs ~1000x slower through the axon tunnel and degrades
# every later execution in the process (scripts/capture_probe2.py). These
# constants are captured by every RNG draw in the render graph.
_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_M = np.uint32(5)
_N = np.uint32(0xE6546B64)

_LCG_MUL = np.uint32(1664525)
_LCG_ADD = np.uint32(1013904223)


def _rotl(x, r):
    r = np.uint32(r)
    return (x << r) | (x >> (np.uint32(32) - r))


def murmur_hash3_mix(hash_, k):
    """One murmur3 mix round (reference lcg_rng.ih:8-25)."""
    k = (k * _C1).astype(jnp.uint32)
    k = _rotl(k, 15)
    k = (k * _C2).astype(jnp.uint32)
    h = hash_ ^ k
    h = (_rotl(h, 13) * _M + _N).astype(jnp.uint32)
    return h


def murmur_hash3_finalize(h):
    """murmur3 avalanche finalizer (reference lcg_rng.ih:27-36)."""
    h = h ^ (h >> np.uint32(16))
    h = (h * np.uint32(0x85EBCA6B)).astype(jnp.uint32)
    h = h ^ (h >> np.uint32(13))
    h = (h * np.uint32(0xC2B2AE35)).astype(jnp.uint32)
    h = h ^ (h >> np.uint32(16))
    return h


def get_rng(pixel_id, frame_id):
    """Seed an LCG state per lane (reference lcg_rng.ih:51-59):
    murmur-mix in the pixel id then the frame id, then finalize."""
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    frame_id = jnp.asarray(frame_id, jnp.uint32)
    state = murmur_hash3_mix(jnp.zeros_like(pixel_id), pixel_id)
    state = murmur_hash3_mix(state, frame_id)
    return murmur_hash3_finalize(state)


def lcg_random(state):
    """Advance the LCG (reference lcg_rng.ih:38-44). Returns (new_state,
    raw uint32 draw == new_state)."""
    state = (state * _LCG_MUL + _LCG_ADD).astype(jnp.uint32)
    return state, state


def lcg_randomf(state):
    """Uniform float in [0, 1] (reference lcg_rng.ih:46-49 uses
    ldexp(float(u32), -32), which rounds u32 to float first — can hit exactly
    1.0; downstream users clamp, so we preserve that behavior). Returns
    (new_state, float32 draw)."""
    state, bits = lcg_random(state)
    return state, bits.astype(jnp.float32) * np.float32(2.0**-32)


def lcg_randomf2(state):
    """Two consecutive uniform draws, returned as (state, (..., 2) array)."""
    state, a = lcg_randomf(state)
    state, b = lcg_randomf(state)
    return state, jnp.stack([a, b], axis=-1)
