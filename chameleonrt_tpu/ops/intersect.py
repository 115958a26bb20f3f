"""Ray/triangle intersection (jax, vectorized Möller–Trumbore).

The reference delegates intersection to vendor RT APIs
(rtcIntersectV / optixTrace / TraceRay / intersector<> — SURVEY.md §7). TPUs
have no RT cores, so intersection is a first-class vectorized kernel here:
batched Möller–Trumbore over triangle blocks, producing the same hit payload
the reference kernels consume (t, barycentric u/v, primitive id).

Triangles are stored SoA as (v0, e1, e2) with e1 = v1 - v0, e2 = v2 - v0; the
geometric normal is cross(e1, e2), matching Embree's Ng convention for
indexed triangles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chameleonrt_tpu.ops.math import cross, dot

# np scalar, NOT jnp: a jitted program that captures an eagerly-created
# device scalar executes ~1000x slower through the axon tunnel AND
# permanently degrades every later execution in the process to a ~26 ms
# floor (measured, scripts/capture_probe2.py). np scalars trace to
# literals and are immune.
T_MAX = np.float32(1e20)
_MT_EPS = 1e-9
# Barycentric boundary tolerance: rays aimed EXACTLY through shared edges
# and vertices land on u/v == 0 or u+v == 1, where f32 rounding in the
# (differently-based) cross products of NEIGHBORING triangles can reject
# the hit on both sides — a crack (Embree's rtcIntersectV is watertight by
# construction; tests/test_watertight.py measured 3-4% of exact edge rays
# escaping at tolerance 0). Accepting a 4e-6 band fattens every triangle
# by less than a hundredth of a pixel at any practical resolution and is
# applied IDENTICALLY in all three intersection paths (brute force, XLA
# traversal leaves, Pallas packet _mt) so cross-path parity stays exact.
# The full Woop/Benthin/Wald shear transform would make this exact but
# costs ~+40% leaf-phase math in the hot kernel (per-lane axis selects).
UV_EPS = np.float32(4e-6)


class Hit(NamedTuple):
    """Closest-hit payload for a ray wavefront."""

    t: jnp.ndarray  # (R,) float32, T_MAX when no hit
    tri: jnp.ndarray  # (R,) int32 global triangle id, -1 when no hit
    inst: jnp.ndarray  # (R,) int32 instance id, -1 when no hit
    u: jnp.ndarray  # (R,) float32 barycentric
    v: jnp.ndarray  # (R,) float32 barycentric

    @staticmethod
    def none(shape) -> "Hit":
        return Hit(
            t=jnp.full(shape, T_MAX, jnp.float32),
            tri=jnp.full(shape, -1, jnp.int32),
            inst=jnp.full(shape, -1, jnp.int32),
            u=jnp.zeros(shape, jnp.float32),
            v=jnp.zeros(shape, jnp.float32),
        )

    @property
    def hit(self):
        return self.tri >= 0

    def merge(self, other: "Hit") -> "Hit":
        """Keep the nearer of two hits per lane."""
        take = other.t < self.t
        return Hit(*(jnp.where(take, o, s) for s, o in zip(self, other)))


def moller_trumbore(orig, dir, v0, e1, e2, t_min=0.0, t_max=T_MAX):
    """Batched Möller–Trumbore: rays (..., 3) against matching-broadcast
    triangles (..., 3). Returns (hit_mask, t, u, v)."""
    pvec = cross(dir, e2)
    det = dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _MT_EPS, 1.0, det)
    tvec = orig - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(dir, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) >= _MT_EPS)
        & (u >= -UV_EPS)
        & (v >= -UV_EPS)
        & (u + v <= 1.0 + UV_EPS)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def brute_force_closest(orig, dir, v0, e1, e2, t_min=0.0, t_max=T_MAX, block=512):
    """All-pairs closest hit: rays (R, 3) vs triangles (T, 3) arrays, scanned
    in triangle blocks to bound memory. Returns (t, tri, u, v) with tri=-1 on
    miss. This is the traversal oracle that BVH traversal is tested against
    (SURVEY.md §4) and the core of the `reference` backend."""
    R = orig.shape[0]
    T = v0.shape[0]
    nblocks = (T + block - 1) // block
    pad = nblocks * block - T
    if pad:
        padv = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, padv])
        # degenerate padding triangles never hit (e1 = e2 = 0)
        e1 = jnp.concatenate([e1, padv])
        e2 = jnp.concatenate([e2, padv])
    v0b = v0.reshape(nblocks, block, 3)
    e1b = e1.reshape(nblocks, block, 3)
    e2b = e2.reshape(nblocks, block, 3)

    def scan_block(carry, tri_block):
        best_t, best_tri, best_u, best_v, base = carry
        bv0, be1, be2 = tri_block
        hit, t, u, v = moller_trumbore(
            orig[:, None, :], dir[:, None, :], bv0[None], be1[None], be2[None],
            t_min, t_max,
        )
        t = jnp.where(hit, t, T_MAX)
        arg = jnp.argmin(t, axis=1)
        rows = jnp.arange(R)
        bt = t[rows, arg]
        take = bt < best_t
        best_t = jnp.where(take, bt, best_t)
        best_tri = jnp.where(take, base + arg.astype(jnp.int32), best_tri)
        best_u = jnp.where(take, u[rows, arg], best_u)
        best_v = jnp.where(take, v[rows, arg], best_v)
        return (best_t, best_tri, best_u, best_v, base + block), None

    init = (
        jnp.full((R,), T_MAX, jnp.float32),
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.int32(0),
    )
    (best_t, best_tri, best_u, best_v, _), _ = jax.lax.scan(
        scan_block, init, (v0b, e1b, e2b)
    )
    return best_t, best_tri, best_u, best_v


def brute_force_any(orig, dir, v0, e1, e2, t_min=0.0, t_max=T_MAX, block=512):
    """All-pairs any-hit (occlusion) test: returns (R,) bool."""
    T = v0.shape[0]
    nblocks = (T + block - 1) // block
    pad = nblocks * block - T
    if pad:
        padv = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, padv])
        e1 = jnp.concatenate([e1, padv])
        e2 = jnp.concatenate([e2, padv])

    def scan_block(occluded, tri_block):
        bv0, be1, be2 = tri_block
        hit, _, _, _ = moller_trumbore(
            orig[:, None, :], dir[:, None, :], bv0[None], be1[None], be2[None],
            t_min,
            t_max if jnp.ndim(t_max) == 0 else t_max[:, None],
        )
        return occluded | jnp.any(hit, axis=1), None

    occluded, _ = jax.lax.scan(
        scan_block,
        jnp.zeros((orig.shape[0],), bool),
        (
            v0.reshape(nblocks, -1, 3),
            e1.reshape(nblocks, -1, 3),
            e2.reshape(nblocks, -1, 3),
        ),
    )
    return occluded
