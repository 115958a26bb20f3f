"""Vectorized math kernel library (jax).

Branchless re-designs of the per-lane helpers every reference backend
replicates in its shader language (backends/embree/util.ih, float3.ih):
all functions operate on batched (..., 3) float32 arrays so they map onto the
TPU VPU as wide elementwise ops instead of per-ray scalar code.
"""

from __future__ import annotations

import jax.numpy as jnp

M_PI = 3.14159265358979323846
M_1_PI = 0.318309886183790671538
EPSILON = 1e-4  # reference backends/embree/util.ih:8
MAX_PATH_DEPTH = 5  # reference backends/embree/util.ih:10


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v, eps: float = 1e-20):
    return v / jnp.sqrt(jnp.maximum(dot(v, v), eps))[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def luminance(c):
    """Rec.709 luminance (reference backends/embree/util.ih:24-26)."""
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def lerp(x, y, s):
    return x * (1.0 - s) + y * s


def sqr(x):
    return x * x


def reflect(i, n):
    """Mirror direction (reference backends/embree/util.ih:71-73)."""
    return i - 2.0 * n * dot(i, n)[..., None]


def refract(i, n, eta):
    """Refraction; returns 0 on total internal reflection
    (reference backends/embree/util.ih:75-82)."""
    n_dot_i = dot(n, i)
    k = 1.0 - eta * eta * (1.0 - n_dot_i * n_dot_i)
    tir = k < 0.0
    k = jnp.maximum(k, 0.0)
    out = eta[..., None] * i - (eta * n_dot_i + jnp.sqrt(k))[..., None] * n
    return jnp.where(tir[..., None], 0.0, out)


def ortho_basis(n):
    """Right-handed orthonormal basis around n
    (reference backends/embree/util.ih:32-46): pick the axis helper by the
    first component of n smaller than 0.6 in magnitude, then a double cross
    product.

    Returns (v_x, v_y) with v_x = normalize(cross(v_y0, n)),
    v_y = normalize(cross(n, v_x)).
    """
    ax = jnp.abs(n[..., 0]) < 0.6
    ay = jnp.abs(n[..., 1]) < 0.6
    az = jnp.abs(n[..., 2]) < 0.6
    # helper axis selection with the reference's if/elif/else priority
    hx = ax | (~ax & ~ay & ~az)
    hy = ~ax & ay
    hz = ~ax & ~ay & az
    v_y0 = jnp.stack(
        [hx.astype(n.dtype), hy.astype(n.dtype), hz.astype(n.dtype)], axis=-1
    )
    v_x = normalize(cross(v_y0, n))
    v_y = normalize(cross(n, v_x))
    return v_x, v_y


def power_heuristic(n_f, pdf_f, n_g, pdf_g):
    """Veach power heuristic, beta=2
    (reference backends/embree/disney_bsdf.ih:68-72)."""
    f = n_f * pdf_f
    g = n_g * pdf_g
    return sqr(f) / jnp.maximum(sqr(f) + sqr(g), 1e-20)


def linear_to_srgb(x):
    """linear -> sRGB transfer curve (reference backends/embree/util.ih:17-22)."""
    x = jnp.maximum(x, 0.0)
    return jnp.where(
        x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(jnp.maximum(x, 1e-10), 1.0 / 2.4) - 0.055
    )


def srgb_to_linear(x):
    x = jnp.maximum(x, 0.0)
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def transform_point(mat, p):
    """Apply a 4x4 transform (glm convention, column vectors) to points.
    mat: (..., 4, 4); p: (..., 3)."""
    return jnp.einsum("...ij,...j->...i", mat[..., :3, :3], p) + mat[..., :3, 3]


def transform_vector(mat, v):
    return jnp.einsum("...ij,...j->...i", mat[..., :3, :3], v)
