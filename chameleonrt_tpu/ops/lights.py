"""Quad light sampling (jax).

Vectorized equivalents of the quad-light functions every reference backend
replicates (backends/embree/lights.ih:26-69). Behavioral quirks of the
reference are preserved deliberately — the cross-implementation image oracle
depends on them (notably quad_light_pdf computing the squared distance from
``p - dir`` rather than ``p - orig``, lights.ih:42, replicated in all seven
backends).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from chameleonrt_tpu.ops.math import EPSILON, dot


class LightArrays(NamedTuple):
    """SoA quad-light table: leading dim is the light index; after a gather
    the leading dims are ray-batch dims."""

    emission: jnp.ndarray  # (..., 3)
    position: jnp.ndarray  # (..., 3)
    normal: jnp.ndarray  # (..., 3)
    v_x: jnp.ndarray  # (..., 3)
    v_y: jnp.ndarray  # (..., 3)
    width: jnp.ndarray  # (...,)
    height: jnp.ndarray  # (...,)

    @staticmethod
    def from_scene_lights(lights) -> "LightArrays":
        import numpy as np

        return LightArrays(
            emission=jnp.asarray(np.stack([l.emission for l in lights])),
            position=jnp.asarray(np.stack([l.position for l in lights])),
            normal=jnp.asarray(np.stack([l.normal for l in lights])),
            v_x=jnp.asarray(np.stack([l.v_x for l in lights])),
            v_y=jnp.asarray(np.stack([l.v_y for l in lights])),
            width=jnp.asarray(np.array([l.width for l in lights], np.float32)),
            height=jnp.asarray(np.array([l.height for l in lights], np.float32)),
        )

    def gather(self, idx) -> "LightArrays":
        """Select one light per lane."""
        return LightArrays(*(f[idx] for f in self))


def sample_quad_light_position(light: LightArrays, samples):
    """Point on the quad for uniform samples in [0,1]^2
    (reference lights.ih:26-30)."""
    return (
        samples[..., 0:1] * light.v_x * light.width[..., None]
        + samples[..., 1:2] * light.v_y * light.height[..., None]
        + light.position
    )


def quad_light_pdf(light: LightArrays, p, orig, dir):
    """Solid-angle pdf of having sampled point p on the light from orig along
    dir (reference lights.ih:35-48, including its ``p - dir`` distance
    computation). ``orig`` is accepted for signature parity."""
    del orig
    surface_area = light.width * light.height
    to_pt = p - dir
    dist_sqr = dot(to_pt, to_pt)
    n_dot_w = dot(light.normal, -dir)
    pdf = dist_sqr / jnp.maximum(n_dot_w * surface_area, 1e-20)
    return jnp.where(n_dot_w < EPSILON, 0.0, pdf)


def quad_intersect(light: LightArrays, orig, dir):
    """Ray/quad intersection (reference lights.ih:50-69). Returns
    (hit mask, t, light_pos). The reference's half-extent convention
    (|dot(hit_v, v_x)| < width) is preserved."""
    denom = dot(dir, light.normal)
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    t = dot(light.position - orig, light.normal) / denom_safe
    light_pos = orig + dir * t[..., None]
    hit_v = light_pos - light.position
    inside = (jnp.abs(dot(hit_v, light.v_x)) < light.width) & (
        jnp.abs(dot(hit_v, light.v_y)) < light.height
    )
    hit = (denom != 0.0) & (t >= 0.0) & inside
    return hit, t, light_pos
