"""Framebuffer tonemap: linear accumulation buffer -> sRGB8 image
(reference backends/embree/render_embree.ispc:358-370 tile_to_uint8)."""

from __future__ import annotations

import jax.numpy as jnp

from chameleonrt_tpu.ops.math import linear_to_srgb


def linear_to_srgb_u8(accum):
    """(H, W, 3) float32 linear -> (H, W, 4) uint8 sRGB with opaque alpha."""
    srgb = jnp.clip(linear_to_srgb(accum), 0.0, 1.0)
    rgb8 = (srgb * 255.0 + 0.5).astype(jnp.uint8)
    alpha = jnp.full(rgb8.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb8, alpha], axis=-1)
