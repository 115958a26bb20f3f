"""Perspective camera ray generation (jax).

Mirrors the reference's ViewParams construction
(backends/embree/render_embree.cpp:149-159) and jittered primary-ray setup
(backends/embree/render_embree.ispc:216-229).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from chameleonrt_tpu.ops import rng
from chameleonrt_tpu.ops.math import normalize


class ViewParams(NamedTuple):
    pos: jnp.ndarray  # (3,)
    dir_du: jnp.ndarray  # (3,)
    dir_dv: jnp.ndarray  # (3,)
    dir_top_left: jnp.ndarray  # (3,)


def compute_view_params(pos, dir, up, fov_y_deg, fb_width, fb_height) -> ViewParams:
    """dir_du/dir_dv/dir_top_left from eye/dir/up/fovy + aspect
    (reference render_embree.cpp:149-159). Host-side numpy: tiny and reused
    across the whole frame."""
    pos = np.asarray(pos, np.float32)
    dir = np.asarray(dir, np.float32)
    dir = dir / np.linalg.norm(dir)
    up = np.asarray(up, np.float32)
    img_y = 2.0 * np.tan(np.radians(0.5 * fov_y_deg))
    img_x = img_y * float(fb_width) / float(fb_height)
    du = np.cross(dir, up)
    du = du / np.linalg.norm(du) * img_x
    dv = np.cross(du, dir)
    dv = -dv / np.linalg.norm(dv) * img_y
    top_left = dir - 0.5 * du - 0.5 * dv
    # np leaves, not eager device arrays: tiny eagerly-created device
    # buffers fed to jitted programs risk the axon tunnel's degraded
    # ~26 ms/execution mode (scripts/capture_probe2.py); np arrays upload
    # at call time like any other argument.
    return ViewParams(
        pos=pos,
        dir_du=du.astype(np.float32),
        dir_dv=dv.astype(np.float32),
        dir_top_left=top_left.astype(np.float32),
    )


def generate_primary_rays(view: ViewParams, pixel_x, pixel_y, fb_width, fb_height, rng_state):
    """Jittered primary rays for integer pixel coords
    (reference render_embree.ispc:216-229). Consumes two RNG draws per lane
    in the same order as the reference. Returns (rng_state, origin, dir)."""
    rng_state, jx = rng.lcg_randomf(rng_state)
    rng_state, jy = rng.lcg_randomf(rng_state)
    px = (pixel_x.astype(jnp.float32) + jx) / fb_width
    py = (pixel_y.astype(jnp.float32) + jy) / fb_height
    d = normalize(
        px[..., None] * view.dir_du + py[..., None] * view.dir_dv + view.dir_top_left
    )
    origin = jnp.broadcast_to(view.pos, d.shape)
    return rng_state, origin, d


def miss_shader(dir):
    """Checkerboard environment deliberately identical across all reference
    backends as the cross-implementation test oracle
    (backends/embree/render_embree.ispc:183-196)."""
    u = (1.0 + jnp.arctan2(dir[..., 0], -dir[..., 2]) * (1.0 / jnp.pi)) * 0.5
    v = jnp.arccos(jnp.clip(dir[..., 1], -1.0, 1.0)) * (1.0 / jnp.pi)
    check_x = (u * 10.0).astype(jnp.int32)
    check_y = (v * 10.0).astype(jnp.int32)
    bright = (dir[..., 1] > -0.1) & (((check_x + check_y) % 2) == 0)
    val = jnp.where(bright, 0.5, 0.1)
    return jnp.broadcast_to(val[..., None], val.shape + (3,))
