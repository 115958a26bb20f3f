"""Texture atlas sampling (jax).

All scene textures are packed into one flat RGBA float32 atlas on device;
per-texture rows of a (N, 3) int32 table carry (texel offset, width, height).
Sampling is software bilinear with wrap addressing, the vectorized equivalent
of the reference's CPU texture unit (backends/embree/texture2d.ih:39-83),
expressed as 4 HBM gathers per lookup. Material parameters that carry texture
handles (util/texture_channel_mask.h) are decoded bitwise on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TextureAtlas(NamedTuple):
    atlas: jnp.ndarray  # (P, 4) float32 texels (linearized color space)
    table: jnp.ndarray  # (N, 3) int32: offset, width, height

    @property
    def num_textures(self) -> int:
        return self.table.shape[0]

    @staticmethod
    def empty() -> "TextureAtlas":
        return TextureAtlas(
            atlas=jnp.zeros((1, 4), jnp.float32),
            table=jnp.ones((1, 3), jnp.int32),
        )


def _wrap(x, n):
    """Positive wrap (reference texture2d.ih:32-37 + util.ih mod)."""
    return jnp.mod(x, jnp.maximum(n, 1))


def _bilinear_setup(atlas: TextureAtlas, tex_id, uv):
    """Shared bilinear footprint computation (reference texture2d.ih:39-49):
    returns (idx00, idx10, idx01, idx11, tx, ty) flat atlas indices + weights."""
    tex_id = jnp.clip(tex_id, 0, atlas.table.shape[0] - 1)
    rec = atlas.table[tex_id]  # (..., 3)
    off, w, h = rec[..., 0], rec[..., 1], rec[..., 2]
    ux = uv[..., 0] * w.astype(jnp.float32) - 0.5
    uy = uv[..., 1] * h.astype(jnp.float32) - 0.5
    tx = ux - jnp.floor(ux)
    ty = uy - jnp.floor(uy)
    # The reference converts the float coordinate with C truncation before
    # wrapping (texture2d.ih:46: get_wrapped_texcoord takes int x).
    xi = ux.astype(jnp.int32)
    yi = uy.astype(jnp.int32)
    x0 = _wrap(xi, w)
    x1 = _wrap(xi + 1, w)
    y0 = _wrap(yi, h)
    y1 = _wrap(yi + 1, h)
    idx00 = off + y0 * w + x0
    idx10 = off + y0 * w + x1
    idx01 = off + y1 * w + x0
    idx11 = off + y1 * w + x1
    return idx00, idx10, idx01, idx11, tx, ty


def sample_rgb(atlas: TextureAtlas, tex_id, uv):
    """Bilinear RGB fetch (reference texture2d.ih:39-60). Returns (..., 3)."""
    i00, i10, i01, i11, tx, ty = _bilinear_setup(atlas, tex_id, uv)
    a = atlas.atlas
    s00 = a[i00, :3]
    s10 = a[i10, :3]
    s01 = a[i01, :3]
    s11 = a[i11, :3]
    tx = tx[..., None]
    ty = ty[..., None]
    return (
        s00 * (1.0 - tx) * (1.0 - ty)
        + s10 * tx * (1.0 - ty)
        + s01 * (1.0 - tx) * ty
        + s11 * tx * ty
    )


def sample_channel(atlas: TextureAtlas, tex_id, channel, uv):
    """Bilinear single-channel fetch (reference texture2d.ih:62-83).

    The channel select is a one-hot reduction over full gathered rows, NOT
    a per-lane minor-dim fancy index `a[idx, ch]`: per-lane minor-dim
    dynamic indexing is the pattern class that relayouts (~1 ms/op) and
    faults the v5e/axon compiler at scale (docs/ARCHITECTURE.md)."""
    i00, i10, i01, i11, tx, ty = _bilinear_setup(atlas, tex_id, uv)
    a = atlas.atlas
    onehot = (
        jnp.arange(4, dtype=jnp.int32) == jnp.clip(channel, 0, 3)[..., None]
    ).astype(jnp.float32)

    def fetch(i):
        return jnp.sum(a[i] * onehot, axis=-1)

    return (
        fetch(i00) * (1.0 - tx) * (1.0 - ty)
        + fetch(i10) * tx * (1.0 - ty)
        + fetch(i01) * (1.0 - tx) * ty
        + fetch(i11) * tx * ty
    )


def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def is_textured(bits_u32):
    return (bits_u32 & jnp.uint32(0x80000000)) != 0


def tex_id_of(bits_u32):
    return (bits_u32 & jnp.uint32(0x1FFFFFFF)).astype(jnp.int32)


def tex_channel_of(bits_u32):
    return ((bits_u32 >> jnp.uint32(29)) & jnp.uint32(0x3)).astype(jnp.int32)


def textured_scalar_param(atlas: TextureAtlas, x, uv):
    """Scalar param that may be a texture handle
    (reference render_embree.ispc:66-77)."""
    bits = _bits(x)
    handle = is_textured(bits)
    fetched = sample_channel(atlas, tex_id_of(bits), tex_channel_of(bits), uv)
    return jnp.where(handle, fetched, x)


def textured_color_param(atlas: TextureAtlas, rgb, uv):
    """base_color whose .r may carry an all-channel texture handle
    (reference render_embree.ispc:84-91)."""
    bits = _bits(rgb[..., 0])
    handle = is_textured(bits)
    fetched = sample_rgb(atlas, tex_id_of(bits), uv)
    return jnp.where(handle[..., None], fetched, rgb)
