"""Texture atlas sampling (jax).

All scene textures are packed into one device atlas of PRE-BUILT BILINEAR
QUADS: row i holds the 2x2 RGBA texel footprint [t(x,y), t(x+1,y),
t(x,y+1), t(x+1,y+1)] (16 floats), with the wrap column/row folded in at
upload. Sampling is software bilinear with wrap addressing — the
vectorized equivalent of the reference's CPU texture unit
(backends/embree/texture2d.ih:39-83) — expressed as ONE (R,16) row gather
per lookup. XLA:TPU gathers cost ~12 ns per ROW regardless of width
(measured), so one 64-byte-row gather is ~4x cheaper than the naive four
corner gathers; the 4x texel memory is the explicit trade.

Per-texture rows of a (N, 3) int32 table carry (quad-row offset, width,
height). Material parameters that carry texture handles
(util/texture_channel_mask.h) are decoded bitwise on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TextureAtlas(NamedTuple):
    atlas: jnp.ndarray  # (P, 16) float32 bilinear quad rows (linearized)
    table: jnp.ndarray  # (N, 3) int32: quad-row offset, width, height

    @property
    def num_textures(self) -> int:
        return self.table.shape[0]

    @staticmethod
    def empty() -> "TextureAtlas":
        return TextureAtlas(
            atlas=jnp.zeros((1, 16), jnp.float32),
            table=jnp.ones((1, 3), jnp.int32),
        )


def build_quad_rows(rgba):
    """(h, w, 4) float32 image -> (h*w, 16) bilinear quad rows with wrap
    addressing baked in: row (y*w + x) = [t(x,y), t(x+1 mod w, y),
    t(x, y+1 mod h), t(x+1 mod w, y+1 mod h)]. mod is a homomorphism, so
    indexing quads by (wrap(xi), wrap(yi)) reproduces the reference's
    independently wrapped four corners exactly (texture2d.ih:39-49)."""
    import numpy as np

    p = np.concatenate([rgba, rgba[:, :1]], axis=1)  # wrap column
    p = np.concatenate([p, p[:1]], axis=0)  # wrap row
    q = np.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=2
    )  # (h, w, 16)
    return np.ascontiguousarray(q.reshape(-1, 16), dtype=np.float32)


@jax.jit
def build_quad_rows_device(rgba_u8, srgb):
    """Device-side quad-row construction: (T, h, w, 4) uint8 texels +
    (T,) bool sRGB flags -> (T*h*w, 16) float32 quad rows (same layout as
    build_quad_rows, batched). The host stays out of the hot path: scene
    upload ships T*h*w*4 BYTES and the 16x-larger float quad atlas is
    materialized on device — on the single-core host the numpy quad
    build + 134 MB concat + transfer serialization dominated set_scene
    (~20 s for 8 512^2 textures; this path is ~0.3 s). Alpha stays
    linear; rgb linearizes per the per-texture flag (util/util.cpp:102)."""
    f = rgba_u8.astype(jnp.float32) * (1.0 / 255.0)
    rgb = f[..., :3]
    lin = jnp.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4)
    rgb = jnp.where(srgb[:, None, None, None], lin, rgb)
    f = jnp.concatenate([rgb, f[..., 3:4]], axis=-1)
    p = jnp.concatenate([f, f[:, :, :1]], axis=2)  # wrap column
    p = jnp.concatenate([p, p[:, :1]], axis=1)  # wrap row
    q = jnp.concatenate(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]], axis=3
    )
    return q.reshape(-1, 16)


def _wrap(x, n):
    """Positive wrap (reference texture2d.ih:32-37 + util.ih mod)."""
    return jnp.mod(x, jnp.maximum(n, 1))


def _quad_setup(atlas: TextureAtlas, tex_id, uv):
    """Shared bilinear footprint computation (reference texture2d.ih:39-49):
    returns (quad rows (..., 16), tx, ty)."""
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
    y0 = _wrap(yi, h)
    rows = atlas.atlas[off + y0 * w + x0]  # ONE (R,16) gather
    return rows, tx, ty


def sample_rgb(atlas: TextureAtlas, tex_id, uv):
    """Bilinear RGB fetch (reference texture2d.ih:39-60). Returns (..., 3)."""
    rows, tx, ty = _quad_setup(atlas, tex_id, uv)
    tx = tx[..., None]
    ty = ty[..., None]
    return (
        rows[..., 0:3] * (1.0 - tx) * (1.0 - ty)
        + rows[..., 4:7] * tx * (1.0 - ty)
        + rows[..., 8:11] * (1.0 - tx) * ty
        + rows[..., 12:15] * tx * ty
    )


def sample_channel(atlas: TextureAtlas, tex_id, channel, uv):
    """Bilinear single-channel fetch (reference texture2d.ih:62-83).

    The channel select is a one-hot reduction over the gathered quad row,
    NOT a per-lane minor-dim fancy index `a[idx, ch]`: per-lane minor-dim
    dynamic indexing is the pattern class that relayouts (~1 ms/op) and
    faults the v5e/axon compiler at scale (docs/ARCHITECTURE.md)."""
    rows, tx, ty = _quad_setup(atlas, tex_id, uv)
    onehot = (
        jnp.arange(4, dtype=jnp.int32) == jnp.clip(channel, 0, 3)[..., None]
    ).astype(jnp.float32)

    def pick(c0):
        return jnp.sum(rows[..., c0 : c0 + 4] * onehot, axis=-1)

    return (
        pick(0) * (1.0 - tx) * (1.0 - ty)
        + pick(4) * tx * (1.0 - ty)
        + pick(8) * (1.0 - tx) * ty
        + pick(12) * tx * ty
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
