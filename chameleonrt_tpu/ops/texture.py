"""Texture atlas sampling (jax).

All scene textures are packed into one device atlas of PRE-BUILT BILINEAR
QUADS: row i holds the 2x2 RGBA texel footprint [t(x,y), t(x+1,y),
t(x,y+1), t(x+1,y+1)] (16 UINT8 texels), with the wrap column/row folded
in at upload. Sampling is software bilinear with wrap addressing — the
vectorized equivalent of the reference's CPU texture unit
(backends/embree/texture2d.ih:39-83) — expressed as ONE (R,16) row gather
per lookup plus on-lane decode. Row gathers dominate the shading stage
(honest chained-jit measurement, 921K lanes, 134 MB f32 atlas: 41 of the
43.5 ms blocked shade was the two material lookups), and gather cost
tracks ROW BYTES on >VMEM tables: u8 rows measure 12.3 ns vs f32's
20.2 ns at 2M rows. So the atlas stores the ORIGINAL uint8 texels and
sRGB linearization runs per lane after the gather — the exact same
`u8/255 -> piecewise sRGB` float ops the upload-time build ran, so the
sampled values are bit-identical to the f32-atlas design while the
gather moves 4x fewer bytes (VPU transcendentals are ~free next to HBM
row fetches: 16 pows/lane ≈ 0.2 ms at 921K lanes).

Per-texture rows of a (N, 4) int32 table carry (quad-row offset, width,
height, colorspace flags: bit0 = rgb channels are sRGB, bit1 = alpha
channel is sRGB — bit1 only arises when a co-packed scalar channel from
an sRGB source rides in alpha). Material parameters that carry texture
handles (util/texture_channel_mask.h) are decoded bitwise on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TextureAtlas(NamedTuple):
    atlas: jnp.ndarray  # (P, 16) uint8 bilinear quad rows (raw texels)
    table: jnp.ndarray  # (N, 4) int32: quad-row offset, width, height, flags

    @property
    def num_textures(self) -> int:
        return self.table.shape[0]

    @staticmethod
    def empty() -> "TextureAtlas":
        return TextureAtlas(
            atlas=jnp.zeros((1, 16), jnp.uint8),
            table=jnp.asarray([[0, 1, 1, 0]], jnp.int32),
        )


def build_quad_rows(rgba_u8):
    """(h, w, 4) uint8 image -> (h*w, 16) uint8 bilinear quad rows with
    wrap addressing baked in: row (y*w + x) = [t(x,y), t(x+1 mod w, y),
    t(x, y+1 mod h), t(x+1 mod w, y+1 mod h)]. mod is a homomorphism, so
    indexing quads by (wrap(xi), wrap(yi)) reproduces the reference's
    independently wrapped four corners exactly (texture2d.ih:39-49)."""
    import numpy as np

    p = np.concatenate([rgba_u8, rgba_u8[:, :1]], axis=1)  # wrap column
    p = np.concatenate([p, p[:1]], axis=0)  # wrap row
    q = np.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=2
    )  # (h, w, 16)
    return np.ascontiguousarray(q.reshape(-1, 16), dtype=np.uint8)


@jax.jit
def build_quad_rows_device(rgba_u8):
    """Device-side quad-row construction: (T, h, w, 4) uint8 texels ->
    (T*h*w, 16) uint8 quad rows (same layout as build_quad_rows,
    batched). The host stays out of the hot path: scene upload ships
    T*h*w*4 BYTES and the 4x-larger quad atlas is materialized on device
    — on the single-core host the numpy quad build + concat + transfer
    serialization dominated set_scene (~20 s for 8 512^2 textures; this
    path is ~0.3 s). Texels stay raw u8; sRGB linearization happens per
    lane at sample time (bit-identical — see module docstring)."""
    p = jnp.concatenate([rgba_u8, rgba_u8[:, :, :1]], axis=2)  # wrap column
    p = jnp.concatenate([p, p[:, :1]], axis=1)  # wrap row
    q = jnp.concatenate(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]], axis=3
    )
    return q.reshape(-1, 16)


def _srgb_to_linear(f):
    """Piecewise sRGB EOTF on [0,1] floats — the exact float ops the
    upload-time linearization ran (util/util.cpp:102 role), now applied
    per lane after the u8 row gather."""
    return jnp.where(f <= 0.04045, f / 12.92, ((f + 0.055) / 1.055) ** 2.4)


def _wrap(x, n):
    """Positive wrap (reference texture2d.ih:32-37 + util.ih mod)."""
    return jnp.mod(x, jnp.maximum(n, 1))


def _quad_setup(atlas: TextureAtlas, tex_id, uv):
    """Shared bilinear footprint computation (reference texture2d.ih:39-49):
    returns (u8 quad rows (..., 16), tx, ty, colorspace flags)."""
    tex_id = jnp.clip(tex_id, 0, atlas.table.shape[0] - 1)
    rec = atlas.table[tex_id]  # (..., 4)
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
    rows = atlas.atlas[off + y0 * w + x0]  # ONE u8 (R,16) gather
    return rows, tx, ty, rec[..., 3]


def sample_rgb(atlas: TextureAtlas, tex_id, uv):
    """Bilinear RGB fetch (reference texture2d.ih:39-60). Returns (..., 3)."""
    rows, tx, ty, flags = _quad_setup(atlas, tex_id, uv)
    f = rows.astype(jnp.float32) * (1.0 / 255.0)
    srgb = ((flags & 1) != 0)[..., None]
    tx = tx[..., None]
    ty = ty[..., None]

    def corner(c0):
        rgb = f[..., c0 : c0 + 3]
        return jnp.where(srgb, _srgb_to_linear(rgb), rgb)

    return (
        corner(0) * (1.0 - tx) * (1.0 - ty)
        + corner(4) * tx * (1.0 - ty)
        + corner(8) * (1.0 - tx) * ty
        + corner(12) * tx * ty
    )


def sample_channel(atlas: TextureAtlas, tex_id, channel, uv):
    """Bilinear single-channel fetch (reference texture2d.ih:62-83).

    The channel select is a one-hot reduction over the gathered quad row,
    NOT a per-lane minor-dim fancy index `a[idx, ch]`: per-lane minor-dim
    dynamic indexing is the pattern class that relayouts (~1 ms/op) and
    faults the v5e/axon compiler at scale (docs/ARCHITECTURE.md)."""
    rows, tx, ty, flags = _quad_setup(atlas, tex_id, uv)
    f = rows.astype(jnp.float32) * (1.0 / 255.0)
    channel = jnp.clip(channel, 0, 3)
    onehot = (
        jnp.arange(4, dtype=jnp.int32) == channel[..., None]
    ).astype(jnp.float32)
    # rgb channels linearize per bit0; a channel-3 read takes bit1 (only
    # set for co-packed alpha riding an sRGB source)
    srgb = jnp.where(channel == 3, (flags & 2) != 0, (flags & 1) != 0)

    def pick(c0):
        v = jnp.sum(f[..., c0 : c0 + 4] * onehot, axis=-1)
        return jnp.where(srgb, _srgb_to_linear(v), v)

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
