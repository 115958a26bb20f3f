"""Scene -> device arrays (the TPU-native analogue of `set_scene`).

Where the reference's set_scene uploads vertex/index buffers, builds BLAS/TLAS
via vendor APIs, and fills SBTs (backends/optix/render_optix.cpp:124-267),
the TPU engine flattens the Scene into padded SoA jax arrays: pre-gathered
per-triangle (v0, e1, e2) + per-corner UVs for intersection/shading without
index-buffer indirection, a packed material table whose float slots may carry
texture handles, a quad-light table, and one flat texture atlas (SRGB images
linearized on upload, reference render_embree.cpp:90-104).

Static scene structure (mesh triangle ranges, instance->mesh mapping) lives in
SceneMeta, a hashable host-side companion, so jitted render functions can
specialize on it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from chameleonrt_tpu.ops.bsdf import MaterialBatch
from chameleonrt_tpu.ops.lights import LightArrays
from chameleonrt_tpu.ops.texture import TextureAtlas, textured_color_param, textured_scalar_param
from chameleonrt_tpu.scene.types import ColorSpace, MaterialMode, Scene


class FlatScene(NamedTuple):
    """Device-resident scene (all jnp arrays)."""

    # Triangle soup, concatenated over all meshes/geometries (object space).
    tri_v0: jnp.ndarray  # (T, 3)
    tri_e1: jnp.ndarray  # (T, 3)
    tri_e2: jnp.ndarray  # (T, 3)
    tri_uv0: jnp.ndarray  # (T, 2)
    tri_uv1: jnp.ndarray  # (T, 2)
    tri_uv2: jnp.ndarray  # (T, 2)
    tri_geom_slot: jnp.ndarray  # (T,) int32: geometry index within its mesh
    # Fused per-triangle shading rows (T, 16): ONE row gather per hit yields
    # everything shading needs (TPU rule: many narrow gathers and 3D gathers
    # are pathologically slow; single 2D row gathers are fast):
    # [e1 xyz, e2 xyz, uv0, uv1, uv2 (2 each), geom_slot(bitcast),
    #  mat_id(bitcast, valid for single-instance scenes), pad, pad]
    shade_rows: jnp.ndarray
    # Packed material records (M, 16): the 14 float slots of
    # MATERIAL_PARAM_NAMES + 2 pad; float slots may carry texture handles.
    mat_rows: jnp.ndarray
    # Instances
    inst_transform: jnp.ndarray  # (I, 4, 4)
    inst_inv: jnp.ndarray  # (I, 4, 4) world-to-object
    inst_mat_table: jnp.ndarray  # (I, G_max) int32 material ids per geom slot
    # Appearance
    materials: MaterialBatch  # (M,) fields
    lights: LightArrays  # (L,) fields
    atlas: TextureAtlas
    # Acceleration structures: one PackedBvh per mesh (set by the BVH
    # backend; empty for the brute-force oracle). Part of the pytree so
    # the (potentially hundreds of MB) BVH arrays enter jitted functions
    # as ARGUMENTS — closing over them bakes them into the HLO as
    # constants, which the axon remote-compile rejects for large scenes
    # (HTTP 413 at ~6.7M tris).
    blas: tuple = ()
    # Per-instance world-space AABBs (I, 6) [min xyz, max xyz], used to
    # cull whole instances per ray before BLAS traversal (set alongside
    # blas; empty array for the brute-force oracle).
    inst_aabb: jnp.ndarray = jnp.zeros((0, 6), jnp.float32)


class HostScene(NamedTuple):
    """Host-side (numpy) mirror of the arrays the BVH-build phase needs.
    Device→host readbacks through the axon tunnel stall unpredictably
    (measured 19-62 s even for KB-sized arrays), so set_scene must never
    read anything back; it builds from this mirror instead."""

    tri_v0: "np.ndarray"
    tri_e1: "np.ndarray"
    tri_e2: "np.ndarray"
    inst_transform: "np.ndarray"
    inst_inv: "np.ndarray"


@dataclass(frozen=True)
class SceneMeta:
    """Hashable static structure for jit specialization."""

    mesh_tri_ranges: Tuple[Tuple[int, int], ...]  # (start, count) per mesh
    inst_mesh: Tuple[int, ...]  # mesh id per instance
    num_lights: int
    num_tris: int
    num_instances: int
    has_textures: bool = False
    # Which material fields carry a texture handle ANYWHERE in the scene
    # (static, 12 entries: base_color + the 11 scalars in MaterialBatch
    # order). Most scenes texture only base_color; skipping the 4-gather
    # bilinear fetch for never-textured fields drops the per-bounce atlas
    # gather count from ~48 to ~4. Empty tuple = unknown -> fetch all.
    textured_fields: Tuple[bool, ...] = ()

    @property
    def single_identity_instance(self) -> bool:
        return self.num_instances == 1


# Above this triangle count the fused shade rows are assembled on device
# (tests patch this down to cover the device path at small sizes).
SHADE_ROWS_DEVICE_MIN = 1_000_000


def _assemble_shade_rows_device(e1, e2, uv0, uv1, uv2, geom_slot, mat_table_row,
                                mat_rows):
    """Assemble the fused (T, 32) shade-row table on device from columns
    already resident in HBM (large-scene path of build_device_scene)."""
    import jax

    @jax.jit
    def single(e1, e2, uv0, uv1, uv2, gs, mtr, mr):
        T = e1.shape[0]
        gsf = jax.lax.bitcast_convert_type(gs, jnp.float32)[:, None]
        mat = mtr[gs]
        matf = jax.lax.bitcast_convert_type(mat, jnp.float32)[:, None]
        pad2 = jnp.zeros((T, 2), jnp.float32)
        return jnp.concatenate(
            [e1, e2, uv0, uv1, uv2, gsf, matf, pad2, mr[mat][:, :14], pad2],
            axis=1,
        )

    @jax.jit
    def multi(e1, e2, uv0, uv1, uv2, gs):
        T = e1.shape[0]
        gsf = jax.lax.bitcast_convert_type(gs, jnp.float32)[:, None]
        return jnp.concatenate(
            [e1, e2, uv0, uv1, uv2, gsf, jnp.zeros((T, 19), jnp.float32)],
            axis=1,
        )

    if mat_table_row is not None:
        return single(e1, e2, uv0, uv1, uv2, geom_slot, mat_table_row, mat_rows)
    return multi(e1, e2, uv0, uv1, uv2, geom_slot)


def build_device_scene(scene: Scene, want_host: bool = False,
                       host_tris_cb=None):
    """Flatten + upload. With want_host=True also returns the host-side
    (v0, e1, e2) numpy triple for the BVH builder — reading triangles BACK
    from the device costs ~20 s/array through the axon tunnel, so set_scene
    must never round-trip them (measured: 96 s of a 99 s set_scene).

    host_tris_cb(v0, e1, e2, mesh_ranges): called the moment the host
    triangle arrays exist, BEFORE any device upload — the TPU backend
    uses it to start the native SAH build on a worker thread (ctypes
    releases the GIL) so the CPU-bound build overlaps the tunnel-bound
    uploads and device-side assembly below (set_scene wall time ≈
    max(build, upload) instead of their sum)."""
    if not scene.meshes or scene.total_tris() == 0 or not scene.instances:
        raise ValueError(
            "scene has no renderable geometry (no meshes/instances/triangles)"
        )
    scene.validate_materials()

    v0s, e1s, e2s = [], [], []
    uv0s, uv1s, uv2s = [], [], []
    geom_slots = []
    mesh_ranges = []
    start = 0
    any_uvs = False
    for mesh in scene.meshes:
        count = 0
        for gi, geom in enumerate(mesh.geometries):
            idx = geom.indices.astype(np.int64)
            v = geom.vertices
            a = v[idx[:, 0]]
            b = v[idx[:, 1]]
            c = v[idx[:, 2]]
            v0s.append(a)
            e1s.append(b - a)
            e2s.append(c - a)
            if geom.uvs is not None:
                any_uvs = True
                uv = geom.uvs
                uv0s.append(uv[idx[:, 0]])
                uv1s.append(uv[idx[:, 1]])
                uv2s.append(uv[idx[:, 2]])
            else:
                z = np.zeros((len(idx), 2), np.float32)
                uv0s.append(z)
                uv1s.append(z)
                uv2s.append(z)
            geom_slots.append(np.full(len(idx), gi, np.int32))
            count += len(idx)
        mesh_ranges.append((start, count))
        start += count
    num_tris = start

    def cat(parts, width):
        if not parts:
            return np.zeros((0, width), np.float32)
        if len(parts) == 1:  # np.concatenate([x]) would copy 80 MB at city scale
            return np.ascontiguousarray(parts[0], dtype=np.float32)
        return np.ascontiguousarray(np.concatenate(parts), dtype=np.float32)

    tri_v0 = cat(v0s, 3)
    tri_e1 = cat(e1s, 3)
    tri_e2 = cat(e2s, 3)
    tri_geom_slot = (
        np.concatenate(geom_slots) if geom_slots else np.zeros(0, np.int32)
    ).astype(np.int32)

    if host_tris_cb is not None:
        host_tris_cb(tri_v0, tri_e1, tri_e2, list(mesh_ranges))

    # Upload each triangle column ONCE. All-zero UV columns (untextured
    # scenes) are generated on device — at Rungholt scale that is 3x54 MB
    # that never crosses the tunnel.
    d_v0 = jnp.asarray(tri_v0)
    d_e1 = jnp.asarray(tri_e1)
    d_e2 = jnp.asarray(tri_e2)
    d_geom_slot = jnp.asarray(tri_geom_slot)
    if any_uvs:
        d_uv0 = jnp.asarray(cat(uv0s, 2))
        d_uv1 = jnp.asarray(cat(uv1s, 2))
        d_uv2 = jnp.asarray(cat(uv2s, 2))
    else:  # all-zero UVs: generate on device, never ship 3x(T,2) zeros
        d_uv0 = d_uv1 = d_uv2 = jnp.zeros((num_tris, 2), jnp.float32)

    # Instances
    n_inst = len(scene.instances)
    g_max = max((len(m.geometries) for m in scene.meshes), default=1)
    inst_transform = np.zeros((n_inst, 4, 4), np.float32)
    inst_inv = np.zeros((n_inst, 4, 4), np.float32)
    inst_mat_table = np.zeros((n_inst, g_max), np.int32)
    inst_mesh = []
    for i, inst in enumerate(scene.instances):
        pm = scene.parameterized_meshes[inst.parameterized_mesh_id]
        inst_mesh.append(pm.mesh_id)
        inst_transform[i] = inst.transform
        inst_inv[i] = np.linalg.inv(inst.transform)
        mids = pm.material_ids
        inst_mat_table[i, : len(mids)] = np.asarray(mids, np.int32)

    # Materials -> SoA MaterialBatch (float slots keep texture-handle bits)
    n_mat = max(len(scene.materials), 1)
    packed = np.zeros((n_mat, 14), np.float32)
    from chameleonrt_tpu.scene.types import DisneyMaterial

    mats = scene.materials if scene.materials else [DisneyMaterial()]
    for i, m in enumerate(mats):
        packed[i] = m.pack()
    materials = MaterialBatch(
        base_color=jnp.asarray(packed[:, 0:3]),
        metallic=jnp.asarray(packed[:, 3]),
        specular=jnp.asarray(packed[:, 4]),
        roughness=jnp.asarray(packed[:, 5]),
        specular_tint=jnp.asarray(packed[:, 6]),
        anisotropy=jnp.asarray(packed[:, 7]),
        sheen=jnp.asarray(packed[:, 8]),
        sheen_tint=jnp.asarray(packed[:, 9]),
        clearcoat=jnp.asarray(packed[:, 10]),
        clearcoat_gloss=jnp.asarray(packed[:, 11]),
        ior=jnp.asarray(packed[:, 12]),
        specular_transmission=jnp.asarray(packed[:, 13]),
    )

    # Lights (always at least one: loaders generate one when missing)
    if not scene.lights:
        from chameleonrt_tpu.scene.types import default_obj_light

        scene.lights = [default_obj_light()]
    lights = LightArrays.from_scene_lights(scene.lights)

    # Texture atlas: SRGB color textures linearized on upload, stored as
    # pre-built bilinear quad rows (one (R,16) gather per sample on device;
    # see ops/texture.py)
    if scene.textures and scene.material_mode != MaterialMode.WHITE_DIFFUSE:
        from chameleonrt_tpu.ops.texture import build_quad_rows_device

        # Ship u8 texels only; the 4x-larger u8 quad atlas is built ON
        # DEVICE (build_quad_rows_device docstring: the single-core host
        # made the numpy quad build + concat + transfer serialization the
        # set_scene bottleneck). Texels stay raw u8 — sRGB linearization
        # happens per lane at sample time (ops/texture.py: row gathers
        # dominate shading and track row bytes, so a u8 atlas samples
        # ~40% faster than f32 with bit-identical results). Channel
        # spread to RGBA stays host-side on the small u8 images.
        table = np.zeros((len(scene.textures), 4), np.int32)
        groups: dict = {}  # (h, w) -> [(texture id, rgba u8)]
        for ti, img in enumerate(scene.textures):
            h, w, c = img.data.shape
            rgba = np.full((h, w, 4), 255, np.uint8)
            data = img.data
            if c == 1:
                rgba[..., 0:3] = data
            elif c == 2:
                rgba[..., 0:3] = data[..., 0:1]
                rgba[..., 3] = data[..., 1]
            else:
                rgba[..., :c] = data
            groups.setdefault((h, w), []).append((ti, rgba))
        # one stacked device call per texture shape (atlas rows follow
        # group order; table offsets point each texture id at its rows).
        # flags bit0 = rgb sRGB; alpha stays linear (bit1 clear) unless a
        # co-packed sRGB scalar channel rides there.
        quads = []
        off = 0
        for (h, w), items in groups.items():
            stack = np.stack([r for _, r in items])
            quads.append(build_quad_rows_device(jnp.asarray(stack)))
            for j, (ti, _) in enumerate(items):
                srgb = scene.textures[ti].color_space == ColorSpace.SRGB
                table[ti] = (off + j * h * w, w, h, 1 if srgb else 0)
            off += len(items) * h * w
        atlas = TextureAtlas(
            atlas=jnp.concatenate(quads) if len(quads) > 1 else quads[0],
            table=jnp.asarray(table),
        )
    else:
        atlas = TextureAtlas.empty()

    mat_rows = np.zeros((n_mat, 16), np.float32)
    mat_rows[:, :14] = packed

    # Fused shading rows (see FlatScene docstring). For single-instance
    # scenes the per-triangle material id is static, so the FULL packed
    # material record is baked into cols [16, 30): shading then needs ONE
    # (R, 32) row gather total — a gather costs ~12 ns/row regardless of
    # width (measured), so folding the separate (R, 16) material-table
    # gather in saves ~11 ms/bounce at 921K lanes.
    # Small scenes: host fill + ONE upload. Large scenes (>1M tris): every
    # column is already ON DEVICE (d_e1/d_e2/d_uv*/d_geom_slot + the
    # material tables), so one jitted concat+gather assembles the (T, 32)
    # table in HBM — measured at 6.7M tris the host path costs 5.5 s fill
    # + 1.5 s upload of 858 MB, the device path ~0 (one cached compile).
    # Round 3 measured a 20.7 s device assembly, but that was EAGER ops
    # (one remote Mosaic/XLA compile each); a single jitted function hits
    # the persistent compilation cache.
    if num_tris > SHADE_ROWS_DEVICE_MIN:
        d_shade_rows = _assemble_shade_rows_device(
            d_e1,
            d_e2,
            d_uv0,
            d_uv1,
            d_uv2,
            d_geom_slot,
            jnp.asarray(inst_mat_table[0]) if n_inst == 1 else None,
            jnp.asarray(mat_rows),
        )
    elif num_tris:
        shade_rows = np.zeros((num_tris, 32), np.float32)
        shade_rows[:, 0:3] = tri_e1
        shade_rows[:, 3:6] = tri_e2
        if any_uvs:
            shade_rows[:, 6:8] = np.concatenate(uv0s)
            shade_rows[:, 8:10] = np.concatenate(uv1s)
            shade_rows[:, 10:12] = np.concatenate(uv2s)
        shade_rows[:, 12] = tri_geom_slot.view(np.float32)
        if n_inst == 1:
            tri_mat = inst_mat_table[0][tri_geom_slot]
            shade_rows[:, 13] = tri_mat.astype(np.int32).view(np.float32)
            shade_rows[:, 16:30] = packed[tri_mat]
        d_shade_rows = jnp.asarray(shade_rows)
    else:
        d_shade_rows = jnp.zeros((1, 32), jnp.float32)

    flat = FlatScene(
        tri_v0=d_v0,
        tri_e1=d_e1,
        tri_e2=d_e2,
        tri_uv0=d_uv0,
        tri_uv1=d_uv1,
        tri_uv2=d_uv2,
        tri_geom_slot=d_geom_slot,
        shade_rows=d_shade_rows,
        mat_rows=jnp.asarray(mat_rows),
        inst_transform=jnp.asarray(inst_transform),
        inst_inv=jnp.asarray(inst_inv),
        inst_mat_table=jnp.asarray(inst_mat_table),
        materials=materials,
        lights=lights,
        atlas=atlas,
    )
    meta = SceneMeta(
        mesh_tri_ranges=tuple(mesh_ranges),
        inst_mesh=tuple(inst_mesh),
        num_lights=len(scene.lights),
        num_tris=num_tris,
        num_instances=n_inst,
        has_textures=bool(scene.textures)
        and scene.material_mode != MaterialMode.WHITE_DIFFUSE,
        textured_fields=tuple(
            bool((packed[:, c].view(np.uint32) & np.uint32(0x80000000)).any())
            for c in (0, *range(3, 14))
        ),
    )
    if want_host:
        return flat, meta, HostScene(tri_v0, tri_e1, tri_e2, inst_transform, inst_inv)
    return flat, meta


def unpack_material(flat: FlatScene, meta: SceneMeta, mat_id, uv) -> MaterialBatch:
    """Gather the material record per lane and resolve texture handles
    (reference render_embree.ispc:79-103 unpack_material). One (R, 16) row
    gather from the packed material table (12 separate 1D field gathers are
    pathologically slow on TPU); texture decode is skipped entirely for
    texture-free scenes (static on SceneMeta)."""
    mat_id = jnp.clip(mat_id, 0, flat.mat_rows.shape[0] - 1)
    row = flat.mat_rows[mat_id]  # (R, 16)
    return unpack_material_row(flat, meta, row, uv)


def unpack_material_row(flat: FlatScene, meta: SceneMeta, row, uv) -> MaterialBatch:
    """unpack_material for callers that already hold the packed material
    record per lane (e.g. single-instance shading, where it rides in the
    fused shade row — no separate material-table gather)."""
    base_color = row[:, 0:3]
    fields = {
        name: row[:, 3 + i]
        for i, name in enumerate(
            (
                "metallic",
                "specular",
                "roughness",
                "specular_tint",
                "anisotropy",
                "sheen",
                "sheen_tint",
                "clearcoat",
                "clearcoat_gloss",
                "ior",
                "specular_transmission",
            )
        )
    }
    if not meta.has_textures:
        return MaterialBatch(base_color=base_color, **fields)
    atlas = flat.atlas
    tf = meta.textured_fields or (True,) * 12
    return MaterialBatch(
        base_color=textured_color_param(atlas, base_color, uv)
        if tf[0]
        else base_color,
        **{
            k: textured_scalar_param(atlas, v, uv) if tf[1 + i] else v
            for i, (k, v) in enumerate(fields.items())
        },
    )
