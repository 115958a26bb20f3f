"""Genuinely foreign asset files through every loader (VERDICT r4 #6).

Every test here authors its input file(s) BYTE BY BYTE against the public
format specifications, deliberately using conventions this repo's own
writers never produce: CRLF line endings and quad faces and negative
indices in OBJ, RLE-compressed bottom-up TGA, a GLB with interleaved
vertex attributes and u8/u16 index accessors and a stdlib-zlib-authored
embedded PNG, and a PBRT Include chain with a binary PLY and object
instancing. None of the bytes round-trip through chameleonrt_tpu code.

Reference behaviors matched: tinyobj shape splitting + triangulation
(util/scene.cpp:131-214), glTF accessor/bufferView strides
(util/buffer_view.h:9-46, util/scene.cpp:259-400), pbrt-parser delegation
(util/scene.cpp includes via pbrt loaders, README.md:9-11 runs
McGuire-archive scenes)."""

import base64
import json
import os
import struct
import zlib

import numpy as np
import pytest

from chameleonrt_tpu.scene.loader import load_scene


# --------------------------------------------------------------------- OBJ


def _tga_rle_bytes(img: np.ndarray) -> bytes:
    """Author a run-length-encoded, BOTTOM-UP, 24-bit BGR TGA (image type
    10, origin descriptor 0) — the layout ancient DCC exporters emit."""
    h, w, _ = img.shape
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, w, h, 24, 0
    )
    out = [hdr]
    # bottom-up row order; simple per-row RLE: runs of equal pixels become
    # run packets, everything else literal packets
    for y in range(h - 1, -1, -1):
        row = img[y]
        x = 0
        while x < w:
            run = 1
            while (
                x + run < w
                and run < 128
                and (row[x + run] == row[x]).all()
            ):
                run += 1
            if run >= 2:
                r, g, b = (int(v) for v in row[x])
                out.append(bytes([0x80 | (run - 1), b, g, r]))
                x += run
            else:
                lit = 1
                while (
                    x + lit < w
                    and lit < 128
                    and not (
                        x + lit + 1 < w
                        and (row[x + lit] == row[x + lit + 1]).all()
                    )
                ):
                    lit += 1
                out.append(bytes([lit - 1]))
                for k in range(lit):
                    r, g, b = (int(v) for v in row[x + k])
                    out.append(bytes([b, g, r]))
                x += lit
    return b"".join(out)


@pytest.fixture()
def foreign_obj(tmp_path):
    """A Blender/Max-convention OBJ: CRLF, comments, `o` groups, quads,
    negative indices, v//vn faces, usemtl, MTL with the full key set and
    an RLE TGA diffuse map."""
    # checkerboard texture, authored as RLE TGA
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[::2, ::2] = (200, 60, 20)
    tex[1::2, 1::2] = (200, 60, 20)
    tex[0, 0] = (1, 2, 3)  # corner probe pixel
    (tmp_path / "diffuse.tga").write_bytes(_tga_rle_bytes(tex))

    mtl = (
        "# exported by some other tool\r\n"
        "newmtl painted metal\r\n"  # material names may contain spaces
        "Ns 250.0\r\n"
        "Ka 1.000 1.000 1.000\r\n"
        "Kd 0.800 0.200 0.100\r\n"
        "Ks 0.500 0.500 0.500\r\n"
        "Ke 0.0 0.0 0.0\r\n"
        "Ni 1.450\r\n"
        "d 1.0\r\n"
        "illum 2\r\n"
        "map_Kd diffuse.tga\r\n"
        "\r\n"
        "newmtl plain\r\n"
        "Kd 0.1 0.9 0.3\r\n"
        "Ns 0\r\n"
    )
    (tmp_path / "scene.mtl").write_bytes(mtl.encode())

    obj = (
        "# Some Exporter v1.2.3\r\n"
        "mtllib scene.mtl\r\n"
        "o Quad.001\r\n"
        "v -1.0 0.0 -1.0\r\n"
        "v 1.0 0.0 -1.0\r\n"
        "v 1.0 0.0 1.0\r\n"
        "v -1.0 0.0 1.0\r\n"
        "vt 0.0 0.0\r\n"
        "vt 1.0 0.0\r\n"
        "vt 1.0 1.0\r\n"
        "vt 0.0 1.0\r\n"
        "vn 0.0 1.0 0.0\r\n"
        "usemtl painted metal\r\n"
        "s off\r\n"
        # one QUAD face, all-negative indices (count from end)
        "f -4/-4/-1 -3/-3/-1 -2/-2/-1 -1/-1/-1\r\n"
        "o Tri.002\r\n"
        "v 0.0 2.0 0.0\r\n"
        "v 1.0 2.0 0.0\r\n"
        "v 0.0 2.0 1.0\r\n"
        "vn 0.0 -1.0 0.0\r\n"
        "usemtl plain\r\n"
        # v//vn form (no texcoord), absolute indices
        "f 5//2 6//2 7//2\r\n"
    )
    path = tmp_path / "model.obj"
    path.write_bytes(obj.encode())
    return path, tex


def test_foreign_obj(foreign_obj):
    path, tex = foreign_obj
    scene = load_scene(str(path))

    # two `o` groups -> two shapes; the quad fan-triangulates to 2 tris
    tris = [
        g.indices.shape[0]
        for m in scene.meshes
        for g in m.geometries
    ]
    assert sorted(tris) == [1, 2]
    quad_geom = next(
        g for m in scene.meshes for g in m.geometries if g.indices.shape[0] == 2
    )
    # negative indices resolved: 4 unique corners, fan (0,1,2),(0,2,3)
    assert quad_geom.vertices.shape == (4, 3)
    np.testing.assert_allclose(
        quad_geom.vertices[0], [-1.0, 0.0, -1.0], atol=0
    )
    np.testing.assert_array_equal(quad_geom.indices, [[0, 1, 2], [0, 2, 3]])
    assert quad_geom.uvs is not None and quad_geom.uvs.shape == (4, 2)

    # materials: Ns 250 -> specular 0.5, roughness 0.5 (scene.cpp:188-214)
    names_to_mat = {}
    for pm in scene.parameterized_meshes:
        for mid in pm.material_ids:
            if mid >= 0:
                names_to_mat[mid] = scene.materials[mid]
    mats = list(scene.materials)
    painted = mats[0]
    assert abs(painted.specular - 0.5) < 1e-6
    assert abs(painted.roughness - 0.5) < 1e-6

    # the RLE TGA decoded bit-exactly (incl. bottom-up un-flip)
    assert len(scene.textures) == 1
    np.testing.assert_array_equal(scene.textures[0].data[..., :3], tex)


# --------------------------------------------------------------------- GLB


def _png_bytes(img: np.ndarray) -> bytes:
    """Author an 8-bit RGB PNG with stdlib zlib (filter 0 rows) — not this
    repo's encoder."""
    h, w, _ = img.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


@pytest.fixture()
def foreign_glb(tmp_path):
    """A GLB with interleaved POSITION/NORMAL/TEXCOORD_0 (byteStride 32),
    one primitive with uint8 indices and one with uint16, an embedded
    zlib-authored PNG, a TRS node under a matrix node, and a camera."""
    # interleaved vertex buffer: pos(3f) normal(3f) uv(2f) -> 32 B stride
    verts = np.array(
        [
            # a unit quad in XZ
            [-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1],
            # a lifted triangle
            [0, 2, 0], [1, 2, 0], [0, 2, 1],
        ],
        np.float32,
    )
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (7, 1))
    uvs = np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0], [1, 0], [0, 1]], np.float32
    )
    inter = np.concatenate([verts, normals, uvs], axis=1).astype("<f4")
    vb = inter.tobytes()  # 7 * 32 bytes

    idx8 = np.array([0, 1, 2, 0, 2, 3], "<u1").tobytes()  # quad, u8
    idx16 = np.array([4, 5, 6], "<u2").tobytes()  # tri, u16

    texture = np.zeros((4, 4, 3), np.uint8)
    texture[:, :, 1] = np.arange(4, dtype=np.uint8)[None, :] * 60
    texture[3, 3] = (7, 11, 13)
    png = _png_bytes(texture)

    def pad4(b: bytes, fill: bytes) -> bytes:
        return b + fill * (-len(b) % 4)

    bin_parts = []
    offs = {}
    for name, blob in (("vb", vb), ("i8", idx8), ("i16", idx16), ("png", png)):
        offs[name] = sum(len(p) for p in bin_parts)
        bin_parts.append(pad4(blob, b"\x00"))
    bin_chunk = b"".join(bin_parts)

    doc = {
        "asset": {"version": "2.0", "generator": "SomeOtherExporter 3.1"},
        "scene": 0,
        "scenes": [{"nodes": [0, 3]}],
        "nodes": [
            {  # root with a column-major matrix: translate (2,0,0)
                "matrix": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 2, 0, 0, 1],
                "children": [1],
            },
            {  # TRS child: +1 Y, uniform scale 2
                "translation": [0, 1, 0],
                "scale": [2, 2, 2],
                "children": [2],
            },
            {"mesh": 0},
            {
                "camera": 0,
                "translation": [0, 1, 5],
            },
        ],
        "cameras": [
            {"type": "perspective", "perspective": {"yfov": 0.7, "znear": 0.01}}
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    },
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 4,
                        "material": 1,
                    },
                ]
            }
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [
            {  # interleaved VB
                "buffer": 0,
                "byteOffset": offs["vb"],
                "byteLength": len(vb),
                "byteStride": 32,
            },
            {"buffer": 0, "byteOffset": offs["i8"], "byteLength": len(idx8)},
            {"buffer": 0, "byteOffset": offs["i16"], "byteLength": len(idx16)},
            {"buffer": 0, "byteOffset": offs["png"], "byteLength": len(png)},
        ],
        "accessors": [
            {  # POSITION (offset 0 in the interleaved view)
                "bufferView": 0, "componentType": 5126, "count": 7,
                "type": "VEC3", "min": [-1, 0, -1], "max": [1, 2, 1],
            },
            {  # NORMAL at byte 12
                "bufferView": 0, "byteOffset": 12, "componentType": 5126,
                "count": 7, "type": "VEC3",
            },
            {  # TEXCOORD_0 at byte 24
                "bufferView": 0, "byteOffset": 24, "componentType": 5126,
                "count": 7, "type": "VEC2",
            },
            {"bufferView": 1, "componentType": 5121, "count": 6, "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "images": [{"mimeType": "image/png", "bufferView": 3, "name": "check"}],
        "samplers": [{}],
        "textures": [{"source": 0, "sampler": 0}],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0},
                    "metallicFactor": 0.0,
                    "roughnessFactor": 0.8,
                }
            },
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.1, 0.2, 0.9, 1.0],
                    "metallicFactor": 1.0,
                    "roughnessFactor": 0.25,
                }
            },
        ],
    }

    json_chunk = pad4(json.dumps(doc).encode(), b" ")
    glb = (
        struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(json_chunk) + 8 + len(bin_chunk))
        + struct.pack("<II", len(json_chunk), 0x4E4F534A)
        + json_chunk
        + struct.pack("<II", len(bin_chunk), 0x004E4942)
        + bin_chunk
    )
    path = tmp_path / "model.glb"
    path.write_bytes(glb)
    return path, verts, uvs, texture


def test_foreign_glb(foreign_glb):
    path, verts, uvs, texture = foreign_glb
    scene = load_scene(str(path))

    # one mesh, two primitives (u8-quad + u16-tri), interleaved attributes
    assert len(scene.meshes) == 1
    geos = scene.meshes[0].geometries
    assert len(geos) == 2
    np.testing.assert_allclose(geos[0].vertices, verts, atol=0)
    np.testing.assert_allclose(geos[0].uvs, uvs, atol=0)
    np.testing.assert_array_equal(geos[0].indices, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(geos[1].indices, [[4, 5, 6]])

    # node flatten: matrix(translate 2,0,0) @ TRS(translate 0,1,0 scale 2)
    assert len(scene.instances) == 1
    xf = scene.instances[0].transform
    np.testing.assert_allclose(xf[:3, 3], [2, 1, 0], atol=1e-7)
    np.testing.assert_allclose(np.diag(xf)[:3], [2, 2, 2], atol=1e-7)

    # embedded PNG decoded bit-exactly; baseColorTexture marked sRGB
    from chameleonrt_tpu.scene.types import ColorSpace

    assert len(scene.textures) == 1
    np.testing.assert_array_equal(scene.textures[0].data[..., :3], texture)
    assert scene.textures[0].color_space == ColorSpace.SRGB

    # materials: textured + factor-based metallic-roughness
    from chameleonrt_tpu.scene.texture_mask import float_bits, is_textured

    m0, m1 = scene.materials
    assert is_textured(float_bits(np.float32(m0.base_color[0])))
    np.testing.assert_allclose(m1.base_color, [0.1, 0.2, 0.9], atol=1e-7)
    assert abs(m1.metallic - 1.0) < 1e-7 and abs(m1.roughness - 0.25) < 1e-7

    # camera imported from the node hierarchy
    assert len(scene.cameras) == 1
    np.testing.assert_allclose(scene.cameras[0].position, [0, 1, 5], atol=1e-6)


# -------------------------------------------------------------------- PBRT


def _ply_binary_bytes(verts, normals, uvs, faces) -> bytes:
    """Author a binary_little_endian PLY with x y z nx ny nz u v float
    properties and uchar-count/uint-index face lists."""
    n = len(verts)
    hdr = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        "comment authored by an external tool\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property float u\nproperty float v\n"
        f"element face {len(faces)}\n"
        "property list uchar uint vertex_indices\n"
        "end_header\n"
    ).encode("ascii")
    body = bytearray()
    arr = np.concatenate([verts, normals, uvs], axis=1).astype("<f4")
    body += arr.tobytes()
    for f in faces:
        body += struct.pack("<B", len(f))
        body += struct.pack(f"<{len(f)}I", *f)
    return hdr + bytes(body)


@pytest.fixture()
def foreign_pbrt(tmp_path):
    """A PBRT v3 scene exercising Include chains, binary PLY with a QUAD
    face, object instancing with distinct CTMs, imagemap textures, named
    materials and an area light."""
    tex = np.zeros((4, 4, 3), np.uint8)
    tex[:, :, 0] = 128
    (tmp_path / "wall.png").write_bytes(_png_bytes(tex))

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = [(0, 1, 2, 3)]  # one quad -> fan-triangulates to 2 tris
    (tmp_path / "panel.ply").write_bytes(
        _ply_binary_bytes(verts, normals, uvs, faces)
    )

    (tmp_path / "textures.pbrt").write_text(
        'Texture "wallTex" "spectrum" "imagemap" "string filename" "wall.png"\n'
    )
    (tmp_path / "materials.pbrt").write_text(
        'Include "textures.pbrt"\n'
        'MakeNamedMaterial "wallMat" "string type" "matte"'
        ' "texture Kd" "wallTex"\n'
        'MakeNamedMaterial "redMat" "string type" "matte"'
        ' "rgb Kd" [0.9 0.05 0.05]\n'
    )
    main = (
        "# exported from elsewhere\n"
        "LookAt 0 2 8  0 0.5 0  0 1 0\n"
        'Camera "perspective" "float fov" [40]\n'
        'Film "image" "integer xresolution" [64] "integer yresolution" [64]\n'
        "WorldBegin\n"
        '  Include "materials.pbrt"\n'
        "  ObjectBegin \"panel\"\n"
        '    NamedMaterial "wallMat"\n'
        '    Shape "plymesh" "string filename" "panel.ply"\n'
        "  ObjectEnd\n"
        "  AttributeBegin\n"
        "    Translate -2 0 0\n"
        '    ObjectInstance "panel"\n'
        "  AttributeEnd\n"
        "  AttributeBegin\n"
        "    Translate 2 0 0\n"
        "    Scale 1 2 1\n"
        '    ObjectInstance "panel"\n'
        "  AttributeEnd\n"
        "  AttributeBegin\n"
        '    NamedMaterial "redMat"\n'
        '    Shape "trianglemesh" "integer indices" [0 1 2]'
        ' "point P" [-1 0 2  1 0 2  0 1 2]\n'
        "  AttributeEnd\n"
        "  AttributeBegin\n"
        '    AreaLightSource "diffuse" "rgb L" [10 9 8]\n'
        '    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]'
        ' "point P" [-0.5 3 -0.5  0.5 3 -0.5  0.5 3 0.5  -0.5 3 0.5]\n'
        "  AttributeEnd\n"
        "WorldEnd\n"
    )
    path = tmp_path / "scene.pbrt"
    path.write_text(main)
    return path


def test_foreign_pbrt(foreign_pbrt):
    scene = load_scene(str(foreign_pbrt))

    # the PLY object: one ParameterizedMesh, instanced TWICE with the
    # attribute-block CTMs; quad face fan-triangulated to 2 tris
    counts = {}
    for inst in scene.instances:
        counts[inst.parameterized_mesh_id] = counts.get(
            inst.parameterized_mesh_id, 0
        ) + 1
    pm_twice = [pid for pid, c in counts.items() if c == 2]
    assert len(pm_twice) == 1
    pm = scene.parameterized_meshes[pm_twice[0]]
    geo = scene.meshes[pm.mesh_id].geometries[0]
    assert geo.indices.shape == (2, 3)
    assert geo.uvs is not None
    xforms = [
        inst.transform
        for inst in scene.instances
        if inst.parameterized_mesh_id == pm_twice[0]
    ]
    t = sorted(float(x[0, 3]) for x in xforms)
    assert t == [-2.0, 2.0]
    scaled = next(x for x in xforms if x[0, 3] > 0)
    assert abs(scaled[1, 1] - 2.0) < 1e-6  # Scale 1 2 1 composed

    # the imagemap texture loaded and is referenced by the PLY's material
    assert len(scene.textures) == 1
    from chameleonrt_tpu.scene.texture_mask import float_bits, is_textured

    wall_mat = scene.materials[pm.material_ids[0]]
    assert is_textured(float_bits(np.float32(wall_mat.base_color[0])))

    # the inline trianglemesh got the red named material
    red = [
        m
        for m in scene.materials
        if not is_textured(float_bits(np.float32(np.asarray(m.base_color)[0])))
        and abs(float(np.asarray(m.base_color)[0]) - 0.9) < 1e-6
    ]
    assert red

    # the area light became a QuadLight with the right emission
    assert len(scene.lights) == 1
    np.testing.assert_allclose(scene.lights[0].emission, [10, 9, 8], atol=0)

    # camera from LookAt + fov
    assert len(scene.cameras) == 1
    assert abs(scene.cameras[0].fov_y - 40.0) < 1e-6


# ------------------------------------------------------- end-to-end flatten


def test_foreign_assets_flatten(foreign_obj, foreign_glb, foreign_pbrt):
    """All three foreign scenes survive device flattening + BLAS build —
    the full set_scene path (render_backend.h:18-31 set_scene role)."""
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set

    for path in (foreign_obj[0], foreign_glb[0], foreign_pbrt):
        scene = load_scene(str(path))
        flat, meta = build_device_scene(scene)
        blas = build_blas_set(flat, meta)
        assert blas is not None
