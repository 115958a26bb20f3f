"""glTF/GLB loader tests using synthesized files (no external assets)."""

import base64
import json
import struct

import numpy as np
import pytest

from chameleonrt_tpu.scene.gltf_loader import load_gltf
from chameleonrt_tpu.scene.texture_mask import (
    float_bits,
    is_textured,
    texture_channel,
    texture_id,
)
from chameleonrt_tpu.scene.types import ColorSpace, MaterialMode


def make_quad_gltf(tmp_path, glb=False, with_texture=False):
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    vb = verts.tobytes()
    ub = uvs.tobytes()
    ib = idx.tobytes() + b"\x00\x00"  # pad to 4
    blob = vb + ub + ib
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0},
            {"mesh": 0, "translation": [2, 0, 0], "children": [2]},
            {"mesh": 0, "translation": [0, 2, 0]},
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                        "indices": 2,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                    "metallicFactor": 0.3,
                    "roughnessFactor": 0.6,
                }
            }
        ],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(vb)},
            {"buffer": 0, "byteOffset": len(vb), "byteLength": len(ub)},
            {"buffer": 0, "byteOffset": len(vb) + len(ub), "byteLength": len(idx.tobytes())},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }
    if with_texture:
        from chameleonrt_tpu.utils.png import write_png

        tex = np.zeros((8, 8, 3), np.uint8)
        tex[:, :4] = [255, 0, 0]
        tex[:, 4:] = [0, 255, 0]
        write_png(str(tmp_path / "tex.png"), tex)
        write_png(str(tmp_path / "mr.png"), np.full((4, 4, 3), 128, np.uint8))
        doc["images"] = [{"uri": "tex.png"}, {"uri": "mr.png"}]
        doc["textures"] = [{"source": 0}, {"source": 1}]
        doc["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
        doc["materials"][0]["pbrMetallicRoughness"]["metallicRoughnessTexture"] = {
            "index": 1
        }
    if glb:
        js = json.dumps(doc).encode()
        js += b" " * ((4 - len(js) % 4) % 4)
        blob_p = blob + b"\x00" * ((4 - len(blob) % 4) % 4)
        out = b""
        out += struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(blob_p))
        out += struct.pack("<II", len(js), 0x4E4F534A) + js
        out += struct.pack("<II", len(blob_p), 0x004E4942) + blob_p
        p = tmp_path / "t.glb"
        p.write_bytes(out)
    else:
        doc["buffers"][0]["uri"] = "data:application/octet-stream;base64," + (
            base64.b64encode(blob).decode()
        )
        p = tmp_path / "t.gltf"
        p.write_text(json.dumps(doc))
    return str(p)


class TestGltfLoader:
    @pytest.mark.parametrize("glb", [False, True])
    def test_load_quad(self, tmp_path, glb):
        path = make_quad_gltf(tmp_path, glb=glb)
        scene = load_gltf(path)
        assert len(scene.meshes) == 1
        assert scene.meshes[0].geometries[0].num_tris == 2
        np.testing.assert_allclose(
            scene.meshes[0].geometries[0].uvs,
            [[0, 0], [1, 0], [1, 1], [0, 1]],
        )
        # 3 nodes reference the mesh -> 3 instances (one nested child)
        assert len(scene.instances) == 3
        # nested child accumulates parent translation
        t = sorted(tuple(i.transform[:3, 3]) for i in scene.instances)
        assert (2.0, 0.0, 0.0) in t
        assert (2.0, 2.0, 0.0) in t  # child of node 1: parent(2,0,0)+own(0,2,0)
        # material conversion
        m = scene.materials[0]
        np.testing.assert_allclose(m.base_color, [0.8, 0.2, 0.1], rtol=1e-6)
        assert m.metallic == pytest.approx(0.3)
        assert m.roughness == pytest.approx(0.6)
        # generated light
        assert len(scene.lights) == 1

    def test_textured_material_channels(self, tmp_path):
        path = make_quad_gltf(tmp_path, with_texture=True)
        scene = load_gltf(path)
        m = scene.materials[0]
        # base color texture -> SRGB + handle in base_color.r
        bits = float_bits(m.base_color[0])
        assert is_textured(bits)
        assert texture_id(bits) == 0
        assert scene.textures[0].color_space == ColorSpace.SRGB
        # metallic = blue channel (2), roughness = green (1), LINEAR space
        mb = float_bits(np.float32(m.metallic))
        rb = float_bits(np.float32(m.roughness))
        assert texture_id(mb) == 1 and texture_id(rb) == 1
        assert texture_channel(mb) == 2
        assert texture_channel(rb) == 1
        assert scene.textures[1].color_space == ColorSpace.LINEAR

    def test_white_diffuse_mode(self, tmp_path):
        path = make_quad_gltf(tmp_path)
        scene = load_gltf(path, MaterialMode.WHITE_DIFFUSE)
        assert all(
            mid == len(scene.materials) - 1
            for mid in scene.parameterized_meshes[0].material_ids
        )

    def test_renders_through_backend(self, tmp_path):
        from chameleonrt_tpu.core import get_backend

        path = make_quad_gltf(tmp_path, glb=True)
        scene = load_gltf(path)
        b = get_backend("tpu")
        b.initialize(24, 24)
        b.set_scene(scene)
        eye = np.array([1.0, 1.0, 4.0], np.float32)
        d = np.array([0.0, 0.0, -1.0], np.float32)
        up = np.array([0.0, 1.0, 0.0], np.float32)
        st = b.render(eye, d, up, 60.0, True)
        assert st.rays_traced > 0
        assert np.isfinite(np.asarray(b._accum)).all()
