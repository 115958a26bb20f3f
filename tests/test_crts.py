"""CRTS loader tests with a synthesized file (format per reference
util/scene.cpp:417-624: u64 header size + JSON + binary blob)."""

import json
import struct

import numpy as np
import pytest

from chameleonrt_tpu.scene.crts_loader import load_crts
from chameleonrt_tpu.scene.texture_mask import float_bits, is_textured, texture_channel, texture_id
from chameleonrt_tpu.scene.types import ColorSpace, MaterialMode


def make_crts(tmp_path, with_light=True):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.uint32)
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    from chameleonrt_tpu.utils.png import write_png
    import io, os

    texfile = tmp_path / "t.png"
    write_png(str(texfile), np.full((4, 4, 3), 200, np.uint8))
    png_bytes = texfile.read_bytes()

    blob = verts.tobytes() + idx.tobytes() + uvs.tobytes() + png_bytes
    views = [
        {"type": "VEC3_F32", "byte_offset": 0, "byte_length": verts.nbytes},
        {"type": "VEC3_U32", "byte_offset": verts.nbytes, "byte_length": idx.nbytes},
        {"type": "VEC2_F32", "byte_offset": verts.nbytes + idx.nbytes, "byte_length": uvs.nbytes},
        {
            "type": "UINT_8",
            "byte_offset": verts.nbytes + idx.nbytes + uvs.nbytes,
            "byte_length": len(png_bytes),
        },
    ]
    ident = np.eye(4, dtype=np.float32).T.reshape(-1).tolist()
    light_mat = np.eye(4, dtype=np.float32)
    light_mat[:3, 3] = [0, 5, 0]
    objects = [
        {"type": "MESH", "matrix": ident, "mesh": 0, "material": 0},
        {"type": "MESH", "matrix": ident, "mesh": 0, "material": 0},
        {
            "type": "CAMERA",
            "matrix": np.eye(4, dtype=np.float32).T.reshape(-1).tolist(),
            "fov_y": 59.0,
        },
    ]
    if with_light:
        objects.append(
            {
                "type": "LIGHT",
                "matrix": light_mat.T.reshape(-1).tolist(),
                "color": [1.0, 0.5, 0.25],
                "energy": 4.0,
                "size": [2.0, 3.0],
            }
        )
    header = {
        "buffer_views": views,
        "meshes": [{"positions": 0, "indices": 1, "texcoords": 2}],
        "images": [{"name": "tex", "view": 3, "color_space": "SRGB"}],
        "materials": [
            {
                "base_color": [0.4, 0.5, 0.6],
                "base_color_texture": 0,
                "metallic": 0.1,
                "specular": 0.2,
                "roughness": 0.3,
                "roughness_texture": {"texture": 0, "channel": 1},
                "specular_tint": 0.0,
                "anisotropic": 0.0,
                "sheen": 0.0,
                "sheen_tint": 0.0,
                "clearcoat": 0.0,
                "clearcoat_roughness": 0.25,
                "ior": 1.45,
                "transmission": 0.0,
            }
        ],
        "objects": objects,
    }
    js = json.dumps(header).encode()
    p = tmp_path / "scene.crts"
    p.write_bytes(struct.pack("<Q", len(js)) + js + blob)
    return str(p)


class TestCrtsLoader:
    def test_full_scene(self, tmp_path):
        scene = load_crts(make_crts(tmp_path))
        assert len(scene.meshes) == 1
        assert scene.meshes[0].geometries[0].num_tris == 1
        np.testing.assert_allclose(
            scene.meshes[0].geometries[0].uvs, [[0, 0], [1, 0], [0, 1]]
        )
        # two MESH objects with same (mesh, material) share one pmesh
        assert len(scene.parameterized_meshes) == 1
        assert len(scene.instances) == 2
        # material params incl. texture channels
        m = scene.materials[0]
        assert is_textured(float_bits(m.base_color[0]))
        rb = float_bits(np.float32(m.roughness))
        assert is_textured(rb) and texture_id(rb) == 0 and texture_channel(rb) == 1
        assert m.ior == pytest.approx(1.45)
        assert m.clearcoat_gloss == pytest.approx(0.25)
        # real light from file
        l = scene.lights[0]
        np.testing.assert_allclose(l.emission, [4.0, 2.0, 1.0])
        np.testing.assert_allclose(l.position, [0, 5, 0])
        np.testing.assert_allclose(l.normal, [0, 0, -1])
        assert l.width == 2.0 and l.height == 3.0
        # camera with the Blender fov factor
        assert scene.cameras[0].fov_y == pytest.approx(59.0 / 1.18)
        # texture color space
        assert scene.textures[0].color_space == ColorSpace.SRGB

    def test_generated_light_when_missing(self, tmp_path):
        scene = load_crts(make_crts(tmp_path, with_light=False))
        assert len(scene.lights) == 1
        np.testing.assert_allclose(scene.lights[0].emission, [10.0] * 3)

    def test_white_diffuse(self, tmp_path):
        scene = load_crts(make_crts(tmp_path), MaterialMode.WHITE_DIFFUSE)
        assert scene.parameterized_meshes[0].material_ids == [0]
        assert len(scene.materials) == 1

    def test_dispatch(self, tmp_path):
        from chameleonrt_tpu.scene.loader import load_scene

        scene = load_scene(make_crts(tmp_path))
        assert scene.total_tris() == 2
