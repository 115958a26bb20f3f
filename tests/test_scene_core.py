"""Tests for the host scene core: texture-handle encoding, scene containers,
procedural scenes, OBJ loader, PNG/TGA IO."""

import os

import numpy as np
import pytest

from chameleonrt_tpu.scene import texture_mask
from chameleonrt_tpu.scene.loader import load_scene
from chameleonrt_tpu.scene.obj_loader import load_obj
from chameleonrt_tpu.scene.procedural import cornell_box, hall, instanced_grid
from chameleonrt_tpu.scene.types import DisneyMaterial, MaterialMode, Scene
from chameleonrt_tpu.utils import png
from chameleonrt_tpu.utils.image_io import read_image, write_image


class TestTextureMask:
    """The bit encoding must match reference util/texture_channel_mask.h:16-23."""

    def test_roundtrip(self):
        for tex_id in (0, 1, 42, 0x1FFFFFFF):
            for channel in range(4):
                handle = texture_mask.make_texture_handle(tex_id, channel)
                bits = texture_mask.float_bits(handle)
                assert texture_mask.is_textured(bits)
                assert texture_mask.texture_id(bits) == tex_id
                assert texture_mask.texture_channel(bits) == channel

    def test_plain_scalars_not_textured(self):
        for v in (0.0, 0.5, 1.0, 123.0):
            assert not texture_mask.is_textured(texture_mask.float_bits(v))

    def test_handle_is_negative_float(self):
        # sign bit set -> reinterpreted float is negative (or negative zero)
        h = texture_mask.make_texture_handle(7, 2)
        assert np.signbit(np.float32(h))

    def test_vectorized(self):
        handles = np.array(
            [texture_mask.make_texture_handle(i, i % 4) for i in range(8)], np.float32
        )
        bits = texture_mask.float_bits(handles)
        np.testing.assert_array_equal(texture_mask.texture_id(bits), np.arange(8))
        np.testing.assert_array_equal(texture_mask.texture_channel(bits), np.arange(8) % 4)


class TestSceneContainers:
    def test_cornell_counts(self):
        scene = cornell_box()
        assert scene.unique_tris() == scene.total_tris()
        assert scene.unique_tris() == 6 + 24 + 2 + 2  # walls+2 boxes, red, green
        assert scene.num_geometries() == 3
        assert len(scene.lights) == 1
        assert len(scene.cameras) == 1

    def test_instancing_totals(self):
        scene = instanced_grid(nx=2, ny=3, subdiv=0)
        assert len(scene.instances) == 6
        assert scene.total_tris() == 6 * scene.meshes[0].num_tris
        assert scene.unique_tris() == scene.meshes[0].num_tris

    def test_validate_materials_appends_default(self):
        scene = cornell_box()
        scene.parameterized_meshes[0].material_ids = [-1, 1, 2]
        n_before = len(scene.materials)
        scene.validate_materials()
        assert len(scene.materials) == n_before + 1
        assert scene.parameterized_meshes[0].material_ids[0] == n_before

    def test_hall_tri_count_scale(self):
        scene = hall(columns=4, subdiv=1)
        assert scene.unique_tris() > 1000

    def test_material_pack_layout(self):
        m = DisneyMaterial(metallic=0.25, ior=1.33)
        rec = m.pack()
        assert rec.shape == (14,)
        assert rec[3] == np.float32(0.25)
        assert rec[12] == np.float32(1.33)


CORNELL_OBJ = """
# cornell-ish test fixture
mtllib test.mtl
o floor
usemtl white
v -1 0 -1
v 1 0 -1
v 1 0 1
v -1 0 1
vn 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
o wall
usemtl red
v -1 0 -1
v -1 2 -1
v -1 2 1
f 5//1 6//1 7//1
"""

TEST_MTL = """
newmtl white
Kd 0.73 0.73 0.73
Ns 10
newmtl red
Kd 0.63 0.06 0.04
Ns 250
"""


class TestObjLoader:
    @pytest.fixture
    def obj_path(self, tmp_path):
        (tmp_path / "test.obj").write_text(CORNELL_OBJ)
        (tmp_path / "test.mtl").write_text(TEST_MTL)
        return str(tmp_path / "test.obj")

    def test_loads_shapes_and_materials(self, obj_path):
        scene = load_obj(obj_path)
        assert len(scene.meshes) == 1
        mesh = scene.meshes[0]
        assert len(mesh.geometries) == 2
        # quad triangulated into 2 tris; single tri wall
        assert mesh.geometries[0].num_tris == 2
        assert mesh.geometries[1].num_tris == 1
        assert len(scene.materials) == 2
        np.testing.assert_allclose(
            scene.materials[0].base_color, [0.73, 0.73, 0.73], rtol=1e-6
        )
        # MTL conversion: specular = Ns/500, roughness = 1 - specular
        assert scene.materials[1].specular == pytest.approx(0.5)
        assert scene.materials[1].roughness == pytest.approx(0.5)
        assert scene.parameterized_meshes[0].material_ids == [0, 1]
        # generated light (reference scene.cpp:218-227)
        assert len(scene.lights) == 1
        np.testing.assert_allclose(scene.lights[0].emission, [20.0] * 3)
        assert scene.lights[0].width == 5.0

    def test_vertex_remap_shares_triples(self, obj_path):
        scene = load_obj(obj_path)
        geom = scene.meshes[0].geometries[0]
        # The quad has 4 unique (v,vn,vt) triples -> 4 packed vertices
        assert geom.vertices.shape == (4, 3)
        assert geom.uvs.shape == (4, 2)
        assert geom.normals.shape == (4, 3)

    def test_white_diffuse_mode(self, obj_path):
        scene = load_obj(obj_path, MaterialMode.WHITE_DIFFUSE)
        # all material ids remapped to the appended default material
        assert len(scene.materials) == 1
        np.testing.assert_allclose(scene.materials[0].base_color, [0.9] * 3)
        assert all(
            mid == 0 for mid in scene.parameterized_meshes[0].material_ids
        )

    def test_dispatch_by_extension(self, obj_path):
        scene = load_scene(obj_path)
        assert isinstance(scene, Scene)

    def test_proc_scheme(self):
        scene = load_scene("proc://cornell")
        assert scene.unique_tris() == 34
        scene_wd = load_scene("proc://cornell", MaterialMode.WHITE_DIFFUSE)
        assert len(scene_wd.materials) == 1


class TestImageIO:
    def test_png_roundtrip_rgb(self, tmp_path):
        img = (np.arange(5 * 7 * 3).reshape(5, 7, 3) * 7 % 256).astype(np.uint8)
        p = str(tmp_path / "t.png")
        png.write_png(p, img)
        out = png.read_png(p)
        np.testing.assert_array_equal(out, img)

    def test_png_roundtrip_rgba_and_gray(self, tmp_path):
        for c in (1, 2, 4):
            img = np.random.default_rng(c).integers(0, 256, (9, 4, c), dtype=np.uint8)
            p = str(tmp_path / f"t{c}.png")
            png.write_png(p, img)
            np.testing.assert_array_equal(png.read_png(p), img)

    def test_write_image_dispatch(self, tmp_path):
        img = np.zeros((2, 2, 3), np.uint8)
        p = str(tmp_path / "x.png")
        write_image(p, img)
        assert os.path.exists(p)
        assert read_image(p).shape == (2, 2, 3)


class TestDeviceShadeRows:
    def test_device_assembly_matches_host(self, monkeypatch):
        """The >1M-tri device-side shade-row assembly must produce exactly
        the host-filled table (same layout incl. bitcast int columns)."""
        import numpy as np

        from chameleonrt_tpu.engine import device_scene as ds
        from chameleonrt_tpu.scene.loader import load_scene

        for url in ("proc://cornell", "proc://hall?subdiv=1&textured=1&columns=2"):
            host_flat, _ = ds.build_device_scene(load_scene(url))
            monkeypatch.setattr(ds, "SHADE_ROWS_DEVICE_MIN", 0)
            dev_flat, _ = ds.build_device_scene(load_scene(url))
            monkeypatch.undo()
            a = np.asarray(host_flat.shade_rows)
            b = np.asarray(dev_flat.shade_rows)
            assert a.shape == b.shape
            np.testing.assert_array_equal(
                a.view(np.uint32), b.view(np.uint32), err_msg=url
            )
