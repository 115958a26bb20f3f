"""PBRT v3 loader tests with synthesized scenes (parser subset per
reference util/scene.cpp:626-933)."""

import numpy as np
import pytest

from chameleonrt_tpu.scene.pbrt_loader import load_pbrt, read_ply
from chameleonrt_tpu.scene.types import MaterialMode

PBRT_SCENE = """
LookAt 0 1 5   0 0 0   0 1 0
Camera "perspective" "float fov" [50]
WorldBegin
AttributeBegin
  Material "matte" "rgb Kd" [0.7 0.2 0.1]
  Shape "trianglemesh"
    "point P" [-1 0 -1   1 0 -1   1 0 1   -1 0 1]
    "integer indices" [0 1 2 0 2 3]
    "float uv" [0 0  1 0  1 1  0 1]
AttributeEnd
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [10 8 6]
  Translate 0 3 0
  Shape "trianglemesh"
    "point P" [-0.5 0 -0.5  0.5 0 -0.5  0.5 0 0.5  -0.5 0 0.5]
    "integer indices" [0 1 2 0 2 3]
AttributeEnd
ObjectBegin "box"
  Material "plastic" "rgb Kd" [0.2 0.4 0.8] "rgb Ks" [0.5 0.5 0.5] "float roughness" [0.2]
  Shape "trianglemesh"
    "point P" [0 0 0  1 0 0  1 1 0]
    "integer indices" [0 1 2]
ObjectEnd
ObjectInstance "box"
AttributeBegin
  Translate 2 0 0
  ObjectInstance "box"
AttributeEnd
WorldEnd
"""


class TestPbrtLoader:
    @pytest.fixture
    def scene(self, tmp_path):
        p = tmp_path / "s.pbrt"
        p.write_text(PBRT_SCENE)
        return load_pbrt(str(p))

    def test_geometry_and_instances(self, scene):
        # floor + light quad as world-level shapes, box object instanced twice
        assert scene.total_tris() > scene.unique_tris()
        assert len(scene.instances) == 4  # floor, light quad, 2 box instances
        box_insts = [i for i in scene.instances if i.transform[0, 3] != 0.0]
        assert len(box_insts) == 1
        np.testing.assert_allclose(box_insts[0].transform[:3, 3], [2, 0, 0])

    def test_materials_converted(self, scene):
        # matte -> base_color Kd; plastic -> specular = luminance(Ks)
        mats = scene.materials
        matte = mats[0]
        np.testing.assert_allclose(matte.base_color, [0.7, 0.2, 0.1], rtol=1e-6)
        plastic = mats[1]
        np.testing.assert_allclose(plastic.base_color, [0.2, 0.4, 0.8], rtol=1e-6)
        assert plastic.specular == pytest.approx(0.5, rel=1e-4)
        assert plastic.roughness == pytest.approx(0.2)

    def test_area_light(self, scene):
        assert len(scene.lights) == 1
        l = scene.lights[0]
        np.testing.assert_allclose(l.emission, [10, 8, 6])
        # centered at (0,3,0), 1x1 quad
        center = l.position + 0.5 * l.width * l.v_x + 0.5 * l.height * l.v_y
        np.testing.assert_allclose(center, [0, 3, 0], atol=1e-5)
        assert l.width == pytest.approx(1.0, rel=1e-4)

    def test_camera(self, scene):
        assert len(scene.cameras) == 1
        cam = scene.cameras[0]
        np.testing.assert_allclose(cam.position, [0, 1, 5], atol=1e-5)
        assert cam.fov_y == pytest.approx(50.0)

    def test_white_diffuse(self, tmp_path):
        p = tmp_path / "s.pbrt"
        p.write_text(PBRT_SCENE)
        scene = load_pbrt(str(p), MaterialMode.WHITE_DIFFUSE)
        assert len(scene.materials) == 1

    def test_renders(self, tmp_path):
        from chameleonrt_tpu.core import get_backend

        p = tmp_path / "s.pbrt"
        p.write_text(PBRT_SCENE)
        scene = load_pbrt(str(p))
        b = get_backend("tpu")
        b.initialize(24, 24)
        b.set_scene(scene)
        cam = scene.cameras[0]
        d = cam.center - cam.position
        d /= np.linalg.norm(d)
        st = b.render(cam.position, d, cam.up, cam.fov_y, True)
        assert st.rays_traced > 0
        assert np.isfinite(np.asarray(b._accum)).all()


class TestPly:
    def test_ascii_ply(self, tmp_path):
        ply = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 2
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
3 0 1 2
3 0 2 3
"""
        p = tmp_path / "t.ply"
        p.write_text(ply)
        v, idx, uv = read_ply(str(p))
        assert v.shape == (4, 3)
        np.testing.assert_array_equal(idx, [[0, 1, 2], [0, 2, 3]])

    def test_binary_ply(self, tmp_path):
        import struct

        header = (
            b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex 3\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property float u\nproperty float v\n"
            b"element face 1\n"
            b"property list uchar uint vertex_indices\n"
            b"end_header\n"
        )
        verts = np.array(
            [[0, 0, 0, 0, 0], [1, 0, 0, 1, 0], [0, 1, 0, 0, 1]], np.float32
        )
        body = verts.tobytes() + struct.pack("<BIII", 3, 0, 1, 2)
        p = tmp_path / "b.ply"
        p.write_bytes(header + body)
        v, idx, uv = read_ply(str(p))
        np.testing.assert_allclose(v, verts[:, :3])
        np.testing.assert_allclose(uv, verts[:, 3:])
        np.testing.assert_array_equal(idx, [[0, 1, 2]])

    def test_quad_fan_triangulation(self, tmp_path):
        ply = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
4 0 1 2 3
"""
        p = tmp_path / "q.ply"
        p.write_text(ply)
        _, idx, _ = read_ply(str(p))
        assert idx.shape == (2, 3)


def test_san_miguel_proxy_generator(tmp_path):
    """The bench-time San Miguel-class generator must round-trip through
    the PBRT loader: PLY meshes, ObjectInstance instancing, named
    materials, the quad area light, LookAt camera (BASELINE configs[4];
    reference util/scene.cpp:626-933)."""
    import numpy as np

    from chameleonrt_tpu.scene.pbrt_gen import generate_san_miguel_proxy
    from chameleonrt_tpu.scene.loader import load_scene

    path = generate_san_miguel_proxy(
        str(tmp_path), col_subdiv=1, leaf_tris=400, canopy_instances=4
    )
    scene = load_scene(path)
    assert scene.total_tris() > 3 * scene.unique_tris()  # instancing real
    assert len(scene.instances) > 50
    assert len(scene.lights) == 1 and float(scene.lights[0].emission[0]) > 1
    assert len(scene.cameras) == 1
    assert len(scene.materials) >= 4
    # renders end-to-end through the unified TLAS path
    from chameleonrt_tpu.core import get_backend

    b = get_backend("tpu")
    b.initialize(48, 32)
    b.set_scene(scene)
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    b.render(cam.position, d, cam.up, cam.fov_y, camera_changed=True)
    img = b.img[..., :3]
    assert (img.sum(-1) > 0).mean() > 0.3
