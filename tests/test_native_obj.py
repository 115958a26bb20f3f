"""Native C++ OBJ parser: build availability, semantics equality with the
pure-Python loader, and a generated large-file round trip."""

import numpy as np
import pytest

from chameleonrt_tpu import native
from chameleonrt_tpu.scene.obj_loader import load_obj

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable (g++/make missing)"
)

OBJ = """
mtllib m.mtl
o floor
usemtl a
v -1 0 -1
v 1 0 -1
v 1 0 1
v -1 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 1 0
f 1/1/1 2/2/1 3/3/1 4/4/1
g box
usemtl b
v 0 0 0
v 1 0 0
v 0 1 0
f -3 -2 -1
f 5 6 7
"""

MTL = """
newmtl a
Kd 0.5 0.5 0.5
newmtl b
Kd 0.9 0.1 0.1
Ns 100
"""


@pytest.fixture
def obj_path(tmp_path):
    (tmp_path / "t.obj").write_text(OBJ)
    (tmp_path / "m.mtl").write_text(MTL)
    return str(tmp_path / "t.obj")


def test_native_matches_python(obj_path):
    s_native = load_obj(obj_path, use_native=True)
    s_python = load_obj(obj_path, use_native=False)
    assert len(s_native.meshes[0].geometries) == len(s_python.meshes[0].geometries)
    for gn, gp in zip(s_native.meshes[0].geometries, s_python.meshes[0].geometries):
        np.testing.assert_allclose(gn.vertices, gp.vertices)
        np.testing.assert_array_equal(gn.indices, gp.indices)
        if gp.uvs is not None:
            np.testing.assert_allclose(gn.uvs, gp.uvs)
        if gp.normals is not None:
            np.testing.assert_allclose(gn.normals, gp.normals, atol=1e-6)
    assert (
        s_native.parameterized_meshes[0].material_ids
        == s_python.parameterized_meshes[0].material_ids
    )
    assert len(s_native.materials) == len(s_python.materials)
    for mn, mp in zip(s_native.materials, s_python.materials):
        np.testing.assert_allclose(mn.pack(), mp.pack())


def test_negative_indices_and_fan(obj_path):
    scene = load_obj(obj_path, use_native=True)
    geoms = scene.meshes[0].geometries
    assert len(geoms) == 2
    assert geoms[0].num_tris == 2  # quad fan
    assert geoms[1].num_tris == 2  # negative-index tri + duplicate tri


def test_large_generated_obj(tmp_path):
    """Round-trip a ~60K-tri generated OBJ through the native parser."""
    rs = np.random.default_rng(0)
    n = 20000
    verts = rs.uniform(-1, 1, (3 * n, 3))
    lines = ["o big"]
    for v in verts:
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    for i in range(n):
        lines.append(f"f {3*i+1} {3*i+2} {3*i+3}")
    p = tmp_path / "big.obj"
    p.write_text("\n".join(lines))
    shapes, mtllibs = native.parse_obj_native(str(p))
    assert len(shapes) == 1
    assert shapes[0].indices.shape == (n, 3)
    assert shapes[0].vertices.shape == (3 * n, 3)
    np.testing.assert_allclose(shapes[0].vertices[:5], verts[:5].astype(np.float32), atol=1e-5)
