"""Procedural benchmark/test scenes.

The reference is benchmarked on downloaded scenes (Sponza, Rungholt, San
Miguel; README.md:9-11). This environment ships no assets, so the framework
provides deterministic procedural scenes with comparable triangle counts and
divergence characteristics for tests and benchmarks. They are also exposed
through the CLI via the ``proc://`` scheme (e.g. ``proc://cornell``).
"""

from __future__ import annotations

import numpy as np

from chameleonrt_tpu.scene.types import (
    Camera,
    DisneyMaterial,
    Geometry,
    Instance,
    Mesh,
    ParameterizedMesh,
    QuadLight,
    Scene,
    ortho_basis,
)


def _quad(a, b, c, d):
    """Two triangles for quad a-b-c-d (ccw)."""
    verts = np.array([a, b, c, d], dtype=np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.uint32)
    return verts, idx


def _merge(parts):
    verts = []
    idx = []
    off = 0
    for v, i in parts:
        verts.append(v)
        idx.append(i + off)
        off += len(v)
    return np.concatenate(verts), np.concatenate(idx)


def _box(lo, hi):
    """Axis-aligned box as 12 triangles with outward normals."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    parts = [
        _quad([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]),  # +z
        _quad([x1, y0, z0], [x0, y0, z0], [x0, y1, z0], [x1, y1, z0]),  # -z
        _quad([x1, y0, z1], [x1, y0, z0], [x1, y1, z0], [x1, y1, z1]),  # +x
        _quad([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0]),  # -x
        _quad([x0, y1, z1], [x1, y1, z1], [x1, y1, z0], [x0, y1, z0]),  # +y
        _quad([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1]),  # -y
    ]
    return _merge(parts)


def cornell_box(light_emission: float = 10.0) -> Scene:
    """The classic Cornell box: white floor/ceiling/back, red left wall,
    green right wall, two boxes, quad light at the ceiling."""
    scene = Scene()
    white = DisneyMaterial(base_color=np.array([0.73, 0.73, 0.73], np.float32))
    red = DisneyMaterial(base_color=np.array([0.65, 0.05, 0.05], np.float32))
    green = DisneyMaterial(base_color=np.array([0.12, 0.45, 0.15], np.float32))
    scene.materials = [white, red, green]

    s = 1.0  # half-extent; box spans [-1, 1]^3 with open front
    white_parts = [
        _quad([-s, -s, -s], [s, -s, -s], [s, -s, s], [-s, -s, s]),  # floor
        _quad([-s, s, s], [s, s, s], [s, s, -s], [-s, s, -s]),  # ceiling
        _quad([s, -s, -s], [-s, -s, -s], [-s, s, -s], [s, s, -s]),  # back wall
    ]
    # Two interior boxes
    white_parts.append(_box([-0.65, -1.0, -0.6], [-0.05, 0.2, -0.05]))
    white_parts.append(_box([0.1, -1.0, -0.2], [0.65, -0.45, 0.45]))
    wv, wi = _merge(white_parts)
    lv, li = _quad([-s, -s, -s], [-s, -s, s], [-s, s, s], [-s, s, -s])  # left (red)
    rv, ri = _quad([s, -s, s], [s, -s, -s], [s, s, -s], [s, s, s])  # right (green)

    mesh = Mesh(
        geometries=[
            Geometry(vertices=wv, indices=wi),
            Geometry(vertices=lv, indices=li),
            Geometry(vertices=rv, indices=ri),
        ]
    )
    scene.meshes = [mesh]
    scene.parameterized_meshes = [ParameterizedMesh(0, [0, 1, 2])]
    scene.instances = [Instance(np.eye(4, dtype=np.float32), 0)]

    normal = np.array([0.0, -1.0, 0.0], np.float32)
    v_x, v_y = ortho_basis(normal)
    width, height = 0.5, 0.5
    # Quad spans position + [0,w]*v_x + [0,h]*v_y; center it at the ceiling.
    position = (
        np.array([0.0, 0.99, 0.0], np.float32) - 0.5 * width * v_x - 0.5 * height * v_y
    )
    scene.lights = [
        QuadLight(
            emission=np.full(3, light_emission, np.float32),
            position=position,
            normal=normal,
            v_x=v_x,
            v_y=v_y,
            width=width,
            height=height,
        )
    ]
    scene.cameras = [
        Camera(
            position=np.array([0.0, 0.0, 3.6], np.float32),
            center=np.zeros(3, np.float32),
            up=np.array([0.0, 1.0, 0.0], np.float32),
            fov_y=40.0,
        )
    ]
    return scene


def _subdivide_quads(verts, idx, levels: int):
    """Subdivide each triangle (1 -> 4) `levels` times to raise tri count."""
    for _ in range(levels):
        v0 = verts[idx[:, 0]]
        v1 = verts[idx[:, 1]]
        v2 = verts[idx[:, 2]]
        m01 = 0.5 * (v0 + v1)
        m12 = 0.5 * (v1 + v2)
        m20 = 0.5 * (v2 + v0)
        base = len(verts)
        n = len(idx)
        verts = np.concatenate([verts, m01, m12, m20]).astype(np.float32)
        a = idx[:, 0]
        b = idx[:, 1]
        c = idx[:, 2]
        i01 = base + np.arange(n, dtype=np.uint32)
        i12 = base + n + np.arange(n, dtype=np.uint32)
        i20 = base + 2 * n + np.arange(n, dtype=np.uint32)
        idx = np.concatenate(
            [
                np.stack([a, i01, i20], 1),
                np.stack([i01, b, i12], 1),
                np.stack([i20, i12, c], 1),
                np.stack([i01, i12, i20], 1),
            ]
        ).astype(np.uint32)
    return verts, idx


def hall(columns: int = 8, subdiv: int = 3, seed: int = 7, textured: int = 0) -> Scene:
    """"Sponza-like" procedural atrium: a long hall with rows of columns,
    boxes, and subdivided walls. With the defaults it lands around 250-300K
    triangles, similar to Sponza's ~260K, with comparable occlusion and
    divergence character (long sight lines, many small occluders).
    ``textured=1`` adds a procedural diffuse texture (Sponza is textured, so
    benchmarks should exercise the atlas-sampling path) with box-projected
    UVs."""
    rng = np.random.default_rng(seed)
    L, W, H = 20.0, 8.0, 6.0
    # Open-topped atrium like Sponza: partial ceiling slabs along the rims,
    # open in the middle so the overhead quad light illuminates the interior.
    parts = [
        _quad([-L, 0, -W], [L, 0, -W], [L, 0, W], [-L, 0, W]),  # floor
        _quad([-L, H, W], [L, H, W], [L, H, W - 2.5], [-L, H, W - 2.5]),  # rim +z
        _quad([-L, H, -W + 2.5], [L, H, -W + 2.5], [L, H, -W], [-L, H, -W]),  # rim -z
        _quad([-L, 0, W], [L, 0, W], [L, H, W], [-L, H, W]),  # +z wall
        _quad([L, 0, -W], [-L, 0, -W], [-L, H, -W], [L, H, -W]),  # -z wall
        _quad([-L, 0, -W], [-L, 0, W], [-L, H, W], [-L, H, -W]),  # -x wall
        _quad([L, 0, W], [L, 0, -W], [L, H, -W], [L, H, W]),  # +x wall
    ]
    # Colonnades: two rows of square columns
    xs = np.linspace(-L + 2.0, L - 2.0, columns)
    for x in xs:
        for z in (-W + 2.0, W - 2.0):
            parts.append(_box([x - 0.4, 0.0, z - 0.4], [x + 0.4, H - 1.0, z + 0.4]))
            # capital on top of each column
            parts.append(_box([x - 0.6, H - 1.0, z - 0.6], [x + 0.6, H - 0.7, z + 0.6]))
    # Clutter boxes on the floor
    for _ in range(40):
        cx = rng.uniform(-L + 1, L - 1)
        cz = rng.uniform(-W + 1, W - 1)
        sx, sy, sz = rng.uniform(0.2, 1.2, 3)
        parts.append(_box([cx - sx, 0.0, cz - sz], [cx + sx, sy, cz + sz]))
    verts, idx = _merge(parts)
    verts, idx = _subdivide_quads(verts, idx, subdiv)

    scene = Scene()
    mat = DisneyMaterial(base_color=np.array([0.75, 0.71, 0.68], np.float32))
    uvs = None
    if textured:
        from chameleonrt_tpu.scene.types import ColorSpace, Image

        # procedural brick-ish texture (deterministic)
        ty, tx = np.mgrid[0:256, 0:256]
        brick = ((ty // 32 + tx // 64) % 2) * 60 + 140
        mortar = ((ty % 32 < 3) | (tx % 64 < 3)).astype(np.uint8) * 255
        noise = np.random.default_rng(3).integers(0, 25, (256, 256), np.uint8)
        r = np.clip(brick * 0.9 + noise - mortar * 0.3, 0, 255).astype(np.uint8)
        g = np.clip(brick * 0.55 + noise - mortar * 0.25, 0, 255).astype(np.uint8)
        b = np.clip(brick * 0.45 + noise - mortar * 0.2, 0, 255).astype(np.uint8)
        tex = np.stack([r, g, b], axis=-1)
        scene.textures.append(Image(name="brick", data=tex, color_space=ColorSpace.SRGB))
        mat.set_color_texture(0)
        # box-projected UVs from the two largest-extent axes per vertex
        uvs = (verts[:, [0, 1]] + verts[:, [2, 2]] * 0.25) * 0.5
        uvs = uvs.astype(np.float32)
    scene.materials = [mat]
    scene.meshes = [
        Mesh(geometries=[Geometry(vertices=verts, indices=idx, uvs=uvs)])
    ]
    scene.parameterized_meshes = [ParameterizedMesh(0, [0])]
    scene.instances = [Instance(np.eye(4, dtype=np.float32), 0)]

    # sun-like quad above the open atrium roof, tilted slightly
    normal = np.array([0.15, -0.95, 0.1], np.float32)
    normal /= np.linalg.norm(normal)
    v_x, v_y = ortho_basis(normal)
    width, height = 10.0, 4.0
    position = (
        np.array([0.0, H + 4.0, 0.0], np.float32)
        - 0.5 * width * v_x
        - 0.5 * height * v_y
    )
    scene.lights = [
        QuadLight(
            emission=np.full(3, 25.0, np.float32),
            position=position,
            normal=normal,
            v_x=v_x,
            v_y=v_y,
            width=width,
            height=height,
        )
    ]
    scene.cameras = [
        Camera(
            position=np.array([-16.0, 3.0, 0.0], np.float32),
            center=np.array([10.0, 2.0, 0.0], np.float32),
            up=np.array([0.0, 1.0, 0.0], np.float32),
            fov_y=65.0,
        )
    ]
    return scene


def random_triangles(n_tris: int = 256, seed: int = 1, spread: float = 1.0) -> Scene:
    """Random triangle soup in [-spread, spread]^3 — stress-test scene for
    BVH build/traversal correctness checks against brute force."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n_tris, 1, 3))
    offsets = rng.normal(0.0, 0.12 * spread, (n_tris, 3, 3))
    verts = (centers + offsets).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n_tris * 3, dtype=np.uint32).reshape(-1, 3)

    scene = Scene()
    scene.materials = [DisneyMaterial()]
    scene.meshes = [Mesh(geometries=[Geometry(vertices=verts, indices=idx)])]
    scene.parameterized_meshes = [ParameterizedMesh(0, [0])]
    scene.instances = [Instance(np.eye(4, dtype=np.float32), 0)]
    from chameleonrt_tpu.scene.types import default_obj_light

    scene.lights = [default_obj_light()]
    scene.cameras = [
        Camera(
            position=np.array([0.0, 0.0, 4.0 * spread], np.float32),
            center=np.zeros(3, np.float32),
            up=np.array([0.0, 1.0, 0.0], np.float32),
            fov_y=55.0,
        )
    ]
    return scene


def instanced_grid(nx: int = 4, ny: int = 4, subdiv: int = 1) -> Scene:
    """A grid of instances of one box mesh — exercises the instancing path
    (multiple Instances sharing a ParameterizedMesh, reference util/mesh.h:40-47)."""
    verts, idx = _box([-0.4, -0.4, -0.4], [0.4, 0.4, 0.4])
    verts, idx = _subdivide_quads(verts, idx, subdiv)
    scene = Scene()
    scene.materials = [
        DisneyMaterial(base_color=np.array([0.8, 0.3, 0.25], np.float32)),
        DisneyMaterial(base_color=np.array([0.25, 0.5, 0.8], np.float32)),
    ]
    scene.meshes = [Mesh(geometries=[Geometry(vertices=verts, indices=idx)])]
    scene.parameterized_meshes = [
        ParameterizedMesh(0, [0]),
        ParameterizedMesh(0, [1]),
    ]
    for i in range(nx):
        for j in range(ny):
            t = np.eye(4, dtype=np.float32)
            t[0, 3] = (i - (nx - 1) / 2) * 1.5
            t[1, 3] = (j - (ny - 1) / 2) * 1.5
            # alternate materials and add some rotation for non-axis-aligned AABBs
            ang = 0.4 * (i + 2 * j)
            c, s = np.cos(ang), np.sin(ang)
            rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            t[:3, :3] = rot
            scene.instances.append(Instance(t, (i + j) % 2))
    from chameleonrt_tpu.scene.types import default_obj_light

    scene.lights = [default_obj_light()]
    scene.cameras = [
        Camera(
            position=np.array([0.0, 0.0, max(nx, ny) * 2.2], np.float32),
            center=np.zeros(3, np.float32),
            up=np.array([0.0, 1.0, 0.0], np.float32),
            fov_y=55.0,
        )
    ]
    return scene


PROCEDURAL_SCENES = {
    "cornell": cornell_box,
    "hall": hall,
    "random": random_triangles,
    "instances": instanced_grid,
}


def make_procedural(name: str, **kwargs) -> Scene:
    if name not in PROCEDURAL_SCENES:
        raise ValueError(
            f"unknown procedural scene '{name}'; have {sorted(PROCEDURAL_SCENES)}"
        )
    return PROCEDURAL_SCENES[name](**kwargs)
