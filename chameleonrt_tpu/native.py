"""ctypes bindings for the native C++ runtime components (native/).

The reference's loaders are native C++ (tinyobjloader et al.); here the hot
loader path — OBJ geometry scanning + (v,vn,vt)-triple remapping — is a C++
shared library built by `make -C native`, bound over a plain C ABI. Missing
or unbuildable library degrades gracefully to the pure-Python loaders
(identical semantics, tested against each other).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcrt_native.so")

_lib = None
_tried = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:  # noqa: BLE001
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.crt_obj_parse.restype = ctypes.c_void_p
    lib.crt_obj_parse.argtypes = [ctypes.c_char_p]
    lib.crt_obj_error.restype = ctypes.c_char_p
    lib.crt_obj_error.argtypes = [ctypes.c_void_p]
    lib.crt_obj_num_shapes.restype = ctypes.c_int32
    lib.crt_obj_num_shapes.argtypes = [ctypes.c_void_p]
    lib.crt_obj_num_mtllibs.restype = ctypes.c_int32
    lib.crt_obj_num_mtllibs.argtypes = [ctypes.c_void_p]
    lib.crt_obj_mtllib.restype = ctypes.c_char_p
    lib.crt_obj_mtllib.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.crt_obj_shape_counts.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.crt_obj_shape_material.restype = ctypes.c_char_p
    lib.crt_obj_shape_material.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.crt_obj_shape_data.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.crt_obj_free.argtypes = [ctypes.c_void_p]
    lib.crt_bvh_build.restype = ctypes.c_void_p
    lib.crt_bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.crt_bvh_num_internal.restype = ctypes.c_int64
    lib.crt_bvh_num_internal.argtypes = [ctypes.c_void_p]
    lib.crt_bvh_num_leaves.restype = ctypes.c_int64
    lib.crt_bvh_num_leaves.argtypes = [ctypes.c_void_p]
    lib.crt_bvh_max_depth.restype = ctypes.c_int32
    lib.crt_bvh_max_depth.argtypes = [ctypes.c_void_p]
    lib.crt_bvh_nodes.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.crt_bvh_leaf_rows.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.crt_bvh_num_nodes4.restype = ctypes.c_int64
    lib.crt_bvh_num_nodes4.argtypes = [ctypes.c_void_p]
    lib.crt_bvh_max_stack4.restype = ctypes.c_int32
    lib.crt_bvh_max_stack4.argtypes = [ctypes.c_void_p]
    lib.crt_bvh_nodes4.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.crt_bvh_build_w.restype = ctypes.c_void_p
    lib.crt_bvh_build_w.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.crt_bvh_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def build_bvh_native(v0, e1, e2, leaf_size: int):
    """Binned-SAH packed-BVH build in native C++ (native/bvhbuilder.cpp).

    Returns (nodes (n_internal, 16) f32, leaf_rows (n_leaves, 10*leaf_size)
    f32, max_depth) as numpy arrays in the exact PackedBvh layout, or None
    when the native library is unavailable (callers fall back to the
    on-device LBVH). Replaces the role of rtcCommitScene's SAH build
    (reference backends/embree/embree_utils.cpp:63-83)."""
    lib = get_lib()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = v0.shape[0]
    if n == 0:
        return None
    fptr = ctypes.POINTER(ctypes.c_float)
    handle = lib.crt_bvh_build(
        v0.ctypes.data_as(fptr),
        e1.ctypes.data_as(fptr),
        e2.ctypes.data_as(fptr),
        n,
        leaf_size,
    )
    if not handle:
        return None
    try:
        n_internal = lib.crt_bvh_num_internal(handle)
        n_leaves = lib.crt_bvh_num_leaves(handle)
        nodes = np.empty((n_internal, 16), np.float32)
        leaf_rows = np.empty((n_leaves, 10 * leaf_size), np.float32)
        lib.crt_bvh_nodes(handle, nodes.ctypes.data_as(fptr))
        lib.crt_bvh_leaf_rows(handle, leaf_rows.ctypes.data_as(fptr))
        return nodes, leaf_rows, int(lib.crt_bvh_max_depth(handle))
    finally:
        lib.crt_bvh_free(handle)


def build_bvh_pair_native(v0, e1, e2, leaf_size: int, wide_arity: int = 4,
                          pad_to=None):
    """One binned-SAH build, both packed layouts: the binary 16-float-row
    table (XLA-fallback closest traversal + parity oracle) and the
    collapsed W-wide 8W-float-row table (the packet kernels' production
    table for both closest and occlusion — the kernels are fetch-bound at
    ~70 ns per scalar-indexed row fetch, so wider rows that halve the rows
    touched per ray are a direct win; BVH4 measured any-hit 495 -> 376 ms
    on the v5e hall, BVH8 halves internal rows again).

    pad_to: optional int->int row-count bucketing function. The tables are
    allocated at the bucketed row count up front (np.zeros = untouched
    zero pages) and the native fill writes only the real rows — a separate
    np.pad afterwards would copy ~700 MB at 6.7M tris.

    Returns (nodes2, nodesw, leaf_rows, depth2, max_stackw) numpy arrays /
    ints, or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = v0.shape[0]
    if n == 0:
        return None
    fptr = ctypes.POINTER(ctypes.c_float)
    handle = lib.crt_bvh_build_w(
        v0.ctypes.data_as(fptr),
        e1.ctypes.data_as(fptr),
        e2.ctypes.data_as(fptr),
        n,
        leaf_size,
        wide_arity,
    )
    if not handle:
        return None
    pad = pad_to if pad_to is not None else (lambda r: r)
    try:
        n_internal = lib.crt_bvh_num_internal(handle)
        nw = lib.crt_bvh_num_nodes4(handle)
        n_leaves = lib.crt_bvh_num_leaves(handle)
        nodes2 = np.zeros((pad(n_internal), 16), np.float32)
        nodesw = np.zeros((pad(nw), 8 * wide_arity), np.float32)
        leaf_rows = np.zeros((pad(n_leaves), 10 * leaf_size), np.float32)
        lib.crt_bvh_nodes(handle, nodes2.ctypes.data_as(fptr))
        lib.crt_bvh_nodes4(handle, nodesw.ctypes.data_as(fptr))
        lib.crt_bvh_leaf_rows(handle, leaf_rows.ctypes.data_as(fptr))
        return (
            nodes2,
            nodesw,
            leaf_rows,
            int(lib.crt_bvh_max_depth(handle)),
            int(lib.crt_bvh_max_stack4(handle)),
        )
    finally:
        lib.crt_bvh_free(handle)


def build_bvh4_native(v0, e1, e2, leaf_size: int):
    """4-wide-only variant of build_bvh_pair_native. Returns (nodes4,
    leaf_rows, max_stack) or None."""
    res = build_bvh_pair_native(v0, e1, e2, leaf_size)
    if res is None:
        return None
    _, nodes4, leaf_rows, _, max_stack4 = res
    return nodes4, leaf_rows, max_stack4


class NativeObjShape:
    def __init__(self, vertices, normals, uvs, indices, material: str, mixed: bool):
        self.vertices = vertices
        self.normals = normals
        self.uvs = uvs
        self.indices = indices
        self.material = material
        self.mixed_materials = mixed


def parse_obj_native(path: str) -> Optional[Tuple[List[NativeObjShape], List[str]]]:
    """Parse OBJ geometry with the native library. Returns (shapes,
    mtllib names) or None if the native path is unavailable/failed."""
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.crt_obj_parse(path.encode())
    if not handle:
        return None
    try:
        err = lib.crt_obj_error(handle)
        if err:
            raise IOError(err.decode())
        shapes = []
        for si in range(lib.crt_obj_num_shapes(handle)):
            nv = ctypes.c_int64()
            nt = ctypes.c_int64()
            hn = ctypes.c_int32()
            hu = ctypes.c_int32()
            mm = ctypes.c_int32()
            lib.crt_obj_shape_counts(
                handle, si, ctypes.byref(nv), ctypes.byref(nt), ctypes.byref(hn),
                ctypes.byref(hu), ctypes.byref(mm),
            )
            verts = np.empty((nv.value, 3), np.float32)
            norms = np.empty((nv.value, 3), np.float32) if hn.value else None
            uvs = np.empty((nv.value, 2), np.float32) if hu.value else None
            tris = np.empty((nt.value, 3), np.uint32)
            lib.crt_obj_shape_data(
                handle,
                si,
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                norms.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if norms is not None
                else None,
                uvs.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if uvs is not None
                else None,
                tris.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            mat = lib.crt_obj_shape_material(handle, si).decode()
            shapes.append(
                NativeObjShape(verts, norms, uvs, tris, mat, bool(mm.value))
            )
        mtllibs = [
            lib.crt_obj_mtllib(handle, i).decode()
            for i in range(lib.crt_obj_num_mtllibs(handle))
        ]
        return shapes, mtllibs
    finally:
        lib.crt_obj_free(handle)
