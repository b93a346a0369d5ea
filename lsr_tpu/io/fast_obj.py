"""ctypes bindings for the native OBJ loader (native/fast_obj.cpp).

The native runtime piece of the asset pipeline (the reference uses Assimp,
also native).  Falls back to the pure-Python parser when the shared library
hasn't been built (`make -C native`).  Semantics are identical (corner
dedup, fan triangulation, area-weighted normals when absent) and pinned by
tests against the Python parser.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from lsr_tpu.io.obj import MeshData, load_obj as _py_load_obj

_LIB = None
_LIB_TRIED = False


def _lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    from lsr_tpu.utils.native_build import ensure_native_built

    path = ensure_native_built("libfastobj.so")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fastobj_parse_file.restype = ctypes.c_void_p
    lib.fastobj_parse_file.argtypes = [ctypes.c_char_p]
    lib.fastobj_parse_text.restype = ctypes.c_void_p
    lib.fastobj_parse_text.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.fastobj_num_vertices.restype = ctypes.c_long
    lib.fastobj_num_vertices.argtypes = [ctypes.c_void_p]
    lib.fastobj_num_triangles.restype = ctypes.c_long
    lib.fastobj_num_triangles.argtypes = [ctypes.c_void_p]
    lib.fastobj_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.fastobj_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def load_obj_fast(path_or_text: str, from_text: bool = False) -> MeshData:
    """Parse an OBJ with the native loader; Python fallback when unbuilt."""
    lib = _lib()
    if lib is None:
        return _py_load_obj(path_or_text, from_text=from_text)

    if from_text:
        data = path_or_text.encode()
        handle = lib.fastobj_parse_text(data, len(data))
    else:
        handle = lib.fastobj_parse_file(path_or_text.encode())
    if not handle:
        raise IOError(f"fast_obj failed to parse {path_or_text[:80]!r}")
    try:
        nv = lib.fastobj_num_vertices(handle)
        nt = lib.fastobj_num_triangles(handle)
        positions = np.empty((nv, 3), np.float32)
        normals = np.empty((nv, 3), np.float32)
        uvs = np.empty((nv, 2), np.float32)
        indices = np.empty((nt, 3), np.int32)
        lib.fastobj_copy(
            handle,
            positions.ctypes.data_as(ctypes.c_void_p),
            normals.ctypes.data_as(ctypes.c_void_p),
            uvs.ctypes.data_as(ctypes.c_void_p),
            indices.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.fastobj_free(handle)
    return MeshData(positions, normals, uvs, indices)
