"""Native (C++) host-runtime kernels, loaded via ctypes.

Builds lazily with g++ on first use (no pybind11 in this environment);
falls back to the NumPy implementations in geometry/postprocess.py when no
compiler is available. See mesh_ops.cpp for why this layer exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mesh_ops.cpp")
_LIB_PATH = os.path.join(_DIR, "libmesh_ops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.connected_components.restype = ctypes.c_int32
    lib.connected_components.argtypes = [ctypes.c_int32, ctypes.c_int32, i32p, i32p]
    lib.compact_mesh.restype = ctypes.c_int32
    lib.compact_mesh.argtypes = [ctypes.c_int32, ctypes.c_int32, i32p, u8p, i32p, i32p]
    lib.decimate_grid.restype = ctypes.c_int32
    lib.decimate_grid.argtypes = [ctypes.c_int32, ctypes.c_int32, f32p, i32p,
                                  ctypes.c_float, ctypes.c_float, ctypes.c_float,
                                  ctypes.c_float, f32p, i32p, i32p]
    lib.decimate_quadric.restype = ctypes.c_int32
    lib.decimate_quadric.argtypes = [ctypes.c_int32, ctypes.c_int64, f32p,
                                     i32p, ctypes.c_int64, f32p, i32p, i32p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.marching_tets_cells.restype = ctypes.c_int32
    lib.marching_tets_cells.argtypes = [
        ctypes.c_int32, f32p, ctypes.c_int64, i32p, i32p, i32p, i32p,
        ctypes.c_int32, i32p, i32p, i32p, f64p, f64p, f32p, i32p, i64p,
        ctypes.c_int64, ctypes.c_int64]
    _lib = lib
    return _lib


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def connected_components(n_verts: int, faces: np.ndarray) -> Optional[Tuple[np.ndarray, int]]:
    """-> (labels [n_verts], largest-component label) or None (no native lib)."""
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    labels = np.empty(n_verts, np.int32)
    best = lib.connected_components(n_verts, len(faces), _i32(faces), _i32(labels))
    return labels, int(best)


def compact_mesh(verts: np.ndarray, faces: np.ndarray,
                 keep: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    keep8 = np.ascontiguousarray(keep, np.uint8)
    out_faces = np.empty_like(faces)
    remap = np.empty(len(verts), np.int32)
    nf = lib.compact_mesh(len(verts), len(faces), _i32(faces),
                          keep8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          _i32(out_faces), _i32(remap))
    return verts[keep.astype(bool)], out_faces[:nf].copy()


def marching_tets_cells(s3: np.ndarray, cells: np.ndarray, tets: np.ndarray,
                        tri_table: np.ndarray, edge_corners: np.ndarray,
                        corners: np.ndarray, dirs: np.ndarray,
                        bit2dir: np.ndarray, bbox_min: np.ndarray,
                        step: np.ndarray
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Per-cell marching-tets geometry emission (the numpy hot loop of
    ops/surface.marching_tets_host). Returns (verts, faces) or None when the
    native lib is unavailable; topology tables come from the caller so
    Python stays the single source of truth."""
    lib = get_lib()
    if lib is None:
        return None
    s3 = np.ascontiguousarray(s3, np.float32)
    cells = np.ascontiguousarray(cells, np.int32)
    max_f = max(int(len(cells)) * 12, 1)
    # a cell touches <= 19 distinct edges (12 cube + 6 face diag + 1 body)
    max_v = max(int(len(cells)) * 19, 1)
    out_verts = np.empty((max_v, 3), np.float32)
    out_faces = np.empty((max_f, 3), np.int32)
    counts = np.zeros(2, np.int64)
    rc = lib.marching_tets_cells(
        s3.shape[0], s3.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(cells), _i32(cells),
        _i32(np.ascontiguousarray(tets, np.int32)),
        _i32(np.ascontiguousarray(tri_table, np.int32)),
        _i32(np.ascontiguousarray(edge_corners, np.int32)),
        int(edge_corners.shape[1]),
        _i32(np.ascontiguousarray(corners, np.int32)),
        _i32(np.ascontiguousarray(dirs, np.int32)),
        _i32(np.ascontiguousarray(bit2dir, np.int32)),
        np.ascontiguousarray(bbox_min, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        np.ascontiguousarray(step, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        out_verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _i32(out_faces),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_v, max_f)
    if rc != 0:
        return None                    # capacity bug — numpy path recovers
    return (out_verts[: int(counts[0])].copy(),
            out_faces[: int(counts[1])].copy())


def decimate_quadric(verts: np.ndarray, faces: np.ndarray,
                     target_faces: int
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Quadric edge-collapse decimation to <= target_faces (the quality path
    of geometry/postprocess.reduce_faces). Returns (verts, faces) or None
    when the native lib is unavailable or the input is malformed."""
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out_verts = np.empty_like(verts)
    out_faces = np.empty_like(faces)
    n_out = np.zeros(1, np.int32)
    nf = lib.decimate_quadric(
        len(verts), len(faces),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _i32(faces),
        int(target_faces),
        out_verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _i32(out_faces), _i32(n_out))
    if nf < 0:
        return None
    return out_verts[: int(n_out[0])].copy(), out_faces[:nf].copy()


def decimate_grid(verts: np.ndarray, faces: np.ndarray,
                  cell: float) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    lo = verts.min(axis=0) if len(verts) else np.zeros(3, np.float32)
    out_verts = np.empty_like(verts)
    out_faces = np.empty_like(faces)
    n_out = np.zeros(1, np.int32)
    nf = lib.decimate_grid(
        len(verts), len(faces),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _i32(faces),
        ctypes.c_float(cell), ctypes.c_float(float(lo[0])),
        ctypes.c_float(float(lo[1])), ctypes.c_float(float(lo[2])),
        out_verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _i32(out_faces), _i32(n_out))
    return out_verts[: int(n_out[0])].copy(), out_faces[:nf].copy()
