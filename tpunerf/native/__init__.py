"""ctypes bindings for the native (C++) host-side components.

Built on demand with the in-tree Makefile (g++ −O3 −fopenmp). Every native
entry point has a pure-numpy fallback, so the framework works without a
toolchain — the native path is the production one for heavy preprocessing
(SDF grids over real meshes are O(G³·F)).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libtpunerf_native.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.tpunerf_sdf_grid.restype = ctypes.c_int
        lib.tpunerf_sdf_grid.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tpunerf_marching_tets.restype = ctypes.c_int
        lib.tpunerf_marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tpunerf_free.restype = None
        lib.tpunerf_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib
    except OSError:
        _build_failed = True
        return None


def native_available() -> bool:
    return _load() is not None


def sdf_grid(vertices: np.ndarray, faces: np.ndarray, resolution: int,
             bound: float) -> Optional[np.ndarray]:
    """(G, G, G) signed distances (− inside), or None if the native library
    is unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    out = np.empty(resolution ** 3, np.float32)
    rc = lib.tpunerf_sdf_grid(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), f.shape[0],
        resolution, float(bound),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out.reshape(resolution, resolution, resolution)


def marching_tets(values: np.ndarray, iso: float, bound: float):
    """Iso-surface of a (G, G, G) field → (verts (V, 3), faces (F, 3)), or
    None if the native library is unavailable. Same tables/orientation as
    fields/marching.py, but OpenMP-parallel with exact edge-identity
    vertex welding."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(values, np.float32)
    G = v.shape[0]
    pv = ctypes.POINTER(ctypes.c_float)()
    pf = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    rc = lib.tpunerf_marching_tets(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), G,
        float(iso), float(bound),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pf),
        ctypes.byref(nf))
    if rc != 0:
        return None
    try:
        verts = np.ctypeslib.as_array(pv, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(pf, shape=(nf.value, 3)).copy() \
            if nf.value else np.zeros((0, 3), np.int32)
    finally:
        lib.tpunerf_free(pv)
        lib.tpunerf_free(pf)
    return verts.astype(np.float32), faces.astype(np.int32)
