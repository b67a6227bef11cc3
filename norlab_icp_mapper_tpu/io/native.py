"""ctypes bridge to the native C++ VTK reader/writer (native/vtk_fast.cpp).

The shared library builds on demand with g++ (cached next to the source);
if the toolchain or the build is unavailable every entry point returns None
and callers fall back to the pure-numpy parser in ``vtk.py``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "vtk_fast.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libvtk_fast.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("NIM_TPU_DISABLE_NATIVE"):
            return None
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                     "-o", _LIB],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB)
        except Exception:
            return None
        lib.vtk_open.restype = ctypes.c_void_p
        lib.vtk_open.argtypes = [ctypes.c_char_p]
        lib.vtk_error.restype = ctypes.c_char_p
        lib.vtk_error.argtypes = [ctypes.c_void_p]
        lib.vtk_num_points.argtypes = [ctypes.c_void_p]
        lib.vtk_num_fields.argtypes = [ctypes.c_void_p]
        lib.vtk_field_name.restype = ctypes.c_char_p
        lib.vtk_field_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.vtk_field_dim.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.vtk_get_positions.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vtk_get_field.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_void_p]
        lib.vtk_close.argtypes = [ctypes.c_void_p]
        lib.vtk_write.restype = ctypes.c_int
        lib.vtk_write.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p)]
        _lib = lib
        return _lib


def read_vtk_native(path: str) -> Optional[
        Tuple[np.ndarray, Dict[str, np.ndarray]]]:
    lib = _load()
    if lib is None:
        return None
    h = lib.vtk_open(path.encode())
    try:
        err = lib.vtk_error(h)
        if err:
            return None  # fall back (and let the numpy parser report)
        n = lib.vtk_num_points(h)
        pos = np.empty((n, 3), np.float32)
        lib.vtk_get_positions(h, pos.ctypes.data_as(ctypes.c_void_p))
        desc: Dict[str, np.ndarray] = {}
        for i in range(lib.vtk_num_fields(h)):
            name = lib.vtk_field_name(h, i).decode()
            dim = lib.vtk_field_dim(h, i)
            arr = np.empty((n, dim), np.float32)
            lib.vtk_get_field(h, i, arr.ctypes.data_as(ctypes.c_void_p))
            desc[name] = arr
        return pos, desc
    finally:
        lib.vtk_close(h)


def write_vtk_native(path: str, positions: np.ndarray,
                     descriptors: Optional[Dict[str, np.ndarray]] = None
                     ) -> bool:
    lib = _load()
    if lib is None:
        return False
    pos = np.ascontiguousarray(positions, np.float32)
    n = pos.shape[0]
    if pos.shape[1] == 2:
        pos = np.concatenate([pos, np.zeros((n, 1), np.float32)], axis=1)
        pos = np.ascontiguousarray(pos)
    desc = descriptors or {}
    names = []
    arrays = []
    for name, v in desc.items():
        v = np.ascontiguousarray(np.asarray(v, np.float32))
        if v.ndim == 1:
            v = v[:, None]
        names.append(name)
        arrays.append(v)
    nf = len(names)
    c_names = (ctypes.c_char_p * nf)(*[s.encode() for s in names])
    c_dims = (ctypes.c_int * nf)(*[a.shape[1] for a in arrays])
    c_ptrs = (ctypes.c_void_p * nf)(
        *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays])
    rc = lib.vtk_write(path.encode(), n,
                       pos.ctypes.data_as(ctypes.c_void_p), nf,
                       c_names, c_dims, c_ptrs)
    return rc == 0
