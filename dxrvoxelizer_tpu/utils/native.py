"""ctypes binding + build-on-demand for the native OBJ parser.

The shared library is compiled once per checkout with g++ (no pip deps);
callers fall back to the pure-Python parser when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent / "_native" / "objparse.cpp"
_LIB = Path(__file__).resolve().parent / "_native" / "libobjparse.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """The loaded native library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.objparse_load.restype = ctypes.c_void_p
        lib.objparse_load.argtypes = [ctypes.c_char_p]
        for name in ("num_vertices", "num_normals", "num_corners"):
            fn = getattr(lib, f"objparse_{name}")
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        lib.objparse_copy_positions.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.objparse_copy_normals.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.objparse_copy_corners.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.objparse_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def parse_obj_native(path: str | Path):
    """Parse via the native library.

    Returns (positions [V,3] f32, normals [VN,3] f32, corner_v [I] i64,
    corner_vn [I] i64 with -1 for "no normal") or None if unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    h = lib.objparse_load(str(path).encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        nv = lib.objparse_num_vertices(h)
        nn = lib.objparse_num_normals(h)
        nc = lib.objparse_num_corners(h)
        pos = np.empty((nv, 3), dtype=np.float32)
        nrm = np.empty((nn, 3), dtype=np.float32)
        cv = np.empty(nc, dtype=np.int64)
        cn = np.empty(nc, dtype=np.int64)
        if nv:
            lib.objparse_copy_positions(h, pos.ctypes.data_as(ctypes.c_void_p))
        if nn:
            lib.objparse_copy_normals(h, nrm.ctypes.data_as(ctypes.c_void_p))
        if nc:
            lib.objparse_copy_corners(
                h,
                cv.ctypes.data_as(ctypes.c_void_p),
                cn.ctypes.data_as(ctypes.c_void_p),
            )
        return pos, nrm, cv, cn
    finally:
        lib.objparse_free(h)
