"""ctypes bindings + build-on-demand for the native (C++) runtime pieces.

Native tier of the framework (the reference ships its runtime as C++ DLLs,
SURVEY.md section 2b): currently the OBJ parser (XUSGObjLoader analog) and
the PNG encoder (stb_image_write analog). Each shared library is compiled
once per checkout with g++ (no pip deps); callers fall back to the
pure-Python implementations when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "_native"
_SRC = _NATIVE_DIR / "objparse.cpp"
_LIB = _NATIVE_DIR / "libobjparse.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _compile(src: Path, lib: Path, extra: tuple[str, ...] = ()) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(lib), *extra],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _build() -> bool:
    return _compile(_SRC, _LIB)


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


# ---- PNG encoder (stb_image_write analog) -----------------------------------

_PNG_SRC = _NATIVE_DIR / "pngwrite.cpp"
_PNG_LIB = _NATIVE_DIR / "libpngwrite.so"
_png_lock = threading.Lock()
_png_lib = None
_png_tried = False


def get_png_lib():
    """The loaded native PNG encoder; None if toolchain/zlib unavailable."""
    global _png_lib, _png_tried
    with _png_lock:
        if _png_lib is not None or _png_tried:
            return _png_lib
        _png_tried = True
        if (
            not _PNG_LIB.exists()
            or _PNG_LIB.stat().st_mtime < _PNG_SRC.stat().st_mtime
        ):
            if not _compile(_PNG_SRC, _PNG_LIB, extra=("-lz",)):
                return None
        try:
            lib = ctypes.CDLL(str(_PNG_LIB))
        except OSError:
            return None
        lib.pngwrite_file.restype = ctypes.c_int
        lib.pngwrite_file.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.pngwrite_encode.restype = ctypes.c_longlong
        lib.pngwrite_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.pngwrite_free.argtypes = [ctypes.c_void_p]
        _png_lib = lib
        return _png_lib


def write_png_native(path, img: np.ndarray) -> bool:
    """Encode + write via the native library. img: uint8 [H,W,C] contiguous.

    Returns False (caller falls back) when the library is unavailable.
    """
    lib = get_png_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(img)
    h, w, ch = img.shape
    rc = lib.pngwrite_file(
        str(path).encode(), img.ctypes.data_as(ctypes.c_void_p), w, h, ch
    )
    if rc != 0:
        raise OSError(f"native png write failed: rc={rc} path={path}")
    return True
