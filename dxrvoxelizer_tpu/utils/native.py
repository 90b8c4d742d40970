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


# ---- accel strip packer (AS-builder hot loop) --------------------------------

_PACK_SRC = _NATIVE_DIR / "accelpack.cpp"
_PACK_LIB = _NATIVE_DIR / "libaccelpack.so"
_pack_lock = threading.Lock()
_pack_lib = None
_pack_tried = False


def get_pack_lib():
    """The loaded native strip packer; None if toolchain unavailable."""
    global _pack_lib, _pack_tried
    with _pack_lock:
        if _pack_lib is not None or _pack_tried:
            return _pack_lib
        _pack_tried = True
        if not _PACK_SRC.exists():
            return None
        if (
            not _PACK_LIB.exists()
            or _PACK_LIB.stat().st_mtime < _PACK_SRC.stat().st_mtime
        ):
            if not _compile(_PACK_SRC, _PACK_LIB):
                return None
        try:
            lib = ctypes.CDLL(str(_PACK_LIB))
        except OSError:
            return None
        lib.accelpack_run.restype = ctypes.c_void_p
        lib.accelpack_run.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,  # cell CSR
            ctypes.c_void_p, ctypes.c_longlong,  # ray_table, r_cap
            ctypes.c_void_p,  # rc
            ctypes.c_void_p,  # s0
            ctypes.c_void_p,  # tri_bounds or NULL
        ]
        for name, restype in (
            ("n_packs", ctypes.c_longlong),
            ("ray_total", ctypes.c_longlong),
            ("id_total", ctypes.c_longlong),
        ):
            fn = getattr(lib, f"accelpack_{name}")
            fn.restype = restype
            fn.argtypes = [ctypes.c_void_p]
        lib.accelpack_copy.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.accelpack_free.argtypes = [ctypes.c_void_p]
        lib.accelpack_max_ids.restype = ctypes.c_longlong
        lib.accelpack_max_ids.argtypes = [ctypes.c_void_p]
        lib.accelpack_classes_begin.restype = ctypes.c_longlong
        lib.accelpack_classes_begin.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_void_p,
        ]
        lib.accelpack_class_info.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.accelpack_class_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.accelpack_dir_cells.argtypes = [
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.accelpack_raytab_start.restype = ctypes.c_void_p
        lib.accelpack_raytab_start.argtypes = [
            ctypes.c_longlong, ctypes.c_longlong,
        ]
        lib.accelpack_raytab_rcap.restype = ctypes.c_longlong
        lib.accelpack_raytab_rcap.argtypes = [ctypes.c_void_p]
        lib.accelpack_raytab_counts.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.accelpack_raytab_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.accelpack_raytab_free.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "accelpack_tileunion_run"):
            lib.accelpack_tileunion_run.restype = ctypes.c_void_p
            lib.accelpack_tileunion_run.argtypes = [
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_longlong,
            ]
            lib.accelpack_tileunion_total.restype = ctypes.c_longlong
            lib.accelpack_tileunion_total.argtypes = [ctypes.c_void_p]
            lib.accelpack_tileunion_copy.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.accelpack_tileunion_free.argtypes = [ctypes.c_void_p]
        _pack_lib = lib
        return _pack_lib


def accel_pack_native(cell_offs, cell_data, ray_table, rc, s0_p, tri_bounds):
    """Greedy strip packing in C++ (ops/raystab_fast._make_packs_py is the
    behavioral reference — outputs are bit-identical).

    Returns (ray_data i32, ray_offs i64, id_data i64, id_offs i64) or None
    when the native library is unavailable.
    """
    lib = get_pack_lib()
    if lib is None:
        return None
    cell_offs = np.ascontiguousarray(cell_offs, np.int64)
    cell_data = np.ascontiguousarray(cell_data, np.int64)
    ray_table = np.ascontiguousarray(ray_table, np.int32)
    rc = np.ascontiguousarray(rc, np.int64)
    s0_p = np.ascontiguousarray(s0_p, np.float32)
    if tri_bounds is not None:
        tri_bounds = np.ascontiguousarray(tri_bounds, np.float64)
    n_cells = cell_offs.shape[0] - 1
    assert ray_table.shape[0] == n_cells and rc.shape[0] == n_cells
    h = lib.accelpack_run(
        cell_offs.ctypes.data_as(ctypes.c_void_p),
        cell_data.ctypes.data_as(ctypes.c_void_p),
        n_cells,
        ray_table.ctypes.data_as(ctypes.c_void_p),
        ray_table.shape[1],
        rc.ctypes.data_as(ctypes.c_void_p),
        s0_p.ctypes.data_as(ctypes.c_void_p),
        tri_bounds.ctypes.data_as(ctypes.c_void_p)
        if tri_bounds is not None else None,
    )
    if not h:
        return None
    try:
        n_packs = lib.accelpack_n_packs(h)
        ray_data = np.empty((lib.accelpack_ray_total(h),), np.int32)
        id_data = np.empty((lib.accelpack_id_total(h),), np.int64)
        ray_offs = np.empty((n_packs + 1,), np.int64)
        id_offs = np.empty((n_packs + 1,), np.int64)
        lib.accelpack_copy(
            h,
            ray_data.ctypes.data_as(ctypes.c_void_p),
            ray_offs.ctypes.data_as(ctypes.c_void_p),
            id_data.ctypes.data_as(ctypes.c_void_p),
            id_offs.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.accelpack_free(h)
    return ray_data, ray_offs, id_data, id_offs


def accel_pack_tables_native(cell_offs, cell_data, ray_table, rc, s0_p,
                             tri_bounds, caps_fn, cps_fn):
    """Pack walk + class partitioning + padded-table fills in one native
    pass (ops/raystab_fast._pack_classes2's python body is the behavioral
    reference). ``caps_fn(max_k) -> ascending capacity list``;
    ``cps_fn(k) -> row-padding quantum`` for each capacity (the kernel's
    strips-per-grid-step, ops/raystab_pallas.cells_per_step_for). Returns
    a list of (rt128 [vc_pad,128] i32, tab [vc_pad,k] i32, vc) or None
    when the native library is unavailable."""
    lib = get_pack_lib()
    if lib is None or not hasattr(lib, "accelpack_classes_begin"):
        return None
    cell_offs = np.ascontiguousarray(cell_offs, np.int64)
    cell_data = np.ascontiguousarray(cell_data, np.int64)
    ray_table = np.ascontiguousarray(ray_table, np.int32)
    rc = np.ascontiguousarray(rc, np.int64)
    s0_p = np.ascontiguousarray(s0_p, np.float32)
    if tri_bounds is not None:
        tri_bounds = np.ascontiguousarray(tri_bounds, np.float64)
    n_cells = cell_offs.shape[0] - 1
    h = lib.accelpack_run(
        cell_offs.ctypes.data_as(ctypes.c_void_p),
        cell_data.ctypes.data_as(ctypes.c_void_p),
        n_cells,
        ray_table.ctypes.data_as(ctypes.c_void_p),
        ray_table.shape[1],
        rc.ctypes.data_as(ctypes.c_void_p),
        s0_p.ctypes.data_as(ctypes.c_void_p),
        tri_bounds.ctypes.data_as(ctypes.c_void_p)
        if tri_bounds is not None else None,
    )
    if not h:
        return None
    try:
        max_k = int(lib.accelpack_max_ids(h))
        caps = np.ascontiguousarray(caps_fn(max_k), np.int64)
        cps = np.ascontiguousarray(
            [cps_fn(int(k)) for k in caps], np.int64
        )
        nc = int(lib.accelpack_classes_begin(
            h, caps.ctypes.data_as(ctypes.c_void_p), caps.shape[0],
            cps.ctypes.data_as(ctypes.c_void_p),
        ))
        out = []
        info = np.empty((3,), np.int64)
        for i in range(nc):
            lib.accelpack_class_info(
                h, i, info.ctypes.data_as(ctypes.c_void_p)
            )
            k, vc, vc_pad = (int(x) for x in info)
            rt128 = np.empty((vc_pad, 128), np.int32)
            tab = np.empty((vc_pad, k), np.int32)
            lib.accelpack_class_fill(
                h, i,
                rt128.ctypes.data_as(ctypes.c_void_p),
                tab.ctypes.data_as(ctypes.c_void_p),
            )
            out.append((rt128, tab, vc))
    finally:
        lib.accelpack_free(h)
    return out


def raytab_native(n: int, g: int):
    """Full raytab build in C++: (ray_table [C, r_cap] i32 voxel ids / -1,
    rc [C] i64 per-cell counts) by two linear passes (cell compute +
    histogram, then a stable ascending counting-sort scatter) — replaces
    the numpy argsort pipeline (~10 s -> ~3 s at 256^3 on one core).
    Bit-identical to the numpy path (each cell's run ascends, like the
    stable argsort). None when the toolchain is missing."""
    lib = get_pack_lib()
    if lib is None or not hasattr(lib, "accelpack_raytab_start"):
        return None
    h = lib.accelpack_raytab_start(n, g)
    if not h:
        return None
    try:
        n_cells = 6 * g * g
        r_cap = int(lib.accelpack_raytab_rcap(h))
        rc = np.empty((n_cells,), np.int64)
        lib.accelpack_raytab_counts(h, rc.ctypes.data_as(ctypes.c_void_p))
        rt = np.empty((n_cells, r_cap), np.int32)
        lib.accelpack_raytab_fill(
            h, r_cap, rt.ctypes.data_as(ctypes.c_void_p)
        )
    finally:
        lib.accelpack_raytab_free(h)
    return rt, rc


def dir_cells_native(n: int, g: int):
    """Voxel-center -> cubemap cell ids [n^3] int64 for the whole grid,
    fused with center generation in C++ (bit-identical to the numpy path
    in ops/raystab_fast.ray_tables). None when the toolchain is missing.
    """
    lib = get_pack_lib()
    if lib is None:
        return None
    out = np.empty((n * n * n,), np.int64)
    lib.accelpack_dir_cells(n, g, out.ctypes.data_as(ctypes.c_void_p))
    return out


def tile_union_native(n: int, g: int, tile, cell_offs, cell_data,
                      maxr_f32, bounds_f32, ov_ids):
    """Gen-7 per-tile candidate unions in C++ (near-drop + (bound, id)
    order; behavioral reference: the numpy pipeline in
    ops/raystab_tiled.build_raystab_compact7, bit-identical — pinned by
    tests/test_raystab_tiled.py). Returns (tile_offs i64 [NT+1],
    tile_data i32) or None when the toolchain is missing."""
    lib = get_pack_lib()
    if lib is None or not hasattr(lib, "accelpack_tileunion_run"):
        return None
    tx, ty, tz = (int(x) for x in tile)
    cell_offs = np.ascontiguousarray(cell_offs, np.int64)
    cell_data = np.ascontiguousarray(cell_data, np.int32)
    maxr_f32 = np.ascontiguousarray(maxr_f32, np.float32)
    bounds_f32 = np.ascontiguousarray(bounds_f32, np.float32)
    if ov_ids is None:
        ov_ids = np.empty((0,), np.int32)
    ov_ids = np.ascontiguousarray(ov_ids, np.int32)
    h = lib.accelpack_tileunion_run(
        n, g, tx, ty, tz,
        cell_offs.ctypes.data_as(ctypes.c_void_p),
        cell_data.ctypes.data_as(ctypes.c_void_p),
        maxr_f32.ctypes.data_as(ctypes.c_void_p),
        bounds_f32.ctypes.data_as(ctypes.c_void_p),
        ov_ids.ctypes.data_as(ctypes.c_void_p),
        int(ov_ids.size),
    )
    if not h:
        return None
    try:
        nt = (n // tx) * (n // ty) * (n // tz)
        total = lib.accelpack_tileunion_total(h)
        tile_offs = np.empty((nt + 1,), np.int64)
        tile_data = np.empty((max(total, 1),), np.int32)
        s0min = np.empty((nt,), np.float32)
        s0max = np.empty((nt,), np.float32)
        lib.accelpack_tileunion_copy(
            h, tile_offs.ctypes.data_as(ctypes.c_void_p),
            tile_data.ctypes.data_as(ctypes.c_void_p),
            s0min.ctypes.data_as(ctypes.c_void_p),
            s0max.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.accelpack_tileunion_free(h)
    return tile_offs, tile_data[:total], s0min, s0max
