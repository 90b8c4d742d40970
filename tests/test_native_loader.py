"""Native C++ OBJ parser vs the pure-Python parser — must agree exactly."""

import numpy as np
import pytest

from dxrvoxelizer_tpu.utils.assets import find_asset
from dxrvoxelizer_tpu.utils.native import get_lib
from dxrvoxelizer_tpu.utils.objloader import load_obj

needs_native = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")


def _assert_same(a, b):
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.positions, b.positions)
    np.testing.assert_allclose(a.normals, b.normals, atol=1e-6)
    np.testing.assert_allclose(a.aabb_min, b.aabb_min)
    np.testing.assert_allclose(a.aabb_max, b.aabb_max)


@needs_native
def test_native_matches_python_synthetic(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        """
# comment line
v 0 0 0
v 1 0 0
v 1 1 0.5
v 0 1 -0.25
vn 0 0 1
vn 0 1 0
f 1//1 2//1 3//1 4//2
f -4//-2 -3//-2 -2//-1
""
"""
    )
    _assert_same(load_obj(p, impl="native"), load_obj(p, impl="python"))


@needs_native
@pytest.mark.parametrize("name", ["bunny.obj", "dragon.obj", "TuringBowl.obj"])
def test_native_matches_python_assets(reference_assets_available, name):
    path = find_asset(name)
    _assert_same(load_obj(path, impl="native"), load_obj(path, impl="python"))


@needs_native
def test_native_is_faster_than_python(reference_assets_available):
    import time

    path = find_asset("dragon.obj")
    t0 = time.perf_counter()
    load_obj(path, impl="native")
    native_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    load_obj(path, impl="python")
    python_s = time.perf_counter() - t0
    # informational bound: native should never be slower
    assert native_s <= python_s * 1.5, (native_s, python_s)
