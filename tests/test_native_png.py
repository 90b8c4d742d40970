"""Native C++ PNG encoder vs the pure-Python reader (round trip)."""

import numpy as np
import pytest

from dxrvoxelizer_tpu.utils.image import read_png, write_png
from dxrvoxelizer_tpu.utils.native import get_png_lib, write_png_native


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_native_roundtrip(tmp_path, ch):
    lib = get_png_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(37, 53, ch), dtype=np.uint8)
    p = tmp_path / f"t{ch}.png"
    assert write_png_native(p, img)
    back = read_png(p)
    assert (back == img).all()


def test_write_png_prefers_native(tmp_path):
    """write_png output decodes identically whichever encoder ran."""
    img = (np.linspace(0, 1, 32 * 48 * 3, dtype=np.float32)
           .reshape(32, 48, 3))
    p = tmp_path / "grad.png"
    write_png(p, img)
    back = read_png(p)
    expect = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    assert (back == expect).all()
