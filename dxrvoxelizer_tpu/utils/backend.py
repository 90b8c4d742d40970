"""Backend selection with a fallback ladder.

The reference tries discrete GPU -> UMA -> WARP software rasterizer at device
creation (DXRVoxelizer.cpp:89-128, 590-636). TPU analog: prefer the TPU
backend, fall back to CPU with a warning — same spirit: the app always comes
up, possibly slower.
"""

from __future__ import annotations

import sys


def select_backend(prefer: str = "default") -> str:
    """Pick and activate a backend; returns the platform name in use."""
    import jax

    if prefer == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    try:
        devs = jax.devices()
        if devs:
            return devs[0].platform
    except RuntimeError as e:  # no accelerator: the WARP-style fallback
        print(
            f"dxrvoxelizer_tpu: accelerator unavailable ({e}); "
            "falling back to CPU",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    return "cpu"
