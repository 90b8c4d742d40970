"""Mip pyramid for the voxel grid (the GenerateMips / SHOW_MIP analog).

The reference samples its grid with ``SampleLevel(g_smpLinear, tex,
SHOW_MIP)`` (PSRayCast.hlsl:42-46) — level 0 in the shipped build, but the
``SHOW_MIP`` switch (SharedConst.h:5) selects a coarser mip, and the XUSG
interface carries the (unused) ``GenerateMips`` hook (XUSG.h:1644-1649).
Here mips are 2x2x2 box averages of the density channel; sampling "at level
L" is simply rendering from the level-L grid, since every ray-marcher in
this package is resolution-independent (texture coordinates in [0, 1]).

When the grid emulates the reference's R10G10B10A2_UNORM storage (the
non-USE_MUTEX mode), each level's alpha re-quantizes to 2 bits — a real
artifact of the reference format that ``quantize_alpha`` reproduces. The
float-grid mode (USE_MUTEX, PSRayCast.hlsl:42-46 ``.x`` read) averages
smoothly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def downsample2(density: jnp.ndarray) -> jnp.ndarray:
    """One mip step: 2x2x2 box average [N,N,N] -> [N/2,N/2,N/2]."""
    n = density.shape[0]
    assert n % 2 == 0, f"grid size {n} not divisible by 2"
    x = density.reshape(n // 2, 2, n // 2, 2, n // 2, 2)
    return x.mean(axis=(1, 3, 5))


def quantize_a2(density: jnp.ndarray) -> jnp.ndarray:
    """2-bit UNORM round trip of the alpha channel: {0, 1/3, 2/3, 1}."""
    return jnp.round(jnp.clip(density, 0.0, 1.0) * 3.0) / 3.0


@partial(jax.jit, static_argnames=("levels", "quantize_alpha"))
def generate_mips(
    density: jnp.ndarray,
    levels: int | None = None,
    quantize_alpha: bool = False,
) -> tuple:
    """Full mip chain [N, N/2, ..., 1] of the density grid.

    Returns a tuple (level 0 = the input, possibly re-quantized). ``levels``
    limits the chain length (None = down to 1^3).
    """
    n = density.shape[0]
    max_levels = n.bit_length()  # N=64 -> 7 levels (64..1)
    levels = max_levels if levels is None else min(levels, max_levels)
    out = [quantize_a2(density) if quantize_alpha else density]
    for _ in range(levels - 1):
        d = downsample2(out[-1])
        out.append(quantize_a2(d) if quantize_alpha else d)
    return tuple(out)


def mip_level(
    density: jnp.ndarray, level: int, quantize_alpha: bool = False
) -> jnp.ndarray:
    """The level-``level`` grid only (level 0 = full resolution)."""
    if level <= 0:
        return density
    return generate_mips(density, levels=level + 1,
                         quantize_alpha=quantize_alpha)[level]
