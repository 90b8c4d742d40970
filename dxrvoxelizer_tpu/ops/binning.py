"""Triangle -> column-tile binning (the acceleration-structure build).

TPU-native replacement for the DXR BLAS/TLAS build (reference:
Content/Voxelizer.cpp:264-326): instead of a BVH we bin triangles to the
32x32-column tiles their 2D projection may cover, with an XLA sort — no
atomics, no variable-length buckets on device:

1. per triangle, the conservative column range comes from the projected bbox
   (ops/geom.py); tiles are the range's 32x32 blocks;
2. triangles spanning <= ``max_span`` tiles per axis emit up to
   ``max_span^2`` (tile, tri) candidate pairs; a stable sort by tile id turns
   them into per-tile runs (the CSR analog);
3. rare huge triangles (span > max_span) go to a global overflow list that is
   appended to every tile — correctness never depends on the span cap;
4. per-tile runs are padded to a shared power-of-two capacity and the packed
   coefficients gathered into a dense [n_tiles, K, NCOEF] block for the
   parity kernel (ops/voxelize_pallas.py).

Rebuilt every frame (deforming-mesh config, BASELINE.json) — the whole build
is sorts/gathers that XLA runs on-device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from dxrvoxelizer_tpu.ops.geom import parity_tri_setup
from dxrvoxelizer_tpu.ops.voxelize_pallas import (
    NCOEF,
    TILE,
    pack_coeffs,
    voxelize_parity_tiles,
)


@dataclass
class BinStats:
    n_tiles: int
    capacity: int  # per-tile padded triangle capacity (incl. overflow)
    max_bin: int  # largest per-tile bin before padding
    overflow: int  # triangles routed to every tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("n", "max_span"))
def _bin_phase_a(verts_norm, tris, n: int, max_span: int):
    """Jitted phase A: setup, candidate pairs, sort, per-tile runs."""
    pt = parity_tri_setup(verts_norm, tris, n)
    coef = pack_coeffs(pt)  # [T, NCOEF]
    t_count = coef.shape[0]
    nt = n // TILE
    n_tiles = nt * nt

    # covered column range from the projected bbox
    x0 = jnp.ceil(pt.xmin)
    x1 = jnp.floor(pt.xmax)
    y0 = jnp.ceil(pt.ymin)
    y1 = jnp.floor(pt.ymax)
    nonempty = (
        (pt.valid > 0) & (x1 >= x0) & (y1 >= y0)
        & (x1 >= 0) & (x0 <= n - 1) & (y1 >= 0) & (y0 <= n - 1)
    )
    tx0 = (jnp.clip(x0, 0, n - 1).astype(jnp.int32)) // TILE
    tx1 = (jnp.clip(x1, 0, n - 1).astype(jnp.int32)) // TILE
    ty0 = (jnp.clip(y0, 0, n - 1).astype(jnp.int32)) // TILE
    ty1 = (jnp.clip(y1, 0, n - 1).astype(jnp.int32)) // TILE
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    small = nonempty & (span_x <= max_span) & (span_y <= max_span)
    overflow_mask = nonempty & ~small

    # candidate (tile, tri) pairs for the max_span^2 offsets
    cands = []
    for dx in range(max_span):
        for dy in range(max_span):
            tid = (tx0 + dx) * nt + (ty0 + dy)
            ok = small & (dx < span_x) & (dy < span_y)
            cands.append(jnp.where(ok, tid, n_tiles))  # sentinel = n_tiles
    keys = jnp.stack(cands, axis=0).reshape(-1)  # [S*T]
    tri_ids = jnp.broadcast_to(
        jnp.arange(t_count, dtype=jnp.int32)[None, :], (max_span * max_span, t_count)
    ).reshape(-1)

    # payload-carrying sort: post-sort gathers cost ~5x the sort on TPU
    sorted_keys, sorted_tris = jax.lax.sort(
        (keys, tri_ids), dimension=0, is_stable=True, num_keys=1
    )

    starts = jnp.searchsorted(sorted_keys, jnp.arange(n_tiles + 1, dtype=jnp.int32))
    counts = starts[1:] - starts[:-1]  # [n_tiles]
    ov_ids = jnp.nonzero(overflow_mask, size=t_count, fill_value=-1)[0]
    return (
        coef, sorted_tris, starts, counts, ov_ids,
        counts.max(), overflow_mask.sum(),
    )


@partial(jax.jit, static_argnames=("cap",))
def _bin_phase_b(coef, sorted_tris, starts, counts, ov_ids, n_overflow, cap: int):
    """Jitted phase B: padded per-tile index matrix + coefficient gather."""
    t_count = coef.shape[0]
    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    in_run = j < counts[:, None]
    run_idx = jnp.clip(starts[:-1][:, None] + j, 0, sorted_tris.shape[0] - 1)
    idx = jnp.where(in_run, sorted_tris[run_idx], -1)
    # overflow triangles appended to every tile (n_overflow may be traced 0)
    ov_slot = j - counts[:, None]
    in_ov = (ov_slot >= 0) & (ov_slot < n_overflow)
    ov_idx = jnp.clip(ov_slot, 0, t_count - 1)
    idx = jnp.where(in_ov, ov_ids[ov_idx].astype(jnp.int32), idx)

    # gather coefficients; index -1 -> zero row (valid=0 kills the triangle)
    coef_padded = jnp.concatenate(
        [coef, jnp.zeros((1, NCOEF), dtype=coef.dtype)], axis=0
    )
    return coef_padded[jnp.where(idx < 0, t_count, idx)]


def bin_triangles(
    verts_norm: jnp.ndarray,
    tris: jnp.ndarray,
    n: int,
    max_span: int = 3,
) -> tuple[jnp.ndarray, BinStats]:
    """Build the dense binned coefficient block -> ([n_tiles, K, NCOEF], stats).

    Two jitted phases with a single host sync between them (the padded
    capacity is data-dependent). Capacity is bucketed to powers of two so the
    downstream kernel shape — and its compiled executable — is stable across
    frames of a deforming mesh.
    """
    nt = n // TILE
    n_tiles = nt * nt
    coef, sorted_tris, starts, counts, ov_ids, max_bin_d, n_ov_d = _bin_phase_a(
        verts_norm, tris, n, max_span
    )
    max_bin = int(max_bin_d)  # host sync (two scalars)
    n_overflow = int(n_ov_d)

    cap_small = max(_round_up(max_bin, 8), 8)
    cap = cap_small + _round_up(max(n_overflow, 0), 8)
    cap_b = 8
    while cap_b < cap:
        cap_b *= 2
    cap = cap_b

    coef_tiles = _bin_phase_b(
        coef, sorted_tris, starts, counts, ov_ids, jnp.int32(n_overflow), cap
    )
    stats = BinStats(
        n_tiles=n_tiles, capacity=cap, max_bin=max_bin, overflow=n_overflow
    )
    return coef_tiles, stats


class StaticBinnedVoxelizer:
    """Build-once / dispatch-per-frame wrapper of the gen-1 binned kernel.

    The 64^3 analog of voxelize_queue.StaticVoxelizer: ``bin_triangles``
    (and its one host sync) runs once at construction; per frame only the
    parity kernel dispatches — the reference's build-AS-once + per-frame
    DispatchRays split (Content/Voxelizer.cpp:264-326 vs :351-369).
    """

    def __init__(self, verts_norm, tris, n: int, max_span: int = 3,
                 k_chunk: int = 512, interpret: bool = False):
        self.n = n
        self.interpret = interpret
        self.coef_tiles, self.stats = bin_triangles(
            verts_norm, tris, n, max_span=max_span
        )
        self.k_chunk = min(k_chunk, self.stats.capacity)

    def __call__(self, perturb=None) -> jnp.ndarray:
        """-> packed occupancy words [N, N, N//32] (async device dispatch).

        ``perturb``: optional f32 scalar folded in as an exact no-op
        (coef + perturb*1e-38) so benchmark scan bodies carry-depend."""
        coef = self.coef_tiles
        if perturb is not None:
            coef = coef + perturb * 1e-38
        return voxelize_parity_tiles(
            coef, self.n, k_chunk=self.k_chunk, interpret=self.interpret
        )


def voxelize_parity_binned(
    verts_norm: jnp.ndarray,
    tris: jnp.ndarray,
    n: int,
    max_span: int = 3,
    k_chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Binned fast path -> packed occupancy words [N, N, N//32]."""
    if tris.shape[0] == 0:
        return jnp.zeros((n, n, n // 32), dtype=jnp.int32)
    coef_tiles, stats = bin_triangles(verts_norm, tris, n, max_span=max_span)
    kc = min(k_chunk, stats.capacity)
    return voxelize_parity_tiles(coef_tiles, n, k_chunk=kc, interpret=interpret)
