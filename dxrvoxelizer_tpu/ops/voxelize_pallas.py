"""Production solid-voxelization kernel (Pallas TPU).

TPU-native replacement for the reference's DXR pipeline (BLAS/TLAS build +
``DispatchRays`` ray-stab, Content/Voxelizer.cpp:264-326,351-369): one
axis-aligned ray per voxel column, interior fill by intersection parity,
computed as an **XOR fold of prefix bitmasks**:

- the voxel grid is split into 32x32-column tiles; each kernel program owns
  one tile's 1024 columns as 8 lane-strips of 128;
- triangles stream through the VPU eight at a time on the sublane axis: for
  every (8 tris x 128 columns) block the shared setup (ops/geom.py) gives
  edge functions, a top-left boundary rule and an affine depth z(x, y); a
  covered column gets cutoff ``m = ceil(z)`` and the crossing flips voxels
  k < m — a prefix mask over the column's z-bits, packed 32/word;
- XOR of all masks = crossing parity per voxel. XOR is associative and
  commutative, so triangles stream in any order with no atomics — races are
  impossible by construction (the TPU answer to the reference's UAV writes).

Triangles arrive pre-binned per tile (ops/binning.py) or brute-force
(every tile sees every triangle), both through the same kernel.

Output: packed occupancy words [N, N, N//32] int32 (see ops/packing.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dxrvoxelizer_tpu.ops.geom import ParityTris, parity_tri_setup

TILE = 32  # columns per tile side; tile = 32x32 columns = 8 strips x 128 lanes
NCOEF = 16  # packed ParityTris coefficients per triangle
SUB = 8  # triangles per vectorized block (sublane axis)

# coefficient rows in the packed [T, NCOEF] matrix
_EX0, _EY0, _EO0, _TL0 = 0, 1, 2, 3
_EX1, _EY1, _EO1, _TL1 = 4, 5, 6, 7
_EX2, _EY2, _EO2, _TL2 = 8, 9, 10, 11
_ZX, _ZY, _ZO, _VALID = 12, 13, 14, 15


def pack_coeffs(pt: ParityTris) -> jnp.ndarray:
    """Stack the 16 per-triangle coefficients into a [T, NCOEF] f32 matrix."""
    return jnp.stack(
        [
            pt.ex0, pt.ey0, pt.eo0, pt.tl0,
            pt.ex1, pt.ey1, pt.eo1, pt.tl1,
            pt.ex2, pt.ey2, pt.eo2, pt.tl2,
            pt.zx, pt.zy, pt.zo, pt.valid,
        ],
        axis=1,
    ).astype(jnp.float32)


def _parity_kernel(coef_ref, out_ref, *, n: int, nty: int, k_chunk: int):
    """One (tile, tri-chunk) grid step.

    coef_ref: [1, k_chunk, NCOEF] f32 (this tile's chunk of triangles)
    out_ref:  [1, W, 8, 128] int32 accumulator (revisited across chunks)
    """
    tile_id = pl.program_id(0)
    chunk_id = pl.program_id(1)
    w_words = n // 32

    @pl.when(chunk_id == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    tx = tile_id // nty
    ty = tile_id - tx * nty

    # strip s covers flat local columns l = s*128 + lane;
    # column x_local = l // TILE, y_local = l % TILE
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def strip_coords(s):
        l = s * 128 + lane
        px = (tx * TILE + l // TILE).astype(jnp.float32)  # (1,128)
        py = (ty * TILE + l % TILE).astype(jnp.float32)
        return px, py

    coords = [strip_coords(s) for s in range(8)]

    def step(g, acc):
        c = coef_ref[0, pl.ds(g * SUB, SUB), :]  # (SUB, NCOEF)

        def col(row):
            return c[:, row : row + 1]  # (SUB, 1)

        ex0, ey0, eo0, tl0 = col(_EX0), col(_EY0), col(_EO0), col(_TL0)
        ex1, ey1, eo1, tl1 = col(_EX1), col(_EY1), col(_EO1), col(_TL1)
        ex2, ey2, eo2, tl2 = col(_EX2), col(_EY2), col(_EO2), col(_TL2)
        zx, zy, zo, valid = col(_ZX), col(_ZY), col(_ZO), col(_VALID)

        # per-strip coverage mask + cutoff (shared across words)
        cov_masks, cutoffs = [], []
        for s in range(8):
            px, py = coords[s]  # (1,128)
            e0 = ex0 * px + ey0 * py + eo0  # (SUB,128)
            e1 = ex1 * px + ey1 * py + eo1
            e2 = ex2 * px + ey2 * py + eo2
            in0 = (e0 > 0) | ((e0 == 0) & (tl0 > 0))
            in1 = (e1 > 0) | ((e1 == 0) & (tl1 > 0))
            in2 = (e2 > 0) | ((e2 == 0) & (tl2 > 0))
            covered = in0 & in1 & in2 & (valid > 0)
            cov_masks.append(jnp.where(covered, jnp.int32(-1), jnp.int32(0)))
            z = zx * px + zy * py + zo
            cutoffs.append(jnp.clip(jnp.ceil(z), 0.0, float(n)).astype(jnp.int32))

        new_acc = []
        for w in range(w_words):
            strips = []
            for s in range(8):
                cbits = jnp.clip(cutoffs[s] - 32 * w, 0, 32)
                word = jnp.where(
                    cbits >= 32,
                    jnp.int32(-1),
                    (jnp.int32(1) << cbits) - jnp.int32(1),
                )
                word = word & cov_masks[s]  # (SUB,128)
                # XOR-fold the SUB axis: 8 -> 4 -> 2 -> 1
                f4 = word[0:4] ^ word[4:8]
                f2 = f4[0:2] ^ f4[2:4]
                strips.append(f2[0:1] ^ f2[1:2])  # (1,128)
            new_acc.append(acc[w] ^ jnp.concatenate(strips, axis=0))  # (8,128)
        return tuple(new_acc)

    acc = jax.lax.fori_loop(
        0,
        k_chunk // SUB,
        step,
        tuple(jnp.zeros((8, 128), jnp.int32) for _ in range(w_words)),
    )
    for w in range(w_words):
        out_ref[0, w] ^= acc[w]


def _tilewords_to_grid(out: jnp.ndarray, n: int) -> jnp.ndarray:
    """[n_tiles, W, 8, 128] -> packed occupancy words [N, N, W]."""
    w_words = n // 32
    ntx = nty = n // TILE
    x = out.reshape(ntx, nty, w_words, TILE, TILE)  # (8,128) -> (x_local,y_local)
    x = x.transpose(0, 3, 1, 4, 2)  # [ntx, xl, nty, yl, W]
    return x.reshape(n, n, w_words)


@partial(jax.jit, static_argnames=("n", "k_chunk", "interpret"))
def voxelize_parity_tiles(
    coef_tiles: jnp.ndarray, n: int, k_chunk: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Run the parity kernel over pre-binned tiles.

    ``coef_tiles``: [n_tiles, K, NCOEF] with K a multiple of ``k_chunk``
    (pad with zero coefficients -> valid=0). Returns packed words [N, N, W].
    """
    n_tiles, k, ncoef = coef_tiles.shape
    assert ncoef == NCOEF, f"coef_tiles last dim must be {NCOEF}, got {ncoef}"
    assert k % k_chunk == 0 and k_chunk % SUB == 0, (
        f"triangle capacity {k} must be a multiple of k_chunk={k_chunk} "
        f"(itself a multiple of {SUB})"
    )
    nty = n // TILE
    assert n % TILE == 0, f"grid size must be a multiple of {TILE}, got {n}"
    assert n_tiles == (n // TILE) * nty
    w_words = n // 32

    out = pl.pallas_call(
        partial(_parity_kernel, n=n, nty=nty, k_chunk=k_chunk),
        grid=(n_tiles, k // k_chunk),
        in_specs=[
            pl.BlockSpec(
                (1, k_chunk, NCOEF),
                lambda t, c: (t, c, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, w_words, 8, 128), lambda t, c: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, w_words, 8, 128), jnp.int32),
        interpret=interpret,
    )(coef_tiles)
    return _tilewords_to_grid(out, n)


def voxelize_parity_bruteforce(
    verts_norm: jnp.ndarray,
    tris: jnp.ndarray,
    n: int,
    k_chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """All-tiles-see-all-triangles path (no binning). Fully jittable.

    Correct at any size; the binned path (ops/binning.py) is the fast path
    for large grids/meshes. Returns packed occupancy words [N, N, N//32].
    """
    assert n % TILE == 0, f"grid size must be a multiple of {TILE}, got {n}"
    if tris.shape[0] == 0:
        return jnp.zeros((n, n, n // 32), dtype=jnp.int32)
    pt = parity_tri_setup(verts_norm, tris, n)
    coef = pack_coeffs(pt)  # [T, NCOEF]
    t = coef.shape[0]
    pad = (-t) % k_chunk
    if pad:
        coef = jnp.pad(coef, ((0, pad), (0, 0)))
    n_tiles = (n // TILE) ** 2
    coef_tiles = jnp.broadcast_to(coef[None], (n_tiles, coef.shape[0], NCOEF))
    return voxelize_parity_tiles(coef_tiles, n, k_chunk=k_chunk, interpret=interpret)
