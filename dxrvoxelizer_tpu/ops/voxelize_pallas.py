"""Production solid-voxelization kernel (Pallas TPU).

TPU-native replacement for the reference's DXR pipeline (BLAS/TLAS build +
``DispatchRays`` ray-stab, Content/Voxelizer.cpp:264-326,351-369): one
axis-aligned ray per voxel column, interior fill by intersection parity,
computed as an **XOR fold of prefix bitmasks**:

- the voxel grid is split into 32x32-column tiles; each kernel program owns
  one tile's columns laid out as an (8, 128) vector register tile;
- for every triangle, the shared setup (ops/geom.py) gives edge functions,
  a top-left boundary rule and an affine depth z(x, y); a covered column gets
  cutoff ``m = ceil(z)`` and the crossing flips voxels k < m — a prefix mask
  over the column's z-bits, packed 32/word;
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

TILE = 32  # columns per tile side; tile = 32x32 columns = (8,128) lanes
NCOEF = 16  # packed ParityTris coefficients per triangle
SUB_TRIS = 64  # triangles processed per vectorized inner step


def pack_coeffs(pt: ParityTris) -> jnp.ndarray:
    """Stack the 16 per-triangle coefficients into a [NCOEF, T] f32 matrix.

    Order: ex0,ey0,eo0,tl0, ex1,ey1,eo1,tl1, ex2,ey2,eo2,tl2, zx,zy,zo,valid.
    (The bbox fields are for binning only; the kernel does not need them.)
    """
    return jnp.stack(
        [
            pt.ex0, pt.ey0, pt.eo0, pt.tl0,
            pt.ex1, pt.ey1, pt.eo1, pt.tl1,
            pt.ex2, pt.ey2, pt.eo2, pt.tl2,
            pt.zx, pt.zy, pt.zo, pt.valid,
        ],
        axis=0,
    ).astype(jnp.float32)


def _xor_fold(x: jnp.ndarray) -> jnp.ndarray:
    """XOR-reduce over the leading axis by halving (leading dim power of 2)."""
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = jax.lax.bitwise_xor(x[:half], x[half : 2 * half])
    return x[0]


def _parity_kernel(coef_ref, out_ref, *, n: int, nty: int, k_chunk: int):
    """One (tile, tri-chunk) grid step.

    coef_ref: [NCOEF, k_chunk] f32 (this tile's chunk of triangles)
    out_ref:  [W, 8, 128] int32 accumulator (revisited across chunks)
    """
    tile_id = pl.program_id(0)
    chunk_id = pl.program_id(1)
    w_words = n // 32

    @pl.when(chunk_id == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    tx = tile_id // nty
    ty = tile_id - tx * nty

    # lane layout: flat local column l in [0, 1024), sub = l // 128,
    # lane = l % 128; column x_local = l // TILE, y_local = l % TILE
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    l = sub * 128 + lane
    px = (tx * TILE + l // TILE).astype(jnp.float32)
    py = (ty * TILE + l % TILE).astype(jnp.float32)

    def step(s, acc):
        c = coef_ref[:, pl.ds(s * SUB_TRIS, SUB_TRIS)]  # [NCOEF, SUB]

        def bc(row):
            return c[row, :][:, None, None]  # [SUB,1,1]

        e0 = bc(0) * px + bc(1) * py + bc(2)
        e1 = bc(4) * px + bc(5) * py + bc(6)
        e2 = bc(8) * px + bc(9) * py + bc(10)
        in0 = (e0 > 0) | ((e0 == 0) & (bc(3) > 0))
        in1 = (e1 > 0) | ((e1 == 0) & (bc(7) > 0))
        in2 = (e2 > 0) | ((e2 == 0) & (bc(11) > 0))
        covered = in0 & in1 & in2 & (bc(15) > 0)

        z = bc(12) * px + bc(13) * py + bc(14)
        m = jnp.clip(jnp.ceil(z), 0.0, float(n)).astype(jnp.int32)  # [SUB,8,128]
        cov_mask = jnp.where(covered, jnp.int32(-1), jnp.int32(0))

        new = []
        for w in range(w_words):
            cbits = jnp.clip(m - 32 * w, 0, 32)
            word = jnp.where(
                cbits >= 32,
                jnp.int32(-1),
                (jnp.int32(1) << cbits) - jnp.int32(1),
            )
            new.append(_xor_fold(word & cov_mask))
        return acc ^ jnp.stack(new, axis=0)  # [W,8,128]

    acc = jax.lax.fori_loop(
        0, k_chunk // SUB_TRIS, step, jnp.zeros((w_words, 8, 128), jnp.int32)
    )
    out_ref[...] ^= acc


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

    ``coef_tiles``: [n_tiles, NCOEF, K] with K a multiple of ``k_chunk``
    (pad with zero coefficients -> valid=0). Returns packed words [N, N, W].
    """
    n_tiles, ncoef, k = coef_tiles.shape
    assert ncoef == NCOEF and k % k_chunk == 0 and k_chunk % SUB_TRIS == 0
    nty = n // TILE
    assert n % TILE == 0 and n_tiles == (n // TILE) * nty
    w_words = n // 32

    out = pl.pallas_call(
        partial(_parity_kernel, n=n, nty=nty, k_chunk=k_chunk),
        grid=(n_tiles, k // k_chunk),
        in_specs=[
            pl.BlockSpec(
                (1, NCOEF, k_chunk),
                lambda t, c: (t, 0, c),
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
    pt = parity_tri_setup(verts_norm, tris, n)
    coef = pack_coeffs(pt)  # [NCOEF, T]
    t = coef.shape[1]
    pad = (-t) % k_chunk
    if pad:
        coef = jnp.pad(coef, ((0, 0), (0, pad)))
    n_tiles = (n // TILE) ** 2
    coef_tiles = jnp.broadcast_to(coef[None], (n_tiles, NCOEF, coef.shape[1]))
    return voxelize_parity_tiles(coef_tiles, n, k_chunk=k_chunk, interpret=interpret)
