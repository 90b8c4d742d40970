"""Design study for the gen-7 (output-major) raystab query.

Measures, with the real dragon binning products, what the query's kernel
pair count would be if strips were 128 CONSECUTIVE voxels (raster order,
so the sort-merge permutation disappears) instead of 128 same-cone rays:

  pairs_now   = sum over cone strips of the cell candidate-list length
  pairs_gen7  = sum over raster blocks of |union of crossed cells' lists|
  pairs_gen7f = gen-7 after dropping candidates whose conservative MAX
                hit radius is below the block's min ray origin radius
                (such a triangle is behind every ray in the block ->
                t < 0 for all lanes -> arithmetically dead)

Run: python scripts/study_gen7.py [n]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from dxrvoxelizer_tpu.models.scene import Scene  # noqa: E402
from dxrvoxelizer_tpu.utils.config import VoxelizerConfig  # noqa: E402
from dxrvoxelizer_tpu.ops import raystab_fast as rf  # noqa: E402


def main(n: int) -> None:
    scene = Scene.load(VoxelizerConfig(mesh="dragon.obj", grid_size=64))
    verts = np.asarray(scene.buffers.positions_norm, np.float32)
    tris = np.asarray(scene.buffers.tris)
    gs = rf.default_gs(n)
    span = 8
    t0 = time.perf_counter()

    # ---- replicate the build's level binning + fold --------------------
    sub_ids = np.arange(tris.shape[0], dtype=np.int32)
    level_runs = []
    for g in gs:
        if sub_ids.size == 0:
            break
        rects_h, over_h = rf._cone_keys_np(verts, tris[sub_ids], g, span,
                                           0.0, None)
        sorted_tris, starts, counts_h, ov_np = rf._cone_bins_host(
            rects_h, over_h, g, span
        )
        level_runs.append((sub_ids[sorted_tris].astype(np.int64), starts,
                           counts_h.astype(np.int64), g))
        sub_ids = sub_ids[ov_np]
    g_fine = gs[0]
    cell_offs, cell_data = rf._fold_levels_csr(level_runs, g_fine)
    kcell = cell_offs[1:] - cell_offs[:-1]
    print(f"[{time.perf_counter()-t0:6.1f}s] binning done; "
          f"near-origin overflow={sub_ids.size}")

    # ---- per-voxel cell + radius --------------------------------------
    ii = np.arange(n, dtype=np.float32)
    c1 = (ii + 0.5) / n * 2.0 - 1.0
    X, Y, Z = np.meshgrid(c1, c1, c1, indexing="ij")
    pos = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    # voxel_rays flips y (DX NDC): check rf.voxel_rays for exact layout
    posd = np.asarray(rf.voxel_rays(n)[0], np.float32)
    cells = rf._dir_cells_host(posd, g_fine)
    s0 = np.linalg.norm(posd, axis=1)
    v = n * n * n
    nb = v // 128
    tile = os.environ.get("GEN7_TILE")
    if tile:
        tx, ty, tz = (int(t) for t in tile.split(","))
        assert tx * ty * tz == 128
        idx = np.arange(v, dtype=np.int64)
        i, rem = np.divmod(idx, n * n)
        j, k = np.divmod(rem, n)
        blk = ((i // tx) * (n // ty) + j // ty) * (n // tz) + k // tz
        print(f"    tile shape {tx}x{ty}x{tz}")
    else:
        blk = np.arange(v, dtype=np.int64) // 128
    print(f"[{time.perf_counter()-t0:6.1f}s] cells done")

    # ---- current pair count -------------------------------------------
    # cone strips: per cell ceil(rays_in_cell / 128) strips x K_cell
    rc = np.bincount(cells, minlength=6 * g_fine * g_fine)
    strips_now = -(-rc // 128)
    pairs_now = int((strips_now * kcell).sum())

    # ---- gen-7: per-block crossed cells -------------------------------
    pairkey = blk * (6 * g_fine * g_fine) + cells
    upairs = np.unique(pairkey)
    ub = upairs // (6 * g_fine * g_fine)
    uc = upairs % (6 * g_fine * g_fine)
    cross = np.bincount(ub, minlength=nb)
    print(f"[{time.perf_counter()-t0:6.1f}s] blocks={nb} "
          f"crossed cells/block: mean={cross.mean():.2f} "
          f"p50={np.percentile(cross, 50):.0f} "
          f"p99={np.percentile(cross, 99):.0f} max={cross.max()}")

    # expand candidate lists per (block, cell) pair, dedup per block
    reps = kcell[uc]
    tot = int(reps.sum())
    print(f"    raw incidence rows before dedup: {tot/1e6:.1f}M")
    bl_rep = np.repeat(ub, reps)
    within = np.arange(tot, dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps
    )
    tri_rep = cell_data[np.repeat(cell_offs[uc], reps) + within]
    key = bl_rep * (1 << 24) | tri_rep
    key = np.unique(key)
    ub2 = key >> 24
    tri2 = (key & ((1 << 24) - 1)).astype(np.int64)
    union = np.bincount(ub2, minlength=nb)
    pairs_gen7 = int(union.sum())
    print(f"[{time.perf_counter()-t0:6.1f}s] union/block: "
          f"mean={union.mean():.1f} p50={np.percentile(union, 50):.0f} "
          f"p99={np.percentile(union, 99):.0f} max={union.max()}")

    # ---- near-prefix drop ---------------------------------------------
    tv = np.asarray(verts, np.float64)[tris]
    maxr = np.sqrt((tv ** 2).sum(-1)).max(axis=1) * (1.0 + 1e-3) + 1e-6
    s0min = s0.reshape(nb, 128).min(axis=1)
    alive = maxr[tri2] >= s0min[ub2]
    union_f = np.bincount(ub2[alive], minlength=nb)
    pairs_f = int(union_f.sum())
    dead_blocks = int((union_f == 0).sum())
    print(f"[{time.perf_counter()-t0:6.1f}s] results @ {n}^3 g={g_fine}:")
    print(f"    pairs_now   = {pairs_now/1e6:10.2f}M  (cone strips)")
    print(f"    pairs_gen7  = {pairs_gen7/1e6:10.2f}M  "
          f"({pairs_gen7/max(pairs_now,1):.2f}x)")
    print(f"    pairs_gen7f = {pairs_f/1e6:10.2f}M  "
          f"({pairs_f/max(pairs_now,1):.2f}x)  "
          f"empty blocks {dead_blocks}/{nb} "
          f"({100.0*dead_blocks/nb:.1f}%)")
    # also: what would the near-prefix drop do for the CURRENT layout?
    # (radius-sorted strips per cone cell)
    order = np.lexsort((s0, cells))
    s0_sorted = s0[order]
    cs = np.repeat(np.arange(rc.size), rc)
    # strip index within cell
    incell = np.arange(v) - np.repeat(np.cumsum(rc) - rc, rc)
    stripid = np.repeat(np.cumsum(strips_now) - strips_now, rc) + incell // 128
    smin = np.full(int(strips_now.sum()), np.inf, np.float32)
    np.minimum.at(smin, stripid, s0_sorted)
    # per strip: candidates alive = maxr[tri] >= smin[strip]
    scell = np.repeat(np.arange(rc.size), strips_now)
    reps2 = kcell[scell]
    tot2 = int(reps2.sum())
    st_rep = np.repeat(np.arange(smin.size), reps2)
    within2 = np.arange(tot2, dtype=np.int64) - np.repeat(
        np.cumsum(reps2) - reps2, reps2
    )
    tri_rep2 = cell_data[np.repeat(cell_offs[scell], reps2) + within2]
    alive2 = maxr[tri_rep2] >= smin[st_rep]
    pairs_now_f = int(alive2.sum())
    print(f"    pairs_now_f = {pairs_now_f/1e6:10.2f}M  "
          f"(near-drop on CURRENT cone strips, "
          f"{pairs_now_f/max(pairs_now,1):.2f}x of now)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
