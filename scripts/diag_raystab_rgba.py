"""Diagnose rgba mismatches between raystab_query2 and the radial oracle
at a given grid size (found at 256^3 in round 3: occ bit-exact, rgba not).

Classifies the divergence:
  - same winner id, normals off by ~1 ulp  -> FMA-contraction drift
  - different winner id, equal t           -> tie-break rule divergence
  - different winner id, different t       -> candidate-set / skip bug

Run: python scripts/diag_raystab_rgba.py [-n 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=256)
    ap.add_argument("-mesh", default="dragon.obj")
    ap.add_argument("-sample", type=int, default=4096,
                    help="mismatched rays to inspect in detail")
    args = ap.parse_args()

    from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrvoxelizer_tpu.models.scene import Scene
    from dxrvoxelizer_tpu.ops import intersect
    from dxrvoxelizer_tpu.ops.raystab_fast import raystab_query2
    from dxrvoxelizer_tpu.ops.voxelize_ref import voxelize_raystab_radial_ref
    from dxrvoxelizer_tpu.ops.raystab_fast import _ray_params
    from dxrvoxelizer_tpu.utils.accel_cache import cached_build_raystab_accel2
    from dxrvoxelizer_tpu.utils.config import VoxelizerConfig

    n = args.n
    scene = Scene.load(VoxelizerConfig(mesh=args.mesh, grid_size=n))
    b = scene.buffers
    tc = int(b.tris.shape[0])

    accel = cached_build_raystab_accel2(b.positions_norm, b.tris, b.normals, n)
    occ_f, rgba_f = raystab_query2(b.positions_norm, b.normals, b.tris, accel)
    t0 = time.perf_counter()
    occ_r, rgba_r = voxelize_raystab_radial_ref(
        b.positions_norm, b.normals, b.tris, n=n,
        ray_chunk=16384, tri_chunk=2048,
    )
    rf, rr, of, orr = jax.device_get((rgba_f, rgba_r, occ_f, occ_r))
    print(f"# oracle+pull: {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    rf = rf.reshape(-1, 4)
    rr = rr.reshape(-1, 4)
    bad = np.nonzero((rf != rr).any(axis=1))[0]
    print(f"# mismatched rays: {bad.size} / {n**3} "
          f"(occ diff {int((of != orr).sum())})", file=sys.stderr)
    if bad.size == 0:
        print("bit-exact")
        return 0

    # ulp distance per channel on the mismatched rays
    a = rf[bad].view(np.int32).astype(np.int64)
    c = rr[bad].view(np.int32).astype(np.int64)
    ulp = np.abs(a - c)
    print(f"# ulp histogram over mismatched channels: "
          f"max={ulp.max()} p50={np.percentile(ulp[ulp > 0], 50):.0f} "
          f"p99={np.percentile(ulp[ulp > 0], 99):.0f} "
          f"frac_le1={(ulp[ulp > 0] <= 1).mean():.3f}", file=sys.stderr)

    # winner id + t on a sample of mismatched rays, both paths
    sel = bad[np.linspace(0, bad.size - 1, min(args.sample, bad.size))
              .astype(np.int64)]
    # exact ray params the query used (device-computed, row-gathered there)
    dirs_all, s0_all = _ray_params(n)
    sel_d = jnp.asarray(sel)
    dirs = dirs_all[sel_d]
    s0 = s0_all[sel_d]
    g0, g1, g2, c4 = intersect.radial_setup(b.positions_norm, b.tris)
    t_o, i_o = intersect.radial_closest_hit(dirs, s0, g0, g1, g2, c4,
                                            tri_chunk=2048)
    t_oh, i_oh = jax.device_get((t_o, i_o))
    # inside flags for the sample (from occ), to split inside vs outside
    inside = np.asarray(of).reshape(-1)[sel]
    print(f"# sample: {sel.size} rays, inside={int(inside.sum())}",
          file=sys.stderr)
    print(f"# oracle hit ids present={int((i_oh < tc).sum())}",
          file=sys.stderr)
    # rgba channel values for 8 sample rays
    for r in range(min(8, sel.size)):
        print(f"# ray {sel[r]}: fast={rf[sel[r]]} oracle={rr[sel[r]]} "
              f"oracle_id={i_oh[r]} t={t_oh[r]:.9g} inside={inside[r]}",
              file=sys.stderr)
    print("diagnosis dumped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
