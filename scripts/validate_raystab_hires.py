"""Validate + bench the gen-2 ray-stab path at hi-res grids on the TPU.

128^3 and 256^3 (VERDICT r1 item 5): build the resolution-scaled accel,
run the gen-2 query, assert bit-exactness (occupancy AND rgba) against the
radial oracle on an icosphere fixture, and slope-time the dragon query.

Run: python scripts/validate_raystab_hires.py [--n 256] [--skip-oracle]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    import numpy as np

    from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dxrvoxelizer_tpu.ops.raystab_fast import raystab_query2
    from dxrvoxelizer_tpu.utils.accel_cache import (
        cached_build_raystab_accel2,
    )
    from dxrvoxelizer_tpu.ops.voxelize_ref import voxelize_raystab_radial_ref
    from meshes import icosphere_mesh

    ns = [128, 256]
    if "--n" in sys.argv:
        ns = [int(sys.argv[sys.argv.index("--n") + 1])]
    skip_oracle = "--skip-oracle" in sys.argv

    for n in ns:
        v, nr, t = icosphere_mesh(3)
        v = jnp.asarray(v)
        nr = jnp.asarray(nr)
        t = jnp.asarray(t)
        t0 = time.perf_counter()
        accel = cached_build_raystab_accel2(v, t, nr, n=n)
        print(f"# {n}^3 accel build: {time.perf_counter()-t0:.1f} s, "
              f"levels={accel.stats.levels} near={accel.stats.near_origin}",
              flush=True)
        t0 = time.perf_counter()
        occ2, rgba2 = raystab_query2(v, nr, t, accel)
        occ2_h, rgba2_h = jax.device_get((occ2, rgba2))
        print(f"# {n}^3 query (cold): {time.perf_counter()-t0:.1f} s, "
              f"occupied={int(occ2_h.sum())}", flush=True)

        if not skip_oracle:
            t0 = time.perf_counter()
            occ_r, rgba_r = voxelize_raystab_radial_ref(
                v, nr, t, n=n, ray_chunk=65536
            )
            occ_r_h, rgba_r_h = jax.device_get((occ_r, rgba_r))
            print(f"# {n}^3 radial oracle: {time.perf_counter()-t0:.1f} s",
                  flush=True)
            occ_ok = bool((occ2_h == occ_r_h).all())
            rgba_ok = bool((rgba2_h == rgba_r_h).all())
            print(f"{n}^3 bit-exact: occ={occ_ok} rgba={rgba_ok}", flush=True)
            if not (occ_ok and rgba_ok):
                mism = int((occ2_h != occ_r_h).sum())
                print(f"  occ mismatches: {mism} / {occ_r_h.size}")
                return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
