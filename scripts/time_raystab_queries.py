"""Slope-time the static gen-6 raystab queries (64^3 / 128^3) — the
round-4 merge fast path (5-channel sort when the accel has no overflow
list, raystab_fast._merge_winners2) against the round-3 baselines
(3.30 ms / 23.24 ms). One TPU process, accel-cache + compile-cache warm.

Run: python scripts/time_raystab_queries.py [-n 64 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, nargs="*", default=[64, 128])
    ap.add_argument("-mesh", default="dragon.obj")
    args = ap.parse_args()

    from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dxrvoxelizer_tpu.models.scene import Scene
    from dxrvoxelizer_tpu.ops.raystab_fast import _raystab_query2, table_k
    from dxrvoxelizer_tpu.utils.accel_cache import (
        cached_build_raystab_accel2,
    )
    from dxrvoxelizer_tpu.utils.config import VoxelizerConfig

    scene = Scene.load(VoxelizerConfig(mesh=args.mesh, grid_size=64))
    b = scene.buffers
    tc = int(b.tris.shape[0])

    def slope(make_body, body_args, r_pair=(2, 8), reps=3, label=""):
        ra, rb = r_pair

        def make(r):
            @jax.jit
            def run(a):
                out, _ = jax.lax.scan(
                    make_body(a), jnp.float32(0.0), None, length=r
                )
                return out

            return lambda: run(body_args)

        fa, fb = make(ra), make(rb)
        float(fa()); float(fb())

        def best(f):
            t = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f())
                t = min(t, time.perf_counter() - t0)
            return t

        dt = (best(fb) - best(fa)) / (rb - ra)
        print(f"{label}: {dt*1e3:.3f} ms", flush=True)
        return dt

    for n in args.n:
        t0 = time.perf_counter()
        accel = cached_build_raystab_accel2(
            b.positions_norm, b.tris, b.normals, n
        )
        print(f"# accel {n}^3 ready in {time.perf_counter()-t0:.1f}s "
              f"(ov={'yes' if accel.ov_dense else 'no'})", file=sys.stderr)
        ks = tuple(
            tuple(table_k(c[1]) for c in lv) for lv in accel.levels
        )
        ovk = table_k(accel.ov_dense[1]) if accel.ov_dense else 0

        def make_stab_body(n_stab, ks_t, ovk_t):
            def with_args(a):
                levels, sort_keys, ov_dense = a

                def stab_body(carry, _):
                    eps = carry * 1e-38
                    lv = tuple(
                        tuple((c[0] + eps,) + tuple(c[1:]) for c in level)
                        for level in levels
                    )
                    ov = (
                        None if ov_dense is None
                        else (ov_dense[0] + eps,) + tuple(ov_dense[1:])
                    )
                    occ, rgba = _raystab_query2(
                        lv, sort_keys, ov, n_stab, 0.12, ks_t, ovk_t, tc,
                        False,
                    )
                    return (jnp.sum(rgba * 1e-38)
                            + jnp.sum(occ).astype(jnp.float32) * 1e-38), None

                return stab_body

            return with_args

        slope(make_stab_body(n, ks, ovk),
              (accel.levels, accel.sort_keys, accel.ov_dense),
              label=f"gen-6 query {n}^3 (5-ch merge)")
        del accel
    return 0


if __name__ == "__main__":
    sys.exit(main())
