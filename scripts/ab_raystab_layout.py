"""A/B the gen-5 lane-aligned table routing against the classic layout.

Builds the 64^3 dragon accel twice — once with the current LANE_MIN_K
routing (gen-5 transposed tables for wide classes) and once with routing
forced all-classic (gen-4 [K, 12] tables) — and slope-times, in ONE TPU
process: (a) the full query, (b) the fused kernels only, per layout.
Prints per-class K so the winning threshold can be set from measurement.

Run: python scripts/ab_raystab_layout.py [--n 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--r", type=int, nargs=2, default=(2, 8))
    ap.add_argument("--per-class", action="store_true",
                    help="also time every class kernel (many compiles)")
    ap.add_argument("--layouts", default="gen5,gen4",
                    help="comma list: gen5 (current routing) / gen4 "
                         "(all-classic)")
    args = ap.parse_args()

    from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dxrvoxelizer_tpu.models.scene import Scene
    from dxrvoxelizer_tpu.ops import raystab_fast as rf
    from dxrvoxelizer_tpu.utils.config import VoxelizerConfig

    n = args.n
    scene = Scene.load(VoxelizerConfig(mesh="dragon.obj", grid_size=n))
    b = scene.buffers
    tc = int(b.tris.shape[0])

    def build(lane_min_k):
        old = rf.LANE_MIN_K
        rf.LANE_MIN_K = lane_min_k
        try:
            t0 = time.perf_counter()
            accel = rf.build_raystab_accel2(
                b.positions_norm, b.tris, b.normals, n
            )
            print(f"# build (LANE_MIN_K={lane_min_k}): "
                  f"{time.perf_counter()-t0:.1f} s", file=sys.stderr)
        finally:
            rf.LANE_MIN_K = old
        ks = tuple(tuple(rf.table_k(c[1]) for c in lv) for lv in accel.levels)
        ovk = rf.table_k(accel.ov_dense[1]) if accel.ov_dense else 0
        return accel, ks, ovk

    def slope(body, label):
        ra, rb = args.r

        def make(r):
            @jax.jit
            def run():
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
                return out

            return run

        fa, fb = make(ra), make(rb)
        float(fa()); float(fb())

        def best(f):
            t = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(f())
                t = min(t, time.perf_counter() - t0)
            return t

        dt = (best(fb) - best(fa)) / (rb - ra)
        print(f"{label}: {dt*1e3:.3f} ms", flush=True)
        return dt

    def perturb(tree, carry):
        return jax.tree.map(
            lambda x: x + carry * 1e-38 if x.dtype == jnp.float32 else x,
            tree,
        )

    def measure(tag, accel, ks, ovk):
        vcs = tuple(
            tuple(int(c[0].shape[0]) for c in lv) for lv in accel.levels
        )
        print(f"# {tag}: class (K, strips) = "
              f"{[list(zip(k, v)) for k, v in zip(ks, vcs)]} ovk={ovk}",
              file=sys.stderr)

        def full_body(carry, _):
            occ, rgba = rf._raystab_query2(
                perturb(accel.levels, carry), accel.sort_keys,
                perturb(accel.ov_dense, carry), n, 0.12, ks, ovk, tc, False,
            )
            return (jnp.sum(rgba * 1e-38)
                    + jnp.sum(occ).astype(jnp.float32) * 1e-38), None

        def kernels_body(carry, _):
            acc = jnp.float32(0.0)
            for level, level_ks in zip(accel.levels, ks):
                for (rays, coefs, scatter, bounds, ntab), k in zip(
                    level, level_ks
                ):
                    t_c, i_c, ns = rf.fold_extract_dispatch(
                        rays + carry * 1e-38, coefs, ntab, k, tc, 0.12,
                        bounds=bounds,
                    )
                    acc = (acc + t_c[0, 0] * 1e-38 + i_c[0, 0] * 1e-38
                           + ns[0, 0, 0] * 1e-38)
            if accel.ov_dense is not None:
                rays_ov, cf_ov, nf_ov = accel.ov_dense
                t_ov, i_ov, ns_ov = rf.fold_extract_dispatch(
                    rays_ov + carry * 1e-38, cf_ov, nf_ov, ovk, tc, 0.12,
                    shared=True,
                )
                acc = acc + t_ov[0, 0] * 1e-38 + ns_ov[0, 0, 0] * 1e-38
            return acc, None

        slope(full_body, f"{tag} full query")
        slope(kernels_body, f"{tag} kernels only")

    # per-class kernel timing for BOTH layouts to place the threshold
    def per_class(tag, accel, ks, ovk):
        for li, (level, level_ks) in enumerate(zip(accel.levels, ks)):
            for cidx, ((rays, coefs, scatter, bounds, ntab), k) in enumerate(
                zip(level, level_ks)
            ):
                vc = int(rays.shape[0])

                def body(carry, _, rays=rays, coefs=coefs, ntab=ntab,
                         k=k, bounds=bounds):
                    t_c, i_c, ns = rf.fold_extract_dispatch(
                        rays + carry * 1e-38, coefs, ntab, k, tc, 0.12,
                        bounds=bounds,
                    )
                    return (t_c[0, 0] * 1e-38 + i_c[0, 0] * 1e-38
                            + ns[0, 0, 0] * 1e-38), None

                slope(body, f"{tag} class K={k} vc={vc}")
        if accel.ov_dense is not None:
            rays_ov, cf_ov, nf_ov = accel.ov_dense

            def body(carry, _):
                t_ov, i_ov, ns_ov = rf.fold_extract_dispatch(
                    rays_ov + carry * 1e-38, cf_ov, nf_ov, ovk, tc, 0.12,
                    shared=True,
                )
                return t_ov[0, 0] * 1e-38 + ns_ov[0, 0, 0] * 1e-38, None

            slope(body, f"{tag} overflow K={ovk}")

    layouts = args.layouts.split(",")
    built = {}
    for tag in layouts:
        lmk = rf.LANE_MIN_K if tag == "gen5" else 10**9
        built[tag] = build(lmk)
    for tag in layouts:
        measure(tag, *built[tag])
    if args.per_class:
        for tag in layouts:
            per_class(tag, *built[tag])
    return 0


if __name__ == "__main__":
    sys.exit(main())
