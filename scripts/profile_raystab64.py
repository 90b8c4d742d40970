"""Stage-level slope profile of the gen-2 ray-stab query (dragon).

Times (a) the full query, (b) kernels + sort-merge only, (c) the stream
kernels only — each as a slope between two in-graph scan lengths (the
tunnel's fixed dispatch latency cancels; see bench.py). The accel tables
ride every jit as ARGUMENTS: closed-over arrays embed in the HLO as
constants, which at 256^3 sizes breaks the remote-compile transport.

Run: python scripts/profile_raystab64.py [-n 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=64)
    ap.add_argument("-mesh", default="dragon.obj")
    args = ap.parse_args()

    from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dxrvoxelizer_tpu.models.scene import Scene
    from dxrvoxelizer_tpu.ops.raystab_fast import (
        _merge_winners2,
        _raystab_query2,
        fold_extract_dispatch,
        table_k,
    )
    from dxrvoxelizer_tpu.utils.accel_cache import (
        cached_build_raystab_accel2,
    )
    from dxrvoxelizer_tpu.utils.config import VoxelizerConfig

    n = args.n
    scene = Scene.load(VoxelizerConfig(mesh=args.mesh, grid_size=n))
    b = scene.buffers
    accel = cached_build_raystab_accel2(
        b.positions_norm, b.tris, b.normals, n
    )
    ks = tuple(tuple(table_k(c[1]) for c in lv) for lv in accel.levels)
    ovk = table_k(accel.ov_dense[1]) if accel.ov_dense else 0
    tc = int(b.tris.shape[0])
    print(f"# levels: {accel.stats.levels} near={accel.stats.near_origin} "
          f"class Ks={ks}", file=sys.stderr)

    acc_args = (accel.levels, accel.sort_keys, accel.ov_dense)

    def slope(make_body, r_pair=(2, 8), reps=3, label=""):
        ra, rb = r_pair

        def make(r):
            @jax.jit
            def run(a):
                out, _ = jax.lax.scan(
                    make_body(a), jnp.float32(0.0), None, length=r
                )
                return out

            return lambda: run(acc_args)

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

    def variant(carry, tree):
        """Anti-hoist: carry-perturb each class's RAYS table (exact f32
        no-op, +carry*1e-38) in a (levels, ov_dense) tree — every fused
        kernel consumes its rays, so one variant operand pins every
        kernel inside the measurement scan; the sort/merge consume
        kernel outputs. Rays tables are small — perturbing EVERY f32
        leaf copied the GB-scale coefficient tables per iteration (the
        256^3 remote compile ground 30+ min and broke the transport),
        and lax.optimization_barrier copies nothing but XLA strips
        barriers before LICM (the measured slope collapsed to 0)."""
        levels, ov = tree
        eps = carry * 1e-38
        lv = tuple(
            tuple((c[0] + eps,) + tuple(c[1:]) for c in level)
            for level in levels
        )
        po = None if ov is None else (ov[0] + eps,) + tuple(ov[1:])
        return carry, (lv, po)

    # XLA-level stages (sorts, selects, finalize) MUST be checksum-consumed:
    # slicing one element lets XLA slice the whole stage out of the scan
    # (occ[0] consumption under-reported the gen-2 gather finalize 3 ms).
    # Pallas outputs are safe to scalar-consume (opaque custom-calls).
    def full_body(a):
        levels, sort_keys, ov_dense = a

        def body(carry, _):
            carry, (lv, ov) = variant(carry, (levels, ov_dense))
            occ, rgba = _raystab_query2(
                lv, sort_keys, ov, n, 0.12, ks, ovk, tc, False,
            )
            return (jnp.sum(rgba * 1e-38)
                    + jnp.sum(occ).astype(jnp.float32) * 1e-38), None

        return body

    def merge_body(a):
        levels, sort_keys, ov_dense = a

        def body(carry, _):
            carry, (lv, ov) = variant(carry, (levels, ov_dense))
            out = _merge_winners2(
                lv, sort_keys, ov, n, ks, ovk, tc, 0.12,
                "backface", False,
            )
            acc = jnp.float32(0.0)
            for x in out:
                acc = acc + jnp.sum(x * 1e-38).astype(jnp.float32)
            return acc, None

        return body

    def kernels_body(a):
        levels, _sort_keys, ov_dense = a

        def body(carry, _):
            carry, (lv, ov) = variant(carry, (levels, ov_dense))
            acc = jnp.float32(0.0)
            for level, level_ks in zip(lv, ks):
                for (rays, coefs, scatter, bounds, ntab), k in zip(
                    level, level_ks
                ):
                    t_c, i_c, ns = fold_extract_dispatch(
                        rays, coefs, ntab, k, tc, 0.12,
                        bounds=bounds,
                    )
                    acc = (acc + t_c[0, 0] * 1e-38 + i_c[0, 0] * 1e-38
                           + ns[0, 0, 0] * 1e-38)
            if ov is not None:
                rays_ov, cf_ov, nf_ov = ov
                t_ov, i_ov, ns_ov = fold_extract_dispatch(
                    rays_ov, cf_ov, nf_ov, ovk, tc, 0.12,
                    shared=True,
                )
                acc = acc + t_ov[0, 0] * 1e-38 + ns_ov[0, 0, 0] * 1e-38
            return acc, None

        return body

    slope(full_body, label="full query")
    slope(merge_body, label="kernels + extract + sort-merge")
    slope(kernels_body, label="fused fold+extract kernels only")
    return 0


if __name__ == "__main__":
    sys.exit(main())
