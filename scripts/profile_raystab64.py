"""Stage-level slope profile of the gen-2 ray-stab query at 64^3 (dragon).

Times (a) the full query, (b) kernels + sort-merge only, (c) the stream
kernels only, (d) finalize only — each as a slope between two in-graph scan
lengths (the tunnel's fixed dispatch latency cancels; see bench.py).

Run: python scripts/profile_raystab64.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import numpy as np

    from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dxrvoxelizer_tpu.models.scene import Scene
    from dxrvoxelizer_tpu.ops.raystab_fast import (
        _merge_winners2,
        _raystab_query2,
        build_raystab_accel2,
    )
    from dxrvoxelizer_tpu.ops.raystab_fast import fold_extract_dispatch
    from dxrvoxelizer_tpu.utils.config import VoxelizerConfig

    n = 64
    scene = Scene.load(VoxelizerConfig(mesh="dragon.obj", grid_size=n))
    b = scene.buffers
    accel = build_raystab_accel2(b.positions_norm, b.tris, b.normals, n)
    from dxrvoxelizer_tpu.ops.raystab_fast import table_k

    ks = tuple(tuple(table_k(c[1]) for c in lv) for lv in accel.levels)
    ovk = table_k(accel.ov_dense[1]) if accel.ov_dense else 0
    tc = int(b.tris.shape[0])
    print(f"# levels: {accel.stats.levels} near={accel.stats.near_origin}",
          file=sys.stderr)

    def slope(body, r_pair=(4, 16), reps=3, label=""):
        ra, rb = r_pair

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
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f())
                t = min(t, time.perf_counter() - t0)
            return t

        dt = (best(fb) - best(fa)) / (rb - ra)
        print(f"{label}: {dt*1e3:.3f} ms", flush=True)
        return dt

    def perturb(tree, carry):
        """Opaque no-op on every float leaf so NOTHING in the query is
        loop-invariant — perturbing only ftab lets XLA hoist the kernels
        and sort out of the measurement scan (this bug once under-reported
        the query 2x)."""
        return jax.tree.map(
            lambda x: x + carry * 1e-38 if x.dtype == jnp.float32 else x,
            tree,
        )

    # XLA-level stages (sorts, selects, finalize) MUST be checksum-consumed:
    # slicing one element lets XLA slice the whole stage out of the scan
    # (occ[0] consumption under-reported the gen-2 gather finalize 3 ms).
    # Pallas outputs are safe to scalar-consume (opaque custom-calls).
    def full_body(carry, _):
        occ, rgba = _raystab_query2(
            perturb(accel.levels, carry),
            accel.sort_keys, perturb(accel.ov_dense, carry), n, 0.12,
            ks, ovk, tc, False,
        )
        return (jnp.sum(rgba * 1e-38)
                + jnp.sum(occ).astype(jnp.float32) * 1e-38), None

    def merge_body(carry, _):
        out = _merge_winners2(
            perturb(accel.levels, carry), accel.sort_keys,
            perturb(accel.ov_dense, carry), n, ks, ovk, tc, 0.12,
            "backface", False
        )
        acc = jnp.float32(0.0)
        for a in out:
            acc = acc + jnp.sum(a * 1e-38).astype(jnp.float32)
        return acc, None

    def kernels_body(carry, _):
        acc = jnp.float32(0.0)
        for level, level_ks in zip(accel.levels, ks):
            for (rays, coefs, scatter, bounds, ntab), k in zip(
                level, level_ks
            ):
                t_c, i_c, ns = fold_extract_dispatch(
                    rays + carry * 1e-38, coefs, ntab, k, tc, 0.12,
                    bounds=bounds,
                )
                acc = (acc + t_c[0, 0] * 1e-38 + i_c[0, 0] * 1e-38
                       + ns[0, 0, 0] * 1e-38)
        if accel.ov_dense is not None:
            rays_ov, cf_ov, nf_ov = accel.ov_dense
            t_ov, i_ov, ns_ov = fold_extract_dispatch(
                rays_ov + carry * 1e-38, cf_ov, nf_ov, ovk, tc, 0.12,
                shared=True,
            )
            acc = acc + t_ov[0, 0] * 1e-38 + ns_ov[0, 0, 0] * 1e-38
        return acc, None

    slope(full_body, label="full query")
    slope(merge_body, label="kernels + extract + sort-merge")
    slope(kernels_body, label="fused fold+extract kernels only")
    return 0


if __name__ == "__main__":
    sys.exit(main())
