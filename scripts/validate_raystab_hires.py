"""Validate the ray-stab query at hi-res grids against the radial
oracle, on the real device (the CPU interpret path would take hours at
256^3: 16.7M rays x 100k triangles).

Pass criteria:
  - occupancy: BIT-EXACT (0 mismatching voxels) — the inside/outside
    rule (DXRVoxelizer.hlsl:44-53) is the contract that shapes every
    downstream image.
  - rgba (winner normals): within ULP_TOL ulps per channel. On CPU and
    at <= 128^3 on TPU the chains are bit-exact; at 256^3 the largest
    capacity classes compile to different FMA contractions under Mosaic
    than the oracle's XLA graph and the interpolated normals drift by
    <= 5 ulp (diagnosed by scripts/diag_raystab_rgba.py: occ diff 0,
    same winners, ulp histogram max=5 p99=3). A float normal component
    5 ulp off is ~3e-7 relative — invisible at u8 image depth.

Run: python scripts/validate_raystab_hires.py [-n 256] [-mesh dragon.obj]
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
    ap.add_argument("--skip-oracle", action="store_true",
                    help="only build + time the query (no bit-exact check)")
    ap.add_argument("--ulp-tol", type=int, default=8,
                    help="max per-channel rgba ulp distance accepted")
    ap.add_argument("--fresh-build", action="store_true",
                    help="skip the on-disk accel cache: time the full "
                    "cold-per-geometry build (binning + packing + device "
                    "assembly) like a first-seen mesh pays it")
    ap.add_argument("--gen", type=int, default=0, choices=(0, 6, 7),
                    help="accel generation (0 = the product routing: "
                    "gen-7 tiled at n >= 128, gen-6 cone strips at 64)")
    args = ap.parse_args()

    from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrvoxelizer_tpu.models.scene import Scene
    from dxrvoxelizer_tpu.ops.raystab_fast import (
        raystab_query2,
        table_k,
    )
    from dxrvoxelizer_tpu.utils.accel_cache import (
        cached_build_raystab_accel2,
    )
    from dxrvoxelizer_tpu.utils.config import VoxelizerConfig

    n = args.n
    from dxrvoxelizer_tpu.ops.raystab_tiled import use_tiled_raystab

    gen7 = args.gen == 7 or (args.gen == 0 and use_tiled_raystab(n))
    scene = Scene.load(VoxelizerConfig(mesh=args.mesh, grid_size=n))
    b = scene.buffers
    tc = int(b.tris.shape[0])
    print(f"# mesh={args.mesh} tris={tc} n={n}", file=sys.stderr)

    # pay the process's one-time tunnel claim + first-dispatch cost BEFORE
    # the build timer starts: the first device readback of a fresh TPU
    # process absorbs a variable ~30-300 s tunnel-claim wait that any
    # process pays exactly once and that has nothing to do with the accel
    # path (it inflated "build/load" to 80-292 s across otherwise
    # identical cached runs).
    from dxrvoxelizer_tpu.ops.raystab_fast import fence_scalar

    _ = fence_scalar([jnp.zeros((1,), jnp.float32)])

    t0 = time.perf_counter()
    if gen7:
        from dxrvoxelizer_tpu.utils.accel_cache import (
            cached_build_raystab_accel7,
        )

        if args.fresh_build:
            from dxrvoxelizer_tpu.ops.raystab_tiled import (
                build_raystab_accel7,
            )

            accel = build_raystab_accel7(
                b.positions_norm, b.tris, b.normals, n
            )
            label = "gen-7 accel FRESH build"
        else:
            accel = cached_build_raystab_accel7(
                b.positions_norm, b.tris, b.normals, n
            )
            label = "gen-7 accel build/load"
    elif args.fresh_build:
        from dxrvoxelizer_tpu.ops.raystab_fast import build_raystab_accel2

        accel = build_raystab_accel2(b.positions_norm, b.tris, b.normals, n)
        label = "accel FRESH build"
    else:
        accel = cached_build_raystab_accel2(
            b.positions_norm, b.tris, b.normals, n
        )
        label = "accel build/load"
    # fence with ONE jitted scalar over every table (block_until_ready
    # is a no-op over the tunnel; eager per-leaf slices each pay a
    # remote compile + dispatch): charge the device assembly execution
    # to the build in BOTH paths
    if gen7:
        _ = fence_scalar(jax.tree.leaves(accel.classes))
        print(f"# {label}: {time.perf_counter() - t0:.1f} s "
              f"live={accel.stats.live_tiles} dead={accel.stats.dead_tiles}"
              f" pairs={accel.stats.pairs} near={accel.stats.near_origin}",
              file=sys.stderr)
    else:
        _ = fence_scalar(jax.tree.leaves(accel.levels))
        print(f"# {label}: {time.perf_counter() - t0:.1f} s "
              f"levels={accel.stats.levels} near={accel.stats.near_origin}",
              file=sys.stderr)

    def phys_bytes(a):
        s = list(a.shape)
        s[-1] = -(-s[-1] // 128) * 128
        if len(s) >= 2:
            s[-2] = -(-s[-2] // 8) * 8
        from functools import reduce

        return reduce(lambda x, y: x * y, s, 1) * a.dtype.itemsize

    leaves = jax.tree.leaves(
        accel.classes if gen7
        else (accel.levels, accel.ov_dense, accel.sort_keys)
    )
    log_mb = sum(a.size * a.dtype.itemsize for a in leaves) / 2**20
    phys_mb = sum(phys_bytes(a) for a in leaves) / 2**20
    ks = (
        [table_k(c[1]) for c in accel.classes] if gen7
        else [table_k(c[1]) for lv in accel.levels for c in lv]
    )
    print(f"# accel tables: {log_mb:.0f} MiB logical / {phys_mb:.0f} MiB "
          f"physical (lane-aligned); class Ks={ks}", file=sys.stderr)

    t0 = time.perf_counter()
    if gen7:
        from dxrvoxelizer_tpu.ops.raystab_tiled import raystab_query7

        occ_f, rgba_f = raystab_query7(
            b.positions_norm, b.normals, b.tris, accel
        )
    else:
        occ_f, rgba_f = raystab_query2(
            b.positions_norm, b.normals, b.tris, accel
        )
    occ_f.block_until_ready()
    print(f"# query cold (compile+run): {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)
    inside = int(jnp.sum(occ_f))
    print(f"# inside voxels: {inside} / {n**3}", file=sys.stderr)

    ok = True
    if not args.skip_oracle:
        from dxrvoxelizer_tpu.ops.voxelize_ref import (
            voxelize_raystab_radial_ref,
        )

        t0 = time.perf_counter()
        occ_r, rgba_r = voxelize_raystab_radial_ref(
            b.positions_norm, b.normals, b.tris, n=n,
            ray_chunk=16384, tri_chunk=2048,
        )
        occ_r.block_until_ready()
        print(f"# oracle: {time.perf_counter() - t0:.1f} s", file=sys.stderr)
        occ_f_h, occ_r_h, rgba_f_h, rgba_r_h = jax.device_get(
            (occ_f, occ_r, rgba_f, rgba_r)
        )
        occ_diff = int((occ_f_h != occ_r_h).sum())
        rgba_diff = int((rgba_f_h != rgba_r_h).sum())
        a = rgba_f_h.reshape(-1).view(np.int32).astype(np.int64)
        c = rgba_r_h.reshape(-1).view(np.int32).astype(np.int64)
        ulp_max = int(np.abs(a - c).max()) if rgba_diff else 0
        print(f"# occ mismatches: {occ_diff}  rgba mismatching channels: "
              f"{rgba_diff}  rgba max ulp: {ulp_max}", file=sys.stderr)
        ok = occ_diff == 0 and ulp_max <= args.ulp_tol
        if occ_diff:
            bad = np.argwhere(occ_f_h != occ_r_h)[:8]
            print(f"# first occ diffs at: {bad.tolist()}", file=sys.stderr)

    # slope-timed query (tunnel latency cancels; checksum-consume both
    # outputs, perturb every float input — see bench.py)
    from dxrvoxelizer_tpu.ops.raystab_fast import _raystab_query2

    if gen7:
        from dxrvoxelizer_tpu.ops.raystab_tiled import _raystab_query7

        ks7 = tuple(table_k(c[1]) for c in accel.classes)
    else:
        ks_t = tuple(
            tuple(table_k(c[1]) for c in lv) for lv in accel.levels
        )
        ovk = table_k(accel.ov_dense[1]) if accel.ov_dense else 0

    # the accel rides as jit ARGUMENTS, not closed-over constants: at
    # 256^3 the tables are ~GBs and constant-embedding them in the HLO
    # breaks the remote-compile transport (and bloats the compile)
    def make(r):
        if gen7:
            @jax.jit
            def run7(a):
                classes = a

                def stab_body(carry, _):
                    eps = carry * 1e-38
                    cls = tuple(
                        (c[0] + eps,) + tuple(c[1:]) for c in classes
                    )
                    occ, rgba = _raystab_query7(
                        cls, n, accel.tile, ks7, tc, 0.12, False,
                    )
                    return (jnp.sum(rgba * 1e-38)
                            + jnp.sum(occ).astype(jnp.float32) * 1e-38), None

                out, _ = jax.lax.scan(stab_body, jnp.float32(0.0), None,
                                      length=r)
                return out

            return lambda: run7(accel.classes)

        @jax.jit
        def run(a):
            # single-tuple arg + identical body to bench.py's raystab
            # slope: the two scripts then share one compiled executable.
            # Anti-hoist: carry-perturb each class's RAYS table (exact
            # f32 no-op) — every fused kernel consumes its rays, so the
            # whole query stays inside the scan; rays tables are small.
            # (Perturbing EVERY f32 leaf copied the GB-scale coefficient
            # tables per iteration — the 256^3 remote compile ground 30+
            # min and broke the transport; optimization_barrier copies
            # nothing but XLA strips barriers before LICM and the slope
            # collapsed to 0.)
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
                    lv, sort_keys, ov, n, 0.12, ks_t, ovk, tc, False,
                )
                return (jnp.sum(rgba * 1e-38)
                        + jnp.sum(occ).astype(jnp.float32) * 1e-38), None

            out, _ = jax.lax.scan(stab_body, jnp.float32(0.0), None,
                                  length=r)
            return out

        return lambda: run((accel.levels, accel.sort_keys, accel.ov_dense))

    # (2, 8) matches bench.py's raystab slope pair — the persistent
    # compile cache then serves both scripts with one compile set
    ra, rb = 2, 8
    fa, fb = make(ra), make(rb)
    float(fa()); float(fb())

    def best(f, reps=3):
        t = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            t = min(t, time.perf_counter() - t0)
        return t

    dt = (best(fb) - best(fa)) / (rb - ra)
    if args.skip_oracle:
        status = "SKIPPED"
    elif not ok:
        status = "FAIL"
    elif rgba_diff == 0:
        status = "bit-exact"
    else:
        status = f"occ bit-exact, rgba<={ulp_max}ulp"
    print(f"raystab query {n}^3: {dt*1e3:.2f} ms  oracle_check={status}",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
