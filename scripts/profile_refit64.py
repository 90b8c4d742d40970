"""Stage-level slope profile of the deforming-raystab REFIT (dragon).

Round-3 verdict weak #1: deforming_raystab_64_ms = 44.5 while the static
query is 3.3 — the per-frame refit dominates. This splits the refit into
stages, each slope-timed between two in-graph scan lengths (the tunnel's
fixed dispatch latency cancels; see bench.py):

  a) full refit + query        (the bench's deforming_raystab_64_ms body)
  b) refit only                (coef matrix + per-class gathers + transposes)
  c) coef/normal matrix build  ([T+1, 12] x2 — radial setup + row concat)
  d) gathers only              (per-class candidate row gathers, no transpose)
  e) gathers + transposes      (d plus the lane-aligned relayouts)

Also prints per-class candidate-table row counts (the gather cost driver:
XLA TPU gathers cost ~10 ns/row regardless of width).

Run: python scripts/profile_refit64.py [-n 64]
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
    from dxrvoxelizer_tpu.ops.raystab_fast import raystab_query2, table_k
    from dxrvoxelizer_tpu.ops.raystab_refit import (
        RaystabRefitter,
        _normal_rows,
        _radial_coef_matrix,
    )
    from dxrvoxelizer_tpu.utils.config import VoxelizerConfig

    n = args.n
    scene = Scene.load(VoxelizerConfig(mesh=args.mesh, grid_size=n))
    b = scene.buffers
    rf = RaystabRefitter(
        b.positions_norm, b.tris, b.normals, n=n, pad=0.035,
        use_cache=True, pad_dirs=b.normals,
    )
    tc = int(b.tris.shape[0])

    rows = [int(t.shape[0]) * int(t.shape[1]) for t in rf._tabs]
    ov_rows = int(rf._ov_ids.shape[0]) if rf._ov_ids is not None else 0
    total = sum(rows) + ov_rows
    print(f"# classes: {len(rows)} lane-aligned={rf._lanes}", file=sys.stderr)
    print(f"# candidate rows/class: {rows} ov={ov_rows} "
          f"TOTAL={total} ({total/1e6:.2f} M rows; x2 for coef+normal)",
          file=sys.stderr)

    state = rf.device_state()
    full_args = (state, b.positions_norm, b.normals)

    def slope(make_body, r_pair=(2, 8), reps=3, label="", args=None):
        ra, rb = r_pair
        body_args = full_args if args is None else args

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

    def deformed(carry, v_rest, nr):
        amp = jnp.float32(0.03) + carry * 1e-38
        return v_rest + amp * jnp.sin(v_rest[:, :1] * 5.0) * nr

    def checksum(tree):
        acc = jnp.float32(0.0)
        for x in jax.tree.leaves(tree):
            if jnp.issubdtype(x.dtype, jnp.floating):
                acc = acc + jnp.sum(x * 1e-38).astype(jnp.float32)
        return acc

    def make_full_body(full_refit: bool):
        def full_body(a):
            st, v_rest, nr = a

            def body(carry, _):
                v_t = deformed(carry, v_rest, nr)
                acc = rf.refit_with_state(
                    st, v_t, nr if full_refit else None
                )
                occ, rgba = raystab_query2(v_t, nr, rf.tris, acc)
                return (jnp.sum(rgba * 1e-38)
                        + jnp.sum(occ).astype(jnp.float32) * 1e-38), None

            return body

        return full_body

    def make_refit_body(full_refit: bool):
        def refit_body(a):
            st, v_rest, nr = a

            def body(carry, _):
                v_t = deformed(carry, v_rest, nr)
                acc = rf.refit_with_state(
                    st, v_t, nr if full_refit else None
                )
                # checksum-consume every refitted table (slicing one
                # element lets XLA delete whole gathers)
                return checksum((acc.levels, acc.ov_dense)), None

            return body

        return refit_body

    def matrix_body(a):
        st, v_rest, nr = a
        tris = st[0]

        def body(carry, _):
            v_t = deformed(carry, v_rest, nr)
            coef = _radial_coef_matrix(
                v_t, tris, jnp.arange(tc, dtype=jnp.int32)
            )
            ncoef = _normal_rows(nr, tris)
            return checksum((coef, ncoef)), None

        return body

    def make_gather_body(with_transpose: bool, fused: bool = True):
        def gather_body(a):
            st, v_rest, nr = a
            tris, tabs, ov_ids = st[0], st[1], st[2]

            def body(carry, _):
                v_t = deformed(carry, v_rest, nr)
                coef = _radial_coef_matrix(
                    v_t, tris, jnp.arange(tc, dtype=jnp.int32)
                )
                ncoef = _normal_rows(nr, tris)
                fmat = jnp.concatenate([coef, ncoef], axis=-1)
                outs = []
                for tab, lane in zip(tabs, rf._lanes):
                    ti = jnp.where(tab >= 0, tab, tc)
                    if fused:
                        g = fmat[ti]
                        if with_transpose and lane:
                            g = g.transpose(0, 2, 1)
                        outs.append(g)
                    else:
                        cf, nf = coef[ti], ncoef[ti]
                        if with_transpose and lane:
                            cf = cf.transpose(0, 2, 1)
                            nf = nf.transpose(0, 2, 1)
                        outs.append((cf, nf))
                if ov_ids is not None:
                    ti = jnp.where(ov_ids >= 0, ov_ids, tc)
                    g = fmat[ti]
                    if with_transpose and rf._ov_lane:
                        g = g.T
                    outs.append(g)
                return checksum(outs), None

            return body

        return gather_body

    # ---- attribution: kernels on refitted vs static tables ----------------
    from dxrvoxelizer_tpu.ops.raystab_fast import (
        fold_extract_dispatch,
        table_k,
    )

    acc0 = rf.rest_accel
    ks = tuple(table_k(c[1]) for c in acc0.levels[0])
    ovk = table_k(acc0.ov_dense[1]) if acc0.ov_dense else 0

    def kernels_sum(levels0, ov_dense):
        acc = jnp.float32(0.0)
        for (rays, coefs, sc, bounds, ntab), k in zip(levels0, ks):
            t_c, i_c, ns = fold_extract_dispatch(
                rays, coefs, ntab, k, tc, 0.12, bounds=bounds
            )
            acc = (acc + t_c[0, 0] * 1e-38 + i_c[0, 0] * 1e-38
                   + ns[0, 0, 0] * 1e-38)
        if ov_dense is not None:
            rays_ov, cf_ov, nf_ov = ov_dense
            t_ov, i_ov, ns_ov = fold_extract_dispatch(
                rays_ov, cf_ov, nf_ov, ovk, tc, 0.12, shared=True
            )
            acc = acc + t_ov[0, 0] * 1e-38 + ns_ov[0, 0, 0] * 1e-38
        return acc

    def refit_kernels_body(a):
        st, v_rest, nr = a

        def body(carry, _):
            v_t = deformed(carry, v_rest, nr)
            acc = rf.refit_with_state(st, v_t, None)
            return kernels_sum(acc.levels[0], acc.ov_dense), None

        return body

    def static_kernels_body(a):
        # tables arrive as ARGS (baking them into the graph as constants
        # overflows the remote-compile request body at 64^3 table sizes)
        levels0, ov_dense = a

        def body(carry, _):
            eps = carry * 1e-38
            lv = tuple(
                (rays + eps, coefs, sc, bounds, ntab)
                for (rays, coefs, sc, bounds, ntab) in levels0
            )
            ov = (
                None if ov_dense is None
                else (ov_dense[0] + eps,) + tuple(ov_dense[1:])
            )
            return kernels_sum(lv, ov), None

        return body

    # ---- experiment: gather straight into the lane-aligned layout ---------
    def _gather_rows_to_cols(mat, idx2d):
        """operand [R, W], indices [VC, K] -> output [VC, W, K]: the
        offset (W) axis placed at output dim 1 by the gather itself —
        no separate transpose op."""
        vc, k = idx2d.shape
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        idx = idx2d.reshape(vc, k, 1)
        return jax.lax.gather(
            mat, idx, dn, slice_sizes=(1, mat.shape[1])
        )

    def direct_gather_body(a):
        st, v_rest, nr = a
        tris, tabs, ov_ids = st[0], st[1], st[2]

        def body(carry, _):
            v_t = deformed(carry, v_rest, nr)
            coef = _radial_coef_matrix(
                v_t, tris, jnp.arange(tc, dtype=jnp.int32)
            )
            outs = []
            for tab, lane in zip(tabs, rf._lanes):
                ti = jnp.where(tab >= 0, tab, tc)
                if lane:
                    outs.append(_gather_rows_to_cols(coef, ti))
                else:
                    outs.append(coef[ti])
            if ov_ids is not None:
                ti = jnp.where(ov_ids >= 0, ov_ids, tc)
                cf = coef[ti]
                outs.append(cf.T if rf._ov_lane else cf)
            return checksum(outs), None

        return body

    slope(make_full_body(False),
          label="refit+query COEF-ONLY (app config: static normals)")
    slope(make_full_body(True), label="refit+query FULL (normals too)")
    slope(make_refit_body(False), label="refit only, coef-only")
    slope(refit_kernels_body, label="refit(coef-only) + kernels, no merge")
    slope(static_kernels_body, label="STATIC tables + kernels, no merge",
          args=(acc0.levels[0], acc0.ov_dense))
    slope(direct_gather_body,
          label="coef matrix + DIRECT-LAYOUT gathers (lax.gather experiment)")
    slope(matrix_body, label="coef/normal matrix build only")
    return 0


if __name__ == "__main__":
    sys.exit(main())
