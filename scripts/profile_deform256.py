"""Stage-level slope profile of the deforming re-bin+voxelize at 256^3.

Splits the 6.5 ms/frame (r02 bench) into: phase-A (setup + pair sort),
full queue assembly (phase A + window gather), and the Pallas kernel run —
each slope-timed between two in-graph scan lengths (bench.py methodology).

Run: python scripts/profile_deform256.py [--n 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--r", type=int, nargs=2, default=(10, 40))
    args = ap.parse_args()

    from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dxrvoxelizer_tpu.models.scene import Scene
    from dxrvoxelizer_tpu.ops.voxelize_queue import (
        DeformingVoxelizer,
        _assemble_window,
        _queue_phase_a,
        _queue_run_group,
        _tiles_to_grid,
        TILE_X,
        TILE_Y,
    )
    from dxrvoxelizer_tpu.utils.config import VoxelizerConfig

    n = args.n
    scene = Scene.load(VoxelizerConfig(mesh="dragon.obj", grid_size=n))
    b = scene.buffers
    dv = DeformingVoxelizer(b.positions_norm, b.tris, n)
    print(f"# n={n} tris={int(b.tris.shape[0])} cap={dv.num_chunks} "
          f"groups={dv.n_groups}", file=sys.stderr)
    v0 = b.positions_norm
    tris = b.tris
    n_tiles = (n // TILE_X) * (n // TILE_Y)

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

    def wobble(carry):
        # per-iteration vertex perturbation so nothing is loop-invariant
        return v0 + carry * 1e-38

    sx, sy = dv.spans

    def phase_a_body(carry, _):
        coef, st, starts, counts, ov, n_ov = _queue_phase_a(
            wobble(carry), tris, n, sx, sy, ov_cap=512
        )
        return (jnp.sum(coef[0] * 1e-38) + st[0].astype(jnp.float32) * 1e-38
                + counts[0].astype(jnp.float32) * 1e-38
                + n_ov.astype(jnp.float32) * 1e-38), None

    def build_body(carry, _):
        pa = _queue_phase_a(wobble(carry), tris, n, sx, sy, ov_cap=512)
        coefs, tile_of, nsub, last, ok = _assemble_window(
            pa, n, dv.num_chunks, dv.k_chunk, 0, None
        )
        return (jnp.sum(coefs[:, 0] * 1e-38)
                + tile_of[0].astype(jnp.float32) * 1e-38
                + nsub[0].astype(jnp.float32) * 1e-38
                + last[0].astype(jnp.float32) * 1e-38), None

    def full_body(carry, _):
        words = dv(wobble(carry))
        return jnp.sum(words).astype(jnp.float32) * 1e-38, None

    slope(full_body, "full deforming frame (re-bin + kernel)")
    slope(build_body, "queue build (phase A + assembly)")
    slope(phase_a_body, "phase A (setup + pair sort)")
    if args.n <= 256:
        # kernel isolation: CONCRETE queue arrays (device_get/put round
        # trip, nothing traced from the build), so the scan body holds
        # ONLY the kernel launch
        import numpy as np

        pa = _queue_phase_a(v0, tris, n, sx, sy, ov_cap=512)
        parts = _assemble_window(pa, n, dv.num_chunks, dv.k_chunk, 0, None)
        coefs_h, tile_h, nsub_h, last_h = jax.device_get(parts[:4])
        coefs_c = jnp.asarray(coefs_h)
        tile_c, nsub_c, last_c = (
            jnp.asarray(tile_h), jnp.asarray(nsub_h), jnp.asarray(last_h)
        )

        def make_kernel_body(st):
            def kernel_body(carry, _):
                out = _queue_run_group(
                    coefs_c + carry * 1e-38, tile_c, nsub_c, last_c,
                    jnp.zeros((1,), jnp.int32), n, dv.k_chunk, n_tiles,
                    static_trip=st,
                )
                return jnp.sum(out).astype(jnp.float32) * 1e-38, None

            return kernel_body

        slope(make_kernel_body(False), "kernel only (dynamic trip)")
        slope(make_kernel_body(True), "kernel only (static trip)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
