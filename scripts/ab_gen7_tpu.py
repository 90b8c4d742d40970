"""TPU A/B: gen-7 (tiled, sort-free) vs gen-6 (cone strips + sort-merge)
raystab query on the dragon. Slope-timed like bench.py; correctness
compared on-device (exact equality reduces, no bulk readback).

Run: python scripts/ab_gen7_tpu.py [sizes...]   (default: 64 128 256)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dxrvoxelizer_tpu.utils.backend import enable_compile_cache

enable_compile_cache()

from dxrvoxelizer_tpu.models.scene import Scene  # noqa: E402
from dxrvoxelizer_tpu.utils.config import VoxelizerConfig  # noqa: E402
from dxrvoxelizer_tpu.ops.raystab_fast import (  # noqa: E402
    _raystab_query2,
    fence_scalar,
    table_k,
)
from dxrvoxelizer_tpu.ops.raystab_tiled import (  # noqa: E402
    _raystab_query7,
    build_raystab_compact7,
    assemble_raystab_accel7,
    raystab_query7,
)
from dxrvoxelizer_tpu.utils.accel_cache import (  # noqa: E402
    cached_build_raystab_accel2,
    cached_build_raystab_accel7,
)


def slope(fn_builder, args, r_pair=(2, 8), reps=3):
    ra, rb = r_pair

    def make(r):
        @jax.jit
        def run(a):
            out, _ = jax.lax.scan(fn_builder(a), jnp.float32(0.0), None,
                                  length=r)
            return out
        return lambda: run(args)

    fa, fb = make(ra), make(rb)
    _ = float(fa()); _ = float(fb())

    def best(f):
        b = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); _ = float(f())
            b = min(b, time.perf_counter() - t0)
        return b

    s1 = (best(fb) - best(fa)) / (rb - ra)
    s2 = (best(fb) - best(fa)) / (rb - ra)
    return min(s1, s2)


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [64, 128, 256]
    scene = Scene.load(VoxelizerConfig(mesh="dragon.obj", grid_size=64))
    v, t, nr = (scene.buffers.positions_norm, scene.buffers.tris,
                scene.buffers.normals)
    tc = int(t.shape[0])
    for n in sizes:
        a6 = cached_build_raystab_accel2(v, t, nr, n)
        t0 = time.perf_counter()
        c7 = build_raystab_compact7(v, t, n=n)
        t_host = time.perf_counter() - t0
        a7 = assemble_raystab_accel7(c7, v, t, nr)
        _ = fence_scalar([cl[1] for cl in a7.classes])
        t_full = time.perf_counter() - t0
        print(f"n={n}: gen7 build host={t_host:.2f}s total={t_full:.2f}s "
              f"live={a7.stats.live_tiles} dead={a7.stats.dead_tiles} "
              f"pairs={a7.stats.pairs/1e6:.2f}M classes={a7.stats.classes}",
              flush=True)
        # correctness A/B on device
        from dxrvoxelizer_tpu.ops.raystab_fast import raystab_query2
        occ6, rgba6 = raystab_query2(v, nr, t, a6)
        occ7, rgba7 = raystab_query7(v, nr, t, a7)

        @jax.jit
        def eq(o6, r6, o7, r7):
            return (o6 == o7).all(), (r6 == r7).all()

        eo, er = jax.device_get(eq(occ6, rgba6, occ7, rgba7))
        print(f"n={n}: A/B occ equal: {bool(eo)}  rgba equal: {bool(er)}",
              flush=True)
        del occ6, rgba6, occ7, rgba7

        ks6 = tuple(tuple(table_k(c[1]) for c in lv) for lv in a6.levels)
        ovk6 = table_k(a6.ov_dense[1]) if a6.ov_dense else 0

        def body6(a):
            levels, sort_keys, ov_dense = a
            def b(carry, _):
                eps = carry * 1e-38
                lv = tuple(
                    tuple((c[0] + eps,) + tuple(c[1:]) for c in level)
                    for level in levels
                )
                ov = (None if ov_dense is None
                      else (ov_dense[0] + eps,) + tuple(ov_dense[1:]))
                occ, rgba = _raystab_query2(
                    lv, sort_keys, ov, n, 0.12, ks6, ovk6, tc, False)
                return (jnp.sum(rgba * 1e-38)
                        + jnp.sum(occ).astype(jnp.float32) * 1e-38), None
            return b

        ks7 = tuple(table_k(c[1]) for c in a7.classes)

        def body7(a):
            classes = a
            def b(carry, _):
                eps = carry * 1e-38
                cls = tuple((c[0] + eps,) + tuple(c[1:]) for c in classes)
                occ, rgba = _raystab_query7(
                    cls, n, a7.tile, ks7, tc, 0.12, False)
                return (jnp.sum(rgba * 1e-38)
                        + jnp.sum(occ).astype(jnp.float32) * 1e-38), None
            return b

        s6 = slope(body6, (a6.levels, a6.sort_keys, a6.ov_dense))
        del a6
        s7 = slope(body7, a7.classes)
        print(f"n={n}: query gen6 {s6*1e3:.3f} ms  gen7 {s7*1e3:.3f} ms "
              f"({s6/max(s7,1e-12):.2f}x)", flush=True)
        del a7, c7


if __name__ == "__main__":
    main()
