"""TPU profile: where do the -hq 256^3 render milliseconds go?

Splits render_1080p_grid256_hq (~9.7 ms r5) into the reference-step
light field (light_sweep_ref) vs the z-supersampled shear-warp (ss=2)
vs the ss=1 warp, all slope-timed.

Run: python scripts/profile_hq256.py
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

from dxrvoxelizer_tpu.models.camera import OrbitCamera  # noqa: E402
from dxrvoxelizer_tpu.models.scene import Scene  # noqa: E402
from dxrvoxelizer_tpu.ops.packing import unpack_bits_z  # noqa: E402
from dxrvoxelizer_tpu.ops.raymarch_warp import (  # noqa: E402
    _shearwarp_core,
    _tex_params,
    light_ref_statics,
    light_sweep,
    light_sweep_ref,
)
from dxrvoxelizer_tpu.ops.voxelize_queue import (  # noqa: E402
    build_queue,
    voxelize_parity_queue_run,
)
from dxrvoxelizer_tpu.utils.config import VoxelizerConfig  # noqa: E402


def slope(body_of_args, args, r_pair=(10, 40), reps=3):
    ra, rb = r_pair

    def make(r):
        @jax.jit
        def run(a):
            out, _ = jax.lax.scan(body_of_args(a), jnp.float32(0.0), None,
                                  length=r)
            return out
        return lambda: run(args)

    fa, fb = make(ra), make(rb)
    float(fa()); float(fb())

    def best(f):
        b = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); float(f())
            b = min(b, time.perf_counter() - t0)
        return b

    return min((best(fb) - best(fa)) / (rb - ra),
               (best(fb) - best(fa)) / (rb - ra))


def main():
    n = 256
    cfg = VoxelizerConfig(mesh="dragon.obj", grid_size=n, width=1920,
                          height=1080)
    scene = Scene.load(cfg)
    verts, tris = scene.buffers.positions_norm, scene.buffers.tris
    coefs, ct, cf, cl, _ = build_queue(verts, tris, n, k_chunk=64)
    words = voxelize_parity_queue_run(
        coefs, np.asarray(ct), np.asarray(cf), np.asarray(cl), n,
        k_chunk=64)
    density = unpack_bits_z(words, n).astype(jnp.float32)
    cam = OrbitCamera(cfg.width, cfg.height)
    fc = scene.update_frame(cam.eye, cam.view_proj, cfg.width, cfg.height)
    light_np = fc.local_space_light_pt
    from dxrvoxelizer_tpu.ops.raymarch_ref import TEX_SCALE

    ld = np.asarray(TEX_SCALE) * (light_np / np.linalg.norm(light_np))
    l_axis = int(np.argmax(np.abs(ld)))
    l_flip = bool(ld[l_axis] < 0)
    lr_axis, lr_flip, lr_d0 = light_ref_statics(light_np, n)
    print(f"d0={lr_d0}", flush=True)
    axis, flip, swap = _tex_params(
        fc.local_space_eye_pt, fc.screen_to_local, cfg.width, cfg.height)
    s2l = jnp.asarray(fc.screen_to_local)
    eye = jnp.asarray(fc.local_space_eye_pt)
    clear = jnp.asarray(np.array(cfg.clear_color, np.float32))
    lvf = light_sweep(density, jnp.asarray(light_np), n, l_axis, l_flip)
    lvr = light_sweep_ref(density, jnp.asarray(light_np), n, lr_axis,
                          lr_flip, lr_d0)

    def body_lsr(a):
        d, = a
        def b(carry, _):
            lv = light_sweep_ref(d + carry * 1e-38,
                                 jnp.asarray(light_np), n, lr_axis,
                                 lr_flip, lr_d0)
            return jnp.sum(lv * 1e-38), None
        return b

    def body_lsf(a):
        d, = a
        def b(carry, _):
            lv = light_sweep(d + carry * 1e-38, jnp.asarray(light_np), n,
                             l_axis, l_flip)
            return jnp.sum(lv * 1e-38), None
        return b

    def body_warp(ss):
        def of_args(a):
            d, lv = a
            def b(carry, _):
                img = _shearwarp_core(
                    d + carry * 1e-38, lv, s2l, eye, clear, n, 128,
                    cfg.width, cfg.height, axis, flip, swap, True, ss=ss)
                return img[0, 0, 0], None
            return b
        return of_args

    s = slope(body_lsf, (density,))
    print(f"light_sweep (recurrence): {s*1e3:.3f} ms", flush=True)
    s = slope(body_lsr, (density,))
    print(f"light_sweep_ref (blocked): {s*1e3:.3f} ms", flush=True)
    s = slope(body_warp(1), (density, lvf))
    print(f"shearwarp ss=1: {s*1e3:.3f} ms", flush=True)
    s = slope(body_warp(2), (density, lvr))
    print(f"shearwarp ss=2: {s*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
