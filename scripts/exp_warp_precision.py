"""Experiment: warp2d matmul precision vs -hq render cost and image
error (the ss=2 supersampled warp is ~7.9 of the 9.7 ms -hq 256^3
frame; warp2d runs precision="highest" = 6-pass bf16).

For each precision: slope-time the ss=2 render and compare the u8 image
against the "highest" reference. Run: python scripts/exp_warp_precision.py
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
from dxrvoxelizer_tpu.ops import raymarch_warp as rw  # noqa: E402
from dxrvoxelizer_tpu.ops.packing import unpack_bits_z  # noqa: E402
from dxrvoxelizer_tpu.ops.voxelize_queue import (  # noqa: E402
    build_queue,
    voxelize_parity_queue_run,
)
from dxrvoxelizer_tpu.utils.config import VoxelizerConfig  # noqa: E402


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
    lr_axis, lr_flip, lr_d0 = rw.light_ref_statics(light_np, n)
    lvr = rw.light_sweep_ref(density, jnp.asarray(light_np), n, lr_axis,
                             lr_flip, lr_d0)
    axis, flip, swap = rw._tex_params(
        fc.local_space_eye_pt, fc.screen_to_local, cfg.width, cfg.height)
    s2l = jnp.asarray(fc.screen_to_local)
    eye = jnp.asarray(fc.local_space_eye_pt)
    clear = jnp.asarray(np.array(cfg.clear_color, np.float32))

    def render():
        return rw._shearwarp_core(
            density, lvr, s2l, eye, clear, n, 128, cfg.width, cfg.height,
            axis, flip, swap, True, ss=2)

    def slope(r_pair=(10, 40), reps=3):
        ra, rb = r_pair

        def make(r):
            @jax.jit
            def run(a):
                d, lv = a

                def body(carry, _):
                    img = rw._shearwarp_core(
                        d + carry * 1e-38, lv, s2l, eye, clear, n, 128,
                        cfg.width, cfg.height, axis, flip, swap, True,
                        ss=2)
                    return img[0, 0, 0], None

                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=r)
                return out
            return lambda: run((density, lvr))

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

    def patched_warp2d(prec):
        def w2(images, wx, wy):
            t = jnp.einsum("kmn,kny->kmy", wx, images, precision=prec)
            return jnp.einsum("kmy,kpy->kmp", t, wy, precision=prec)
        return w2

    ref_u8 = None
    orig = rw.warp2d
    for prec in ("highest", "high", "default"):
        rw.warp2d = orig if prec == "highest" else patched_warp2d(prec)
        jax.clear_caches()
        img = np.asarray(render())
        u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
        if ref_u8 is None:
            ref_u8 = u8
        err = np.abs(u8.astype(np.int32) - ref_u8.astype(np.int32))
        s = slope()
        print(f"precision={prec}: ss=2 render {s*1e3:.3f} ms; u8 err "
              f"mean={err.mean():.3f} p99={np.percentile(err, 99):.0f} "
              f"max={err.max()}", flush=True)
    rw.warp2d = orig


if __name__ == "__main__":
    main()
