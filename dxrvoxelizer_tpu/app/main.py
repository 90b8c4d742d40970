"""Application shell: CLI, frame loop, FPS stats, capture sinks.

The reference app (DXRVoxelizer/DXRVoxelizer.cpp) runs an interactive Win32
loop with an orbit camera, 1 Hz FPS stats in the window title
(CalculateFrameStats, :553-584), F11 PNG screenshots (:531-551) and runtime
path switching with X (:295-297). Headless TPU analog:

- same CLI surface (``-mesh <file> [x y z scale]``, ``-warp`` -> CPU backend,
  ``-``/``/`` prefixes accepted, DXRVoxelizer.cpp:363-408) plus explicit
  extensions (``-grid``, ``-width``, ``-height``, ``-frames``, ...);
- a frame loop that orbits the camera (the mouse-drag analog), prints FPS at
  1 Hz, and writes PNG / .npy artifacts.
"""

from __future__ import annotations

import sys

import numpy as np

from dxrvoxelizer_tpu.ez import Engine
from dxrvoxelizer_tpu.models.camera import OrbitCamera
from dxrvoxelizer_tpu.utils.config import VoxelizerConfig, parse_args
from dxrvoxelizer_tpu.utils.image import save_grid_npy, screenshot_name, write_png
from dxrvoxelizer_tpu.utils.timer import StepTimer


def _parse_extras(argv: list[str]) -> dict:
    """TPU-build extension flags (reference-style prefixes)."""
    out = {
        "frames": 8,
        "out": None,
        "save_grid": None,
        "orbit": True,
        "vox_impl": "auto",
        "render_impl": "fast",
    }
    i = 0
    while i < len(argv):
        a = argv[i]
        key = a[1:].lower() if a[:1] in "-/" else ""
        if key == "frames" and i + 1 < len(argv):
            out["frames"] = int(argv[i + 1])
        elif key == "out" and i + 1 < len(argv):
            out["out"] = argv[i + 1]
        elif key == "savegrid" and i + 1 < len(argv):
            out["save_grid"] = argv[i + 1]
        elif key == "noorbit":
            out["orbit"] = False
        elif key == "voximpl" and i + 1 < len(argv):
            out["vox_impl"] = argv[i + 1]
        elif key == "renderimpl" and i + 1 < len(argv):
            out["render_impl"] = argv[i + 1]
        i += 1
    return out


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    cfg = parse_args(argv)
    extras = _parse_extras(argv)

    if cfg.backend == "cpu":
        # the -warp (software adapter) analog (DXRVoxelizer.cpp:392)
        import jax

        jax.config.update("jax_platforms", "cpu")

    engine = Engine(
        cfg,
        vox_impl=extras["vox_impl"],
        render_impl=extras["render_impl"],
    )
    cam = OrbitCamera(cfg.width, cfg.height)
    timer = StepTimer()

    print(
        f"dxrvoxelizer_tpu: {cfg.mesh} "
        f"({engine.scene.buffers.num_triangles} tris) grid={cfg.grid_size}^3 "
        f"{cfg.width}x{cfg.height} mode={cfg.inside_mode} "
        f"vox={extras['vox_impl']} render={extras['render_impl']}"
    )

    img = None
    last_fps = 0.0
    for frame in range(extras["frames"]):
        timer.tick()
        if extras["orbit"] and frame:
            cam.orbit(12.0, 0.0)  # slow yaw, the mouse-drag analog
        engine.update_frame(frame % 3, cam.eye, cam.view_proj)
        img = engine.render(frame % 3)
        if timer.frames_per_second != last_fps:
            last_fps = timer.frames_per_second
            print(f"fps: {last_fps:.1f}")
    engine.sync()

    if img is not None:
        out = extras["out"] or screenshot_name()
        host = np.asarray(img)
        write_png(out, host)
        print(f"wrote {out}")
    if extras["save_grid"]:
        grid = engine.voxelize_only()
        save_grid_npy(extras["save_grid"], np.asarray(grid.occupancy()))
        print(f"wrote {extras['save_grid']}")
    return 0
