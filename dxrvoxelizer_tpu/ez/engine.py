"""Stateful engine with the reference renderer-class surface.

Reference: ``VoxelizerEZ::{Init, UpdateFrame, Render}``
(Content/VoxelizerEZ.h:17-23). ``Engine`` wires scene loading, per-frame
constants, voxelize and ray-march; per-frame state is slot-indexed like the
reference's triple-buffered CBV/grid sets (VoxelizerEZ.cpp per-frame
resources).
"""

from __future__ import annotations

import jax
import numpy as np

from dxrvoxelizer_tpu.core.pipeline import (
    FRAME_COUNT,
    FramePipeline,
    VoxelGrid,
    render,
    voxelize,
)
from dxrvoxelizer_tpu.models.scene import FrameConstants, Scene
from dxrvoxelizer_tpu.utils.config import VoxelizerConfig


class Engine:
    """Load once, then per frame: ``update_frame`` + ``render``."""

    def __init__(self, cfg: VoxelizerConfig, scene: Scene | None = None,
                 vox_impl: str = "auto", render_impl: str = "warp",
                 deforming: bool = False, chips: int = 0):
        self.cfg = cfg
        self.scene = scene if scene is not None else Scene.load(cfg)
        if chips > 1:
            # scale-out: the whole frame as one shard_map program over a
            # device mesh (parallel/pipeline.py)
            from dxrvoxelizer_tpu.parallel import ShardedFramePipeline

            self.pipeline = ShardedFramePipeline(
                cfg, self.scene.buffers, chips, vox_impl=vox_impl,
                render_impl=render_impl, deforming=deforming,
            )
        else:
            self.pipeline = FramePipeline(
                cfg, self.scene.buffers, vox_impl=vox_impl,
                render_impl=render_impl, deforming=deforming,
            )
        self._consts: list[FrameConstants | None] = [None] * FRAME_COUNT
        self.last_grid: VoxelGrid | None = None
        # the reference keeps TWO complete independent pipelines alive and
        # the X key swaps voxelize AND render between them
        # (DXRVoxelizer.cpp:190-199, 295-297, 420-481). The alternate here
        # is an independent implementation of both passes: the jnp oracle
        # voxelizer + the gather ray-marcher. Built lazily on first switch.
        self.use_alt = False
        self._pipeline_alt: FramePipeline | None = None

    @property
    def pipeline_alt(self) -> FramePipeline:
        """The alternate (oracle voxelize + gather render) pipeline."""
        if self._pipeline_alt is None:
            self._pipeline_alt = FramePipeline(
                self.cfg, self.pipeline.mesh, vox_impl="xla",
                render_impl="gather",
            )
        return self._pipeline_alt

    def toggle_path(self) -> bool:
        """X-key analog: swap the ACTIVE pipeline (voxelize + render).

        Returns True when the alternate pipeline is now active.
        """
        self.use_alt = not self.use_alt
        return self.use_alt

    # -- reference surface ---------------------------------------------------
    def update_frame(self, frame_index: int, eye_pt, view_proj) -> None:
        """Voxelizer::UpdateFrame analog (Content/Voxelizer.cpp:81-106)."""
        self._consts[frame_index % FRAME_COUNT] = self.scene.update_frame(
            np.asarray(eye_pt, dtype=np.float32),
            np.asarray(view_proj, dtype=np.float32),
            self.cfg.width,
            self.cfg.height,
        )

    def render(self, frame_index: int) -> jax.Array:
        """Voxelizer::Render analog: voxelize + ray-cast one frame."""
        consts = self._consts[frame_index % FRAME_COUNT]
        if consts is None:
            raise RuntimeError("update_frame must be called before render")
        if self.use_alt:
            alt = self.pipeline_alt
            alt.mesh = self.pipeline.mesh  # track deforming-geometry swaps
            return alt.frame(consts)
        return self.pipeline.frame(consts)

    # -- conveniences --------------------------------------------------------
    def voxelize_only(self) -> VoxelGrid:
        grid = voxelize(
            self.scene.buffers, self.cfg.grid_size, mode=self.cfg.inside_mode,
            impl=self.pipeline.vox_impl,
        )
        self.last_grid = grid
        return grid

    def render_grid(self, grid: VoxelGrid, consts: FrameConstants) -> jax.Array:
        return render(grid, consts, self.cfg, impl=self.pipeline.render_impl)

    def sync(self) -> None:
        self.pipeline.sync()
        if self._pipeline_alt is not None:
            self._pipeline_alt.sync()
