"""Core (explicit) API tier.

Mirrors the reference's explicit DX12-style path (``Voxelizer``,
Content/Voxelizer.{h,cpp}): the caller owns buffers and frame slots and
invokes each pass explicitly. The ergonomic tier wrapping this is
``dxrvoxelizer_tpu.ez`` (the ``VoxelizerEZ`` analog) — both tiers drive the
same kernels, and the app can A/B them at runtime like the reference's ``X``
key (DXRVoxelizer.cpp:295-297).
"""

from dxrvoxelizer_tpu.core.pipeline import (  # noqa: F401
    FRAME_COUNT,
    FramePipeline,
    VoxelGrid,
    render,
    voxelize,
)
