"""Multi-chip scale-out (SURVEY.md section 5 "distributed communication
backend"): 1-D device mesh + shard_map frame/voxelize collectives, and the
FramePipeline-compatible product surface (pipeline.ShardedFramePipeline)."""

from dxrvoxelizer_tpu.parallel.mesh import make_device_mesh  # noqa: F401
from dxrvoxelizer_tpu.parallel.pipeline import (  # noqa: F401
    ShardedFramePipeline,
)
from dxrvoxelizer_tpu.parallel.shard import (  # noqa: F401
    sharded_frame,
    sharded_frame_fast,
    sharded_voxelize,
    voxelize_parity_multichip,
)
