from dxrvoxelizer_tpu.parallel.mesh import make_device_mesh  # noqa: F401
from dxrvoxelizer_tpu.parallel.queue_shard import (  # noqa: F401
    voxelize_parity_multichip,
)
from dxrvoxelizer_tpu.parallel.shard import sharded_frame  # noqa: F401
