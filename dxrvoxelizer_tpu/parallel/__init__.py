from dxrvoxelizer_tpu.parallel.mesh import make_device_mesh  # noqa: F401
from dxrvoxelizer_tpu.parallel.shard import sharded_frame  # noqa: F401
