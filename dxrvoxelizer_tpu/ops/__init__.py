from dxrvoxelizer_tpu.ops.voxelize_ref import (  # noqa: F401
    voxelize_parity_ref,
    voxelize_raystab_ref,
)
