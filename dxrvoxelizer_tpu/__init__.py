"""dxrvoxelizer_tpu — TPU-native real-time solid voxelization engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of StarsX/DXRVoxelizer
(reference: /root/reference): load a Wavefront-OBJ mesh, solid-voxelize it every
frame into a dense 3D occupancy grid, and volume-ray-march that grid to screen.

Two API tiers, mirroring the reference's Core (explicit DX12-style) and EZ
(ergonomic DX11-style) paths (reference: DXRVoxelizer/Content/Voxelizer.cpp and
VoxelizerEZ.cpp):

- ``dxrvoxelizer_tpu.core`` — explicit pipeline: you own device buffers, pass
  configs, and call jitted pass functions.
- ``dxrvoxelizer_tpu.ez``   — stateful ``Engine`` that wires everything for you.

Subpackages:
- ``utils``    — OBJ loader, DirectXMath-convention matrices, timer, image IO.
- ``models``   — mesh / scene / camera state (the "model" of the workload).
- ``ops``      — compute kernels: oracle (jax.numpy) + Pallas TPU kernels for
                 voxelization and volume ray-marching.
- ``parallel`` — jax.sharding Mesh helpers, multi-chip sharded passes,
                 batch data-generation.
- ``app``      — CLI application (same flags as the reference:
                 ``-mesh <file> [x y z scale]``).
"""

__version__ = "0.1.0"

from dxrvoxelizer_tpu.models.scene import Scene  # noqa: F401
from dxrvoxelizer_tpu.models.camera import OrbitCamera  # noqa: F401
from dxrvoxelizer_tpu.utils.config import VoxelizerConfig  # noqa: F401
