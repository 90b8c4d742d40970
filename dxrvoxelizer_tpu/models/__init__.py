from dxrvoxelizer_tpu.models.mesh import MeshBuffers  # noqa: F401
from dxrvoxelizer_tpu.models.scene import Scene  # noqa: F401
from dxrvoxelizer_tpu.models.camera import OrbitCamera  # noqa: F401
