from dxrvoxelizer_tpu.utils.objloader import ObjMesh, load_obj  # noqa: F401
from dxrvoxelizer_tpu.utils.assets import find_asset  # noqa: F401
