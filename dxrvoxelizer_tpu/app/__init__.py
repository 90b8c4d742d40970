from dxrvoxelizer_tpu.app.main import main  # noqa: F401
