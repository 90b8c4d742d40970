import sys

from dxrvoxelizer_tpu.app.main import main

sys.exit(main(sys.argv[1:]))
