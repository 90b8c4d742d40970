#!/bin/sh
# Dragon scene launcher (reference: Bin/Dragon.bat -> "-mesh Assets/dragon.obj")
exec python -m dxrvoxelizer_tpu.app -mesh dragon.obj "$@"
