#!/bin/sh
# TuringBowl scene launcher with its posScale
# (reference: Bin/TuringBowl.bat -> "-mesh Assets/TuringBowl.obj 0.0 2.8 0.0 0.03")
exec python -m dxrvoxelizer_tpu.app -mesh TuringBowl.obj 0.0 2.8 0.0 0.03 "$@"
