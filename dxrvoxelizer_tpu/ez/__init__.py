"""EZ (ergonomic) API tier — the ``VoxelizerEZ`` analog.

The reference ships the same workload twice: an explicit path and a
DX11-style "EZ" path with automatic layouts/barriers, switchable at runtime
(Content/VoxelizerEZ.{h,cpp}; DXRVoxelizer.cpp:295-297). This module is the
ergonomic tier over ``dxrvoxelizer_tpu.core``: an ``Engine`` with the same
three-entry surface as the reference renderer classes —
``init / update_frame / render``.
"""

from dxrvoxelizer_tpu.ez.engine import Engine  # noqa: F401
