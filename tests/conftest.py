"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; we exercise all pjit/shard_map
code paths on the CPU backend with XLA's forced host device count (SURVEY.md
section 4 "multi-chip without a real cluster").
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_assets_available():
    from dxrvoxelizer_tpu.utils.assets import find_asset

    try:
        find_asset("bunny.obj")
        return True
    except FileNotFoundError:
        pytest.skip("canonical OBJ assets not available")
