"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; we exercise all pjit/shard_map
code paths on the CPU backend with XLA's forced host device count (SURVEY.md
section 4 "multi-chip without a real cluster").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache across test processes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment's TPU-tunnel plugin force-selects its own platform from
# sitecustomize at interpreter start; override after import so tests run on
# the local CPU backend with the 8 virtual devices
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_assets_available():
    from dxrvoxelizer_tpu.utils.assets import find_asset

    try:
        find_asset("bunny.obj")
        return True
    except FileNotFoundError:
        pytest.skip("canonical OBJ assets not available")
