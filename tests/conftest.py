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


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Release live compiled executables between test modules.

    XLA:CPU's JIT segfaults sequence-dependently once enough distinct
    executables accumulate in one process (reproduced: test_raystab2.py's
    29 tests followed by test_accel_cache.py crash inside
    backend_compile_and_load on the 31st test; every module passes in
    isolation, 128 GB RAM free, serialized LLVM codegen does not help).
    Dropping the live-executable caches at module boundaries keeps the
    resident JIT state bounded; within a module jits still share."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def reference_assets_available():
    from dxrvoxelizer_tpu.utils.assets import find_asset

    try:
        find_asset("bunny.obj")
        return True
    except FileNotFoundError:
        pytest.skip("canonical OBJ assets not available")
