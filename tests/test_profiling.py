"""Pass-timer / tracing utility tests."""

import jax.numpy as jnp

from dxrvoxelizer_tpu.utils.profiling import PassTimers, pass_scope


def test_pass_timers_aggregate():
    t = PassTimers()
    for _ in range(3):
        with t.measure("voxelize"):
            x = jnp.ones((64, 64)).sum()
        with t.measure("raycast", result_ref=[x]):
            pass
    s = t.summary()
    assert set(s) == {"voxelize", "raycast"}
    assert t.counts["voxelize"] == 3
    assert all(v >= 0 for v in s.values())
    t.reset()
    assert not t.summary()


def test_pass_scope_composes_with_jit():
    import jax

    @jax.jit
    def f(x):
        with pass_scope("scoped"):
            return x * 2

    assert float(f(jnp.float32(3.0))) == 6.0
