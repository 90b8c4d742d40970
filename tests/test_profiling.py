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


def test_step_timer_fixed_timestep_catchup():
    """Fixed-timestep mode (StepTimer.h:104-133): updates fire once per
    whole target interval with catch-up, and leftover time carries over."""
    import time as _time

    from dxrvoxelizer_tpu.utils.timer import StepTimer

    t = StepTimer()
    t.is_fixed_time_step = True
    t.target_elapsed_seconds = 0.01
    calls = []
    # simulate a 35 ms gap: expect 3 updates (30 ms) + 5 ms leftover
    t._last = _time.perf_counter() - 0.035
    t.tick(lambda: calls.append(1))
    assert len(calls) == 3, calls
    assert abs(t._leftover - 0.005) < 2e-3
    assert t.frame_count == 3
    assert abs(t.elapsed_seconds - 0.01) < 1e-9
    assert abs(t.total_seconds - 0.03) < 1e-9

    # a delta within 1/4 ms of the target snaps exactly to the target
    t2 = StepTimer()
    t2.is_fixed_time_step = True
    t2.target_elapsed_seconds = 0.01
    t2._last = _time.perf_counter() - 0.0101
    t2.tick()
    assert t2._leftover == 0.0
    assert t2.frame_count == 1


def test_step_timer_variable_mode_unchanged():
    import time as _time

    from dxrvoxelizer_tpu.utils.timer import StepTimer

    t = StepTimer()
    t._last = _time.perf_counter() - 0.02
    t.tick()
    assert t.frame_count == 1
    assert t.elapsed_seconds >= 0.02
