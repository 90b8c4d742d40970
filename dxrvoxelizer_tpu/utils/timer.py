"""Frame timer — behavioral port of the reference's StepTimer.

Reference: DXRVoxelizer/Common/StepTimer.h:15-183 (QPC-based variable/fixed
timestep, FPS counter, 1-second frame-stats cadence used by
CalculateFrameStats, DXRVoxelizer.cpp:553-584).
"""

from __future__ import annotations

import time


class StepTimer:
    TICKS_PER_SECOND = 10_000_000  # StepTimer.h:63

    def __init__(self):
        self._last = time.perf_counter()
        self._elapsed = 0.0
        self._total = 0.0
        self.frame_count = 0
        self._fps_frames = 0
        self._fps_time = 0.0
        self.frames_per_second = 0.0
        # clamp huge gaps (e.g. paused in a debugger), StepTimer.h:130-133
        self.max_delta_seconds = 1.0

    def reset_elapsed_time(self):
        self._last = time.perf_counter()
        self._fps_frames = 0
        self._fps_time = 0.0

    def tick(self):
        now = time.perf_counter()
        delta = min(now - self._last, self.max_delta_seconds)
        self._last = now
        self._elapsed = delta
        self._total += delta
        self.frame_count += 1
        self._fps_frames += 1
        self._fps_time += delta
        if self._fps_time >= 1.0:  # 1 Hz stats (StepTimer.h:154-160)
            self.frames_per_second = self._fps_frames / self._fps_time
            self._fps_frames = 0
            self._fps_time = 0.0

    @property
    def elapsed_seconds(self) -> float:
        return self._elapsed

    @property
    def total_seconds(self) -> float:
        return self._total
