"""Auxiliary subsystems: profiling, timing, metrics (SURVEY.md §5)."""

from cutrace_tpu.utils.profiling import (  # noqa: F401
    RenderTimings,
    timed_render,
    device_trace,
)
