"""Timing, throughput metrics, and device profiling.

The reference's only instrumentation is a wall-clock pair — kernel-only
`render_ms` and `total_ms` including buffer setup/teardown
(/root/reference/inc/kernel.hpp:88,105-108,126-129, printed main.cu:32).
This module provides the TPU-native equivalent (perf_counter around
block_until_ready) plus what SURVEY.md §5 prescribes beyond it: a derived
rays/s metric from the compiled cast structure, and a jax.profiler wrapper
for real device traces (the tunnel's host-side dispatch latency makes
wall-clock micro-benchmarks unreliable; device traces are ground truth).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Tuple

import jax


@dataclasses.dataclass
class RenderTimings:
    """Render timing + throughput (the reference's render_ms/total_ms pair,
    kernel.hpp:128-129, plus derived cast throughput)."""

    render_ms: float  # device render time (around block_until_ready)
    total_ms: float  # incl. scene prep / host conversion
    width: int = 0
    height: int = 0
    casts_per_pixel: int = 0

    @property
    def total_casts(self) -> int:
        return self.width * self.height * self.casts_per_pixel

    @property
    def mcasts_per_s(self) -> float:
        return self.total_casts / max(self.render_ms, 1e-9) / 1e3

    @property
    def primary_mrays_per_s(self) -> float:
        return self.width * self.height / max(self.render_ms, 1e-9) / 1e3

    def __str__(self) -> str:
        return (
            f"Render time was {self.render_ms:.0f} ms; kernel time with "
            f"setup/teardown was {self.total_ms:.0f} ms "
            f"({self.mcasts_per_s:.1f} Mcasts/s)"
        )


def casts_per_pixel(soa, bounces: int) -> int:
    """Nearest-hit scene queries per pixel for the compiled bounce tree:
    nodes * (1 + n_lights * shadow_steps), where the node count follows
    the static branch pruning in render/shading.py."""
    if soa.any_reflective and soa.any_transparent:
        nodes = 2 ** (bounces + 1) - 1
    elif soa.any_reflective or soa.any_transparent:
        nodes = bounces + 1
    else:
        nodes = 1
    return nodes * (1 + soa.n_lights * soa.shadow_steps)


def timed_render(
    prepared_or_scene, bounces: int = 5, fudge: float = 1e-3, warmup: bool = True
) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array], RenderTimings]:
    """render() with the reference's timing discipline: compile/warmup
    excluded (the reference pays nvcc at build time), then one timed run."""
    from cutrace_tpu.render.renderer import PreparedScene, prepare, render

    total_start = time.perf_counter()
    prepared = (
        prepared_or_scene
        if isinstance(prepared_or_scene, PreparedScene)
        else prepare(prepared_or_scene)
    )
    if warmup:
        jax.block_until_ready(render(prepared, bounces=bounces, fudge=fudge))
    render_start = time.perf_counter()
    out = render(prepared, bounces=bounces, fudge=fudge)
    jax.block_until_ready(out)
    end = time.perf_counter()
    soa = prepared.soa
    timings = RenderTimings(
        render_ms=(end - render_start) * 1000.0,
        total_ms=(end - total_start) * 1000.0,
        width=soa.width,
        height=soa.height,
        casts_per_pixel=casts_per_pixel(soa, bounces),
    )
    return out, timings


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/cutrace_trace"):
    """jax.profiler trace context. Yields the log dir; afterwards
    `summarize_trace(log_dir)` reports per-op device time."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def summarize_trace(log_dir: str, top: int = 20):
    """Aggregate device-op durations from the newest trace under log_dir.
    Returns [(name, total_ms, count)] sorted by total time."""
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in tr.get("traceEvents", []):
        name = e.get("name", "")
        if e.get("ph") == "X" and "dur" in e and not name.startswith("$"):
            tot[name] += e["dur"]
            cnt[name] += 1
    return [(n, d / 1000.0, cnt[n]) for n, d in tot.most_common(top)]
