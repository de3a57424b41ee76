"""Steady-state 1080p frame timings for the bundled scenes (real TPU).

Measurement discipline (docs/performance.md): perturb a traced input each
iteration (the dev tunnel serves repeated identical executions from a
result cache) and end every timing with a small device_get (the tunnel's
block_until_ready can return early). Each row also reports the DEVICE
total from a jax.profiler trace (`device_s`): sub-0.3 s frames carry
+-20-30 % tunnel wall-clock weather (round-3 bisections), so the trace
total is the citable number for short frames; wall clock stays as the
end-to-end sanity figure. Prints one line per scene plus a JSON summary.
Usage:

    python -m benchmarks.frames [scene ...]   # default: bunny mirror sphere_plane
"""

import dataclasses
import json
import os
import sys
import time

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("CUTRACE_CACHE", os.path.expanduser("~/.cache/cutrace_tpu")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BOUNCES = 5
WIDTH, HEIGHT = 1920, 1080


def time_scene(name, iters=3):
    from cutrace_tpu.render.renderer import prepare, render
    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.utils.profiling import casts_per_pixel

    sc = load_scene(os.path.join(REPO, "scenes", f"{name}.json"))
    sc.camera.width, sc.camera.height = WIDTH, HEIGHT
    prepared = prepare(sc, accel="auto")
    total_casts = WIDTH * HEIGHT * casts_per_pixel(prepared.soa, BOUNCES)

    t0 = time.perf_counter()
    out = render(prepared, bounces=BOUNCES)
    np.asarray(out[1][0, :8])
    compile_s = time.perf_counter() - t0

    times = []
    for k in range(iters):
        soa_k = dataclasses.replace(
            prepared.soa, ambient=prepared.soa.ambient + 1e-9 * (k + 1)
        )
        prep_k = dataclasses.replace(prepared, soa=soa_k)
        t0 = time.perf_counter()
        out = render(prep_k, bounces=BOUNCES)
        np.asarray(out[1][0, :8])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # device-trace total: ground truth for short frames (tunnel wall
    # clocks carry ~25 ms/dispatch floors and +-20-30 % weather)
    import tempfile

    from cutrace_tpu.utils.profiling import device_trace, summarize_trace

    device_s = None
    try:
        with tempfile.TemporaryDirectory() as td:
            with device_trace(td):
                soa_k = dataclasses.replace(
                    prepared.soa, ambient=prepared.soa.ambient + 1e-7
                )
                out = render(dataclasses.replace(prepared, soa=soa_k),
                             bounces=BOUNCES)
                np.asarray(out[1][0, :8])
            tops = summarize_trace(td, top=10)
            # the jit program's own span is the device frame time
            prog = [ms for n, ms, _ in tops
                    if n.startswith("jit_") or n == "1"]
            if prog:
                device_s = round(max(prog) / 1e3, 4)
    except Exception:
        pass
    row = {
        "scene": name,
        "frame_s": round(dt, 4),
        "device_s": device_s,
        "mcasts_per_s": round(total_casts / dt / 1e6, 1),
        "device_mcasts_per_s": (
            round(total_casts / device_s / 1e6, 1) if device_s else None
        ),
        "first_call_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    scenes = sys.argv[1:] or ["bunny", "mirror", "sphere_plane"]
    rows = [time_scene(s) for s in scenes]
    print(json.dumps({"rows": rows}))
