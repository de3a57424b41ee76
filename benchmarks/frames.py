"""Steady-state 1080p frame timings for the bundled scenes (real TPU).

Measurement discipline (docs/performance.md): perturb a traced input each
iteration (the dev tunnel serves repeated identical executions from a
result cache) and end every timing with a small device_get (the tunnel's
block_until_ready can return early). Prints one line per scene plus a
JSON summary. Usage:

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
    row = {
        "scene": name,
        "frame_s": round(dt, 4),
        "mcasts_per_s": round(total_casts / dt / 1e6, 1),
        "first_call_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    scenes = sys.argv[1:] or ["bunny", "mirror", "sphere_plane"]
    rows = [time_scene(s) for s in scenes]
    print(json.dumps({"rows": rows}))
