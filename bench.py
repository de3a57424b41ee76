"""Benchmark: bunny.json at 1920x1080, bounce depth 5, on the default
backend (one TPU chip under the driver). Prints ONE JSON line.

Metric: million ray casts per second. A "ray cast" is one nearest-hit scene
query (ray_cast.hpp:29-55): per pixel the unrolled bounce tree performs
`nodes * (1 + n_lights * shadow_steps)` casts (primary + shadow marches per
tree node) — 30 casts/pixel for bunny (6-node reflection chain, 4 lights,
opaque scene), 62.2M casts per 1080p frame.

vs_baseline compares against the reference renderer's own headline: the
CUDA reference publishes no numbers (BASELINE.md), so the baseline constant
below is this framework's first recorded TPU measurement (round 1); later
rounds must not regress it.
"""

import json
import os
import time

import jax

# Persistent compile cache: the 1080p bounce-5 program is large, and the
# driver re-runs this benchmark every round.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("CUTRACE_CACHE", os.path.expanduser("~/.cache/cutrace_tpu")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Best recorded TPU v5e measurement (round 2, fused lanes kernel +
# alive-masked culls + t-bound culls): 143.0 Mcasts/s. The dev tunnel's
# wall-clock weather is ~5 % (a cached binary measured 130.8-137.3
# across one day at the previous 137.3 best), surviving even min-of-N
# timing with the result-cache discipline. The no-regression floor is
# the BOTTOM of that band (0.94 x best), so vs_baseline < 1.0 means a
# real regression, not tunnel weather. Update only upward with new bests.
BASELINE_MCASTS_PER_S = 134.0

WIDTH, HEIGHT, BOUNCES = 1920, 1080, 5


def main():
    from cutrace_tpu.render.renderer import prepare, render
    from cutrace_tpu.scene.loader import load_scene

    from cutrace_tpu.utils.profiling import casts_per_pixel

    sc = load_scene("scenes/bunny.json")
    sc.camera.width, sc.camera.height = WIDTH, HEIGHT
    prepared = prepare(sc, accel="auto")

    # casts per pixel from the compiled tree structure (see module docstring)
    total_casts = WIDTH * HEIGHT * casts_per_pixel(prepared.soa, BOUNCES)

    import dataclasses

    import numpy as np

    out = render(prepared, bounces=BOUNCES)
    np.asarray(out[1][0, :8])  # compile + warm up (fetch forces completion)

    # Measurement discipline (docs/performance.md): the dev tunnel serves
    # repeated identical (executable, args) executions from a result cache
    # and its block_until_ready can return before execution — so every
    # iteration perturbs a traced input (distinct execution) and timing
    # ends at a small device_get (forces completion, ~RTT of transfer).
    times = []
    for k in range(5):
        soa_k = dataclasses.replace(
            prepared.soa, ambient=prepared.soa.ambient + 1e-9 * (k + 1)
        )
        prep_k = dataclasses.replace(prepared, soa=soa_k)
        t0 = time.perf_counter()
        out = render(prep_k, bounces=BOUNCES)
        np.asarray(out[1][0, :8])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    mcasts = total_casts / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "bunny_1080p_ray_casts",
                "value": round(mcasts, 3),
                "unit": "Mcasts/s",
                "vs_baseline": round(mcasts / BASELINE_MCASTS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
