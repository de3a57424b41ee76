"""Steady-state big-scene frame timings (subdivided bunny, real TPU).

Midpoint-subdivides bunny.json's mesh (surface unchanged) to reach the
large-triangle regimes (16k/64k/256k/1M) and times the steady frame with
the measurement discipline from docs/performance.md: perturb a traced
input each iteration (the dev tunnel serves repeated identical
executions from a result cache) and end every timing with a small
device_get (block_until_ready can return early through the tunnel).

Usage:
    python -m benchmarks.bigscene [--levels 4] [--width 960] [--height 540]
                                  [--bounces 5] [--iters 3]

levels = midpoint-subdivision rounds (each multiplies triangles 4x):
4 -> 256,000 triangles, 5 -> 1,024,000.
"""

import argparse
import dataclasses
import json
import os
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from cutrace_tpu.render.renderer import prepare, render
    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.mesh_io import subdivide
    from cutrace_tpu.utils.profiling import casts_per_pixel

    sc = load_scene(os.path.join(REPO, "scenes", "bunny.json"))
    sc.camera.width, sc.camera.height = args.width, args.height
    n_tris = 0
    for ob in sc.objects:
        if type(ob).__name__ == "Mesh":
            ob.vertices = subdivide(ob.vertices, args.levels)
            n_tris += ob.vertices.shape[0]
    prepared = prepare(sc, accel="auto")
    total_casts = (args.width * args.height
                   * casts_per_pixel(prepared.soa, args.bounces))

    t0 = time.perf_counter()
    out = render(prepared, bounces=args.bounces)
    np.asarray(out[1][0, :8])
    compile_s = time.perf_counter() - t0

    times = []
    for k in range(args.iters):
        soa_k = dataclasses.replace(
            prepared.soa, ambient=prepared.soa.ambient + 1e-9 * (k + 1)
        )
        prep_k = dataclasses.replace(prepared, soa=soa_k)
        t0 = time.perf_counter()
        out = render(prep_k, bounces=args.bounces)
        np.asarray(out[1][0, :8])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    row = {
        "triangles": int(n_tris),
        "size": f"{args.width}x{args.height}",
        "bounces": args.bounces,
        "frame_s": round(dt, 4),
        "mcasts_per_s": round(total_casts / dt / 1e6, 1),
        "first_call_s": round(compile_s, 1),
        "ablate": os.environ.get("CUTRACE_ABLATE", ""),
    }
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
