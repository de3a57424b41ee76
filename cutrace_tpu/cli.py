"""Command-line renderer — the reference's main() (/root/reference/main.cu).

`python -m cutrace_tpu <scene.json>` reproduces the CLI contract:

  no argument          -> usage on stderr, exit 255  (main.cu:9-12, -1)
  scene fails to load  -> full schema dump, exit 254 (main.cu:16-19, -2)
  success              -> scene dump (kernel.hpp:150-166 format), render
                          with bounces=5 / fudge=1e-3 (main.cu:30), timing
                          line (main.cu:32), and frame.jpg / depth_map.jpg /
                          normal_map.jpg in the output directory
                          (main.cu:34-36)

(the reference returns -1/-2 from main(), which a POSIX shell observes as
255/254 — we exit with the observed codes).

Extra flags beyond the reference (all optional, default to parity):
  --out DIR      output directory (reference: CWD)
  --bounces N    bounce depth (reference pins 5)
  --width/--height  override the scene camera resolution
  --strict       reject legacy schema aliases ("model", "position")
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from cutrace_tpu.scene import schema as S
from cutrace_tpu.scene import types as T
from cutrace_tpu.scene.loader import load_file


def dump_scene(scene: T.Scene, file=sys.stdout) -> None:
    """Scene summary in the reference's dump_scene_kernel format
    (kernel.hpp:150-166): per element, its type index within its kind's
    schema list (the gpu_variant type index in the reference)."""
    obj_kind = {T.Triangle: 0, T.Mesh: 1, T.Plane: 2, T.Sphere: 3}
    light_kind = {T.Sun: 0, T.PointLight: 1}

    print(f" -> Have {len(scene.objects):<4} objects:", file=file)
    for i, o in enumerate(scene.objects):
        print(
            f"  -> Object   #{i:<4} has type #{obj_kind[type(o)]:<2}",
            file=file,
        )
    print(f" -> Have {len(scene.lights):<4} lights:", file=file)
    for i, l in enumerate(scene.lights):
        print(
            f"  -> Light    #{i:<4} has type #{light_kind[type(l)]:<2}",
            file=file,
        )
    print(f" -> Have {len(scene.materials):<4} materials:", file=file)
    for i, _ in enumerate(scene.materials):
        print(f"  -> Material #{i:<4} has type #0 ", file=file)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="cutrace_tpu", add_help=True, description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("scene", nargs="?", help="scene JSON file")
    parser.add_argument("--out", default=".", help="output directory")
    parser.add_argument("--bounces", type=int, default=5)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--strict", action="store_true",
                        help="reject legacy schema aliases")
    parser.add_argument("--accel", default="auto",
                        choices=("auto", "none", "clusters", "pallas",
                                 "fused"),
                        help="triangle acceleration structure (default: "
                        "auto — fused whole-pipeline Pallas kernel on TPU)")
    parser.add_argument("--platform", default=None,
                        help="force a JAX platform (e.g. cpu, tpu); the "
                        "preinstalled TPU plugin ignores JAX_PLATFORMS, so "
                        "an explicit knob is needed for CPU runs")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.scene is None:
        print(f"Usage: {parser.prog} <scene file>", file=sys.stderr)
        return 255  # main.cu:11 returns -1

    result = load_file(args.scene, compat=not args.strict)
    if not result.ok:
        S.dump_schema(file=sys.stdout)
        return 254  # main.cu:18 returns -2

    scene = result.scene
    if args.width:
        scene.camera.width = args.width
    if args.height:
        scene.camera.height = args.height

    dump_scene(scene)

    # Import lazily so --help / load errors don't pay for a JAX backend.
    import jax

    # Persistent compile cache: renders of the same scene shape are
    # compile-free after the first run (XLA compilation dominates small
    # renders; the reference has no such cost, nvcc pays it at build time).
    import os

    cache_dir = os.environ.get(
        "CUTRACE_CACHE", os.path.expanduser("~/.cache/cutrace_tpu")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob

    from cutrace_tpu.io import images
    from cutrace_tpu.render.renderer import prepare, render

    total_start = time.perf_counter()
    prepared = prepare(scene, accel=args.accel)
    # Warmup render: XLA compilation happens here (the reference pays its
    # compile at nvcc build time, so its render_ms is kernel-only,
    # kernel.hpp:105-108 — time only the post-compile run for parity).
    # The persistent compile cache makes this near-free on later runs.
    compile_start = time.perf_counter()
    color, depth, normal = render(prepared, bounces=args.bounces, fudge=1e-3)
    color = np.asarray(color)  # device_get forces real completion
    compile_ms = (time.perf_counter() - compile_start) * 1000.0

    # Timing run with a perturbed traced input: the dev tunnel serves a
    # repeat of an identical (executable, args) execution from a result
    # cache and its block_until_ready can return early, so the honest
    # render_ms comes from a distinct execution ended by a small
    # device_get (docs/performance.md "Measurement discipline"). The
    # 1e-9-ambient image is discarded; outputs come from the run above.
    import dataclasses

    soa_t = dataclasses.replace(
        prepared.soa, ambient=prepared.soa.ambient + 1e-9
    )
    prep_t = dataclasses.replace(prepared, soa=soa_t)
    render_start = time.perf_counter()
    out_t = render(prep_t, bounces=args.bounces, fudge=1e-3)
    np.asarray(out_t[1][0, :8])
    render_ms = (time.perf_counter() - render_start) * 1000.0

    depth = np.asarray(depth)
    normal = np.asarray(normal)
    max_d = images.max_finite_depth(depth)
    total_ms = (
        (time.perf_counter() - total_start) * 1000.0 - compile_ms
    )
    print(f"Compile/warmup time was {compile_ms:.0f} ms (excluded below).")

    # main.cu:32 wording (kernel-only vs with setup/teardown)
    print(
        f"Render time was {render_ms:.0f} ms; kernel time with "
        f"setup/teardown was {total_ms:.0f} ms."
    )

    out = args.out.rstrip("/") or "."
    os.makedirs(out, exist_ok=True)
    images.write_depth_map(f"{out}/depth_map.jpg", depth, max_d)
    images.write_normal_map(f"{out}/normal_map.jpg", normal)
    images.write_colorized(f"{out}/frame.jpg", color)
    return 0


if __name__ == "__main__":
    sys.exit(main())
