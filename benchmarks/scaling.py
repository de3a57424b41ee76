"""Scaling-efficiency benchmark: rays/s vs device count.

BASELINE.md gate: >= 90% rays/s scaling efficiency from 1 chip to N hosts
on bunny.json tile-sharded across a pod slice. This harness measures
throughput on (1, 2, 4, ..., N)-device meshes of whatever backend is
present and reports efficiency relative to linear scaling from 1 device.

On a pod slice, run one process per host after
`cutrace_tpu.parallel.multihost.initialize()`; on this repo's single-chip
dev environment it can only demonstrate the mechanics on the virtual CPU
mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8), where
"efficiency" reflects host-core contention, not ICI.

Usage: python -m benchmarks.scaling [--width 1920 --height 1080 --bounces 5]
Prints one JSON line per mesh size plus a summary.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=str(REPO / "scenes/bunny.json"))
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--bounces", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh (mechanics check)")
    ap.add_argument("--artifact", default=None,
                    help="write a SCALING_r*.json artifact to this path")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cutrace_tpu.parallel import make_mesh, render_sharded
    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.soa import scene_to_soa
    from cutrace_tpu.utils.profiling import casts_per_pixel

    sc = load_scene(args.scene)
    sc.camera.width, sc.camera.height = args.width, args.height
    soa = scene_to_soa(sc)
    n_px = args.width * args.height
    cpp = casts_per_pixel(soa, args.bounces)

    n_dev = jax.device_count()
    sizes = []
    k = 1
    while k <= n_dev:
        sizes.append(k)
        k *= 2
    if sizes[-1] != n_dev:
        sizes.append(n_dev)

    # --- work invariance (compiler-reported, contention-free) ---------
    # Wall clock on a virtual CPU mesh measures host-core contention, not
    # scaling (all N "devices" share the same physical cores). The
    # compiled per-device program is contention-free evidence: with
    # pixels sharded and the scene replicated, each device's compiled
    # FLOPs must be ~total/N (communication-free forward — also machine-
    # checked by tests/test_hlo.py). invariance = total_flops_1 /
    # (per_device_flops_N * N); 1.0 = perfectly even division of work.
    from cutrace_tpu.parallel.sharding import _render_sharded_jit, shard_scene

    invariance_rows = []
    flops1 = None
    for n in sizes:
        mesh = make_mesh(n, 1, devices=jax.devices()[:n])
        ssoa = shard_scene(soa, mesh)
        compiled = _render_sharded_jit.lower(
            ssoa, mesh, 1e-3, args.bounces, None
        ).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        if flops1 is None:
            flops1 = flops
        row = {
            "devices": n,
            "per_device_gflops": round(flops / 1e9, 4),
            "work_invariance": round(flops1 / (flops * n), 4),
        }
        invariance_rows.append(row)
        print(json.dumps(row))

    base = None
    results = []
    for n in sizes:
        mesh = make_mesh(n, 1, devices=jax.devices()[:n])
        out = render_sharded(soa, mesh, bounces=args.bounces)
        jax.block_until_ready(out)  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(render_sharded(soa, mesh, bounces=args.bounces))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        mcasts = n_px * cpp / dt / 1e6
        if base is None:
            base = mcasts
        eff = mcasts / (base * n)
        results.append((n, mcasts, eff))
        print(json.dumps({
            "devices": n,
            "mcasts_per_s": round(mcasts, 2),
            "efficiency_vs_linear": round(eff, 3),
        }))

    n, mcasts, eff = results[-1]
    print(json.dumps({
        "summary": f"{sizes[0]}->{n} devices",
        "speedup": round(mcasts / base, 2),
        "scaling_efficiency": round(eff, 3),
    }))

    if args.artifact:
        artifact = {
            "note": (
                "Multi-chip TPU hardware is unavailable here (one v5e via "
                "tunnel). The CONTENDED wall clock below measures N virtual "
                "CPU devices sharing the host's physical cores — NOT ICI "
                "scaling. The contention-free evidence is (a) "
                "work_invariance: compiled per-device FLOPs = total/N "
                "(even pixel split, scene replicated), and (b) "
                "tests/test_hlo.py: the compiled sharded forward contains "
                "ZERO collective ops and the train step only parameter-"
                "sized psums — the forward moves no bytes between chips, "
                "so per-chip throughput is invariant in N by construction."
            ),
            "config": {
                "scene": pathlib.Path(args.scene).name,
                "width": args.width, "height": args.height,
                "bounces": args.bounces,
            },
            "work_invariance": invariance_rows,
            "contended_wall_clock": [
                {"devices": nn, "mcasts_per_s": round(mm, 2),
                 "efficiency_vs_linear": round(ee, 3)}
                for nn, mm, ee in results
            ],
        }
        pathlib.Path(args.artifact).write_text(
            json.dumps(artifact, indent=1) + "\n"
        )
        print(f"wrote {args.artifact}")


if __name__ == "__main__":
    main()
