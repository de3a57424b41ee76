"""Big-scene example: render a subdivided bunny at any triangle count.

The CUDA reference loads arbitrary-size models through Assimp
(default_schema.hpp:516-545); this framework's analog is bounded by HBM,
not VMEM: up to ~256k triangles the fused whole-pipeline kernel keeps all
cluster tables VMEM-resident, beyond that the SAME kernel streams each
visited cluster's table block from HBM (ops/fused.py hbm_tables — the
round-3 default; the composable culling kernel, ops/pallas_cast.py,
remains the oracle/fallback). Midpoint subdivision is used here to scale
the 1000-triangle bunny to any size without changing the image (the
children tile the parent surface exactly).

    PYTHONPATH=. python examples/big_scene.py --level 4          # 256k triangles
    PYTHONPATH=. python examples/big_scene.py --level 5 --width 480 --height 270

First compile of a new (scene shape, resolution) pair is slow; steady
frames are reported after warmup.
"""

import argparse
import dataclasses
import pathlib
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

import cutrace_tpu  # noqa: F401  (install with: pip install -e .)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=4,
                    help="midpoint subdivisions (tris = 1000 * 4^level)")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--out", default="frame_big.jpg")
    args = ap.parse_args()

    import numpy as np

    from cutrace_tpu import load_scene
    from cutrace_tpu.io import images
    from cutrace_tpu.render.renderer import prepare, render
    from cutrace_tpu.scene.mesh_io import subdivide
    from cutrace_tpu.scene.types import Mesh

    sc = load_scene(str(REPO / "scenes" / "bunny.json"))
    sc.camera.width, sc.camera.height = args.width, args.height
    for obj in sc.objects:
        if isinstance(obj, Mesh):
            obj.vertices = subdivide(obj.vertices, args.level)
            print(f"mesh: {obj.num_triangles} triangles")

    t0 = time.perf_counter()
    prepared = prepare(sc, accel="auto")
    print(f"prepare (host partition + upload): {time.perf_counter()-t0:.2f} s")

    t0 = time.perf_counter()
    color, depth, normal = render(prepared, bounces=args.bounces)
    color = np.asarray(color)  # forces completion (device_get)
    print(f"compile + first frame: {time.perf_counter()-t0:.1f} s")

    # steady state: perturb a traced input so the dev tunnel cannot serve
    # a cached result (docs/performance.md "Measurement discipline")
    soa2 = dataclasses.replace(prepared.soa,
                               ambient=prepared.soa.ambient + 1e-9)
    t0 = time.perf_counter()
    out = render(dataclasses.replace(prepared, soa=soa2),
                 bounces=args.bounces)
    np.asarray(out[1][0, :8])
    print(f"steady frame: {time.perf_counter()-t0:.2f} s")

    images.write_colorized(args.out, color)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
