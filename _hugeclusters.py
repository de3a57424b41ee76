import sys, time, dataclasses
import numpy as np, jax
from cutrace_tpu import load_scene
from cutrace_tpu.render.renderer import render, PreparedScene
from cutrace_tpu.scene.mesh_io import subdivide
from cutrace_tpu.scene.soa import scene_to_soa, host_triangle_soup
from cutrace_tpu.ops import bvh

level, C = int(sys.argv[1]), int(sys.argv[2])
sc = load_scene("scenes/bunny.json")
sc.camera.width, sc.camera.height = 480, 270
for ob in sc.objects:
    if type(ob).__name__ == "Mesh":
        ob.vertices = subdivide(ob.vertices, level)
host = host_triangle_soup(sc)
soa = scene_to_soa(sc)
accel = bvh.build_accel(soa, C, kind="fused", host_tris=host)
print("tris:", host[0].shape[0], "C:", C, "M:", accel.order.shape[0])
prepared = PreparedScene(soa=soa, accel=accel)
out = render(prepared, bounces=5); np.asarray(out[1][0, :8])
ts = []
for k in range(2):
    soa2 = dataclasses.replace(soa, ambient=soa.ambient + 1e-9*(k+1))
    t0 = time.perf_counter()
    out = render(dataclasses.replace(prepared, soa=soa2), bounces=5)
    np.asarray(out[1][0, :8])
    ts.append(time.perf_counter() - t0)
print("frame s:", round(min(ts), 3), "mean:", float(np.asarray(out[0]).mean()))
