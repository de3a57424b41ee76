import time, dataclasses
import numpy as np, jax
from cutrace_tpu import load_scene
from cutrace_tpu.render.renderer import prepare, render
from cutrace_tpu.scene.mesh_io import subdivide
from cutrace_tpu.io import images

for name in ("sphere_plane", "mirror"):
    sc = load_scene(f"scenes/{name}.json")
    sc.camera.width, sc.camera.height = 1920, 1080
    prepared = prepare(sc, accel="auto")
    out = render(prepared, bounces=5); np.asarray(out[1][0, :8])
    soa2 = dataclasses.replace(prepared.soa, ambient=prepared.soa.ambient + 1e-9)
    t0 = time.perf_counter()
    out = render(dataclasses.replace(prepared, soa=soa2), bounces=5)
    np.asarray(out[1][0, :8])
    print(f"{name} 1080p b5: {time.perf_counter()-t0:.3f} s")

