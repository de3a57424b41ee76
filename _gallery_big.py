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

sc = load_scene("scenes/bunny.json")
sc.camera.width, sc.camera.height = 960, 540
for ob in sc.objects:
    if type(ob).__name__ == "Mesh":
        ob.vertices = subdivide(ob.vertices, 4)
prepared = prepare(sc, accel="auto")
t0 = time.perf_counter()
out = render(prepared, bounces=5)
c = np.asarray(out[0])
print(f"bunny 256k tris 960x540 b5 (compile+first): {time.perf_counter()-t0:.1f} s")
soa2 = dataclasses.replace(prepared.soa, ambient=prepared.soa.ambient + 1e-9)
t0 = time.perf_counter()
out = render(dataclasses.replace(prepared, soa=soa2), bounces=5)
c = np.asarray(out[0])
print(f"bunny 256k steady: {time.perf_counter()-t0:.2f} s")
images.write_colorized("docs/gallery/bunny_256k.jpg", c)
