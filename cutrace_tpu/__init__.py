"""cutrace_tpu — a TPU-native differentiable ray tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CUDA
reference renderer jay-tux/cutrace (see /root/reference): JSON scene loading
(triangles / meshes / spheres / planes, sun + point lights, Phong + mirror +
transparency materials), producing color / depth / normal buffers — plus the
capabilities the north star adds on top: end-to-end differentiability, a real
BVH, and multi-chip/multi-host scaling via jax.sharding.

Layer map (bottom -> top), mirroring the reference's layering (SURVEY.md §1):

  vecmath            <- inc/vector.hpp          (L0 math)
  scene.schema       <- inc/loader.hpp          (L2 declarative scene schema)
  scene.stl          <- Assimp mesh import      (L3, STL only: all ref assets are STL)
  scene.types        <- inc/cpu_types.hpp       (L2 CPU scene)
  scene.soa          <- inc/cpu_to_gpu.hpp      (L5 upload: scene -> SoA pytree on device)
  ops.intersect      <- inc/default_schema.hpp + inc/ray_cast.hpp (L6 device core)
  ops.bvh            <- (new; ref has only per-mesh AABBs)
  render.shading     <- inc/shading.hpp         (L6 phong / bounce tree)
  render.renderer    <- inc/kernel.hpp          (L6/L7 host driver)
  render.cpuref      <- golden-image scalar reference (SURVEY.md §4)
  io.images          <- inc/images.hpp          (L7 output encoders)
  cli                <- main.cu                 (L7 CLI)
  parallel.*         <- (new; multi-chip image-tile sharding + grad psum)
  diff.*             <- (new; inverse-rendering losses/training)
"""

__version__ = "0.1.0"

from cutrace_tpu.scene.types import Scene  # noqa: F401
from cutrace_tpu.scene.loader import load_file, load_scene  # noqa: F401
