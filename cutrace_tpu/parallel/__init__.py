"""Multi-chip / multi-host scaling via jax.sharding.

The reference's only parallelism is one CUDA thread per pixel on a single
GPU (/root/reference/inc/kernel.hpp:35-60,103-106). The TPU-native design
(SURVEY.md §2 parallelism table) scales along two orthogonal axes of a
device mesh:

  "tiles" — image-tile data parallelism: pixels sharded, scene replicated,
            zero collectives in the forward pass; gradient psum in backward
            (inserted by the partitioner).
  "prims" — primitive sharding (the tensor-parallel analog): the flattened
            triangle buffer sharded across devices, each computing its
            shard's nearest hit; hits combined with an all-gather +
            lexicographic-min (scene-order tie-break preserved). For scenes
            too large to replicate.
"""

from cutrace_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_sharded,
    shard_scene,
)
from cutrace_tpu.parallel.train import make_train_step  # noqa: F401
