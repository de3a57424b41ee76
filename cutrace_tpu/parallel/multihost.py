"""Multi-host entrypoints (pod slices).

The reference is single-process/single-GPU (SURVEY.md §2); this is the
TPU-native scale-out path: every host calls `initialize()`, loads the same
scene (arrays are identical by construction — the loader is
deterministic), builds a global mesh over all devices, and renders its
image shard; `gather_image` assembles the full frame on every host (or use
the host-0 copy).

Cross-host determinism: nothing here introduces host-dependent values —
scene upload is replicated, tile assignment is a pure function of the
global mesh, and the combine collectives use fixed operand order — so the
multi-host image is bit-identical to the single-host one (the property
tests/test_parallel.py checks on the virtual mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from cutrace_tpu.parallel import sharding as sh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection: on Cloud TPU
    pods all arguments are discovered from the metadata server; pass them
    explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(n_prims: int = 1) -> Mesh:
    """(tiles, prims) mesh over every device of every host."""
    n = jax.device_count()
    assert n % n_prims == 0, (n, n_prims)
    return sh.make_mesh(n // n_prims, n_prims, devices=jax.devices())


def render_multihost(
    scene_or_soa, mesh: Mesh, bounces: int = 5, fudge: float = 1e-3
):
    """Full-image render over a multi-host mesh. Returns the (globally
    sharded) color/depth/normal arrays; use gather_image for host copies."""
    from cutrace_tpu.scene.soa import SceneArrays, scene_to_soa

    soa = (
        scene_or_soa
        if isinstance(scene_or_soa, SceneArrays)
        else scene_to_soa(scene_or_soa)
    )
    return sh.render_sharded(soa, mesh, bounces=bounces, fudge=fudge)


def gather_image(sharded_image) -> np.ndarray:
    """Assemble a fully-replicated host copy of a sharded image on every
    process (multihost_utils.process_allgather)."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(sharded_image, tiled=True)
    )
