"""Distributed differentiable-rendering training step.

The inverse-rendering analog of a data-parallel training loop: the target
image and rendered pixels are sharded over TILE_AXIS, scene parameters are
replicated, and the backward pass all-reduces parameter gradients across
the mesh (the psum is inserted by shard_map's transpose for replicated
inputs — over ICI on a real slice). This is the gradient-communication
component called out in SURVEY.md §2's parallelism table.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cutrace_tpu.diff.grad import with_params, extract_params
from cutrace_tpu.parallel import sharding as sh
from cutrace_tpu.scene.soa import SceneArrays


def sharded_loss(params, soa, mesh, target_flat, bounces, fudge, accel=None):
    """MSE between the TILE_AXIS-sharded render and target ((N,3) flat).

    `accel` (ops.bvh.Accel, global or per-prim-shard) accelerates the
    triangle query; gradients flow through it because cluster geometry is
    gathered from the live params inside the trace (ops/bvh.py)."""
    s = with_params(soa, params)
    n = s.width * s.height
    idx = jnp.arange(sh._ceil_to(n, mesh.shape[sh.TILE_AXIS]), dtype=jnp.int32)
    idx = jax.lax.with_sharding_constraint(
        idx, NamedSharding(mesh, P(sh.TILE_AXIS))
    )
    color, _, _ = sh.render_pixels_sharded(s, mesh, idx, bounces, fudge, accel)
    diff = (color[:n] - target_flat.reshape(-1, 3)) ** 2
    return jnp.mean(diff)


def make_train_step(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    bounces: int = 2,
    fudge: float = 1e-3,
    param_filter: Optional[Tuple[str, ...]] = None,
    accel=None,
) -> Callable:
    """A jitted SGD/Adam step over scene parameters on a device mesh.

    Returns step(params, opt_state, soa, target) -> (params, opt_state,
    loss). `param_filter` restricts which parameter groups receive updates
    (e.g. ("mat_color",) for material-only optimization); others get zero
    updates but stay in the pytree. `accel` accelerates the cast (see
    sharded_loss); the partition stays fixed across steps — correct for
    any vertex positions, merely less tight as geometry drifts.
    """

    @functools.partial(jax.jit, static_argnames=())
    def step(params, opt_state, soa, target):
        loss, grads = jax.value_and_grad(sharded_loss)(
            params, soa, mesh, target, bounces, fudge, accel
        )
        if param_filter is not None:
            grads = {
                k: (g if k in param_filter else jnp.zeros_like(g))
                for k, g in grads.items()
            }
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def fit(
    soa: SceneArrays,
    target,
    mesh: Mesh,
    steps: int = 100,
    lr: float = 5e-2,
    bounces: int = 2,
    param_filter: Optional[Tuple[str, ...]] = None,
    verbose: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 50,
    accel: str = "auto",
    camera: str = "raw",
):
    """Optimize scene parameters to match a target image. Returns
    (params, losses). With `checkpoint_dir`, optimizer state is saved every
    `checkpoint_every` steps and training resumes from the newest
    checkpoint automatically (diff/checkpoint.py).

    `accel`: "none", "clusters", "pallas", "fused", "auto" (fused on TPU
    when the scene has enough triangles, else none), or a prebuilt
    ops.bvh.Accel. With PRIM_AXIS > 1 the partition is built per triangle
    shard. A "fused" accel on a tiles-only mesh runs the forward pass
    through the fused whole-pipeline kernel and, where replay_supported
    (ops/fused.py), the backward through the cast-free topology replay
    (ops/replay.py) — measured 0.18 s vs 0.675 s per full bunny 480x270
    bounces=5 value_and_grad step on one v5e chip; gradients match the
    composable pipeline's fixed-topology semantics either way
    (tests/test_replay.py).

    `camera`: "raw" optimizes the authored basis fields independently;
    "look_at" optimizes (eye, target, up hint, scales) with the
    orthonormal basis rebuilt in-trace (diff/camera.py) — required for
    useful camera recovery (use with param_filter=("cam_eye",
    "cam_target", ...))."""
    if isinstance(accel, str):
        if accel == "auto":
            on_tpu = jax.default_backend() == "tpu"
            big = int(soa.tri_p1.shape[0]) >= 256
            accel = "fused" if (on_tpu and big) else "none"
        accel = (
            None if accel == "none"
            else sh.build_sharded_accel(soa, mesh, kind=accel)
        )
    soa = sh.shard_scene(soa, mesh)
    target = jnp.asarray(target, jnp.float32).reshape(-1, 3)
    opt = optax.adam(lr)
    params = extract_params(soa, camera=camera)
    state = opt.init(params)
    start = 0
    if checkpoint_dir is not None:
        from cutrace_tpu.diff import checkpoint as ckpt

        restored = ckpt.restore_checkpoint(checkpoint_dir, params, state)
        if restored is not None:
            params, state, start = restored
            start += 1
            if verbose:
                print(f"resumed from step {start - 1}")
    step = make_train_step(mesh, opt, bounces, param_filter=param_filter,
                           accel=accel)
    # Keep losses as device scalars during the loop: a per-step
    # device_get serializes the dispatch pipeline (one host round trip
    # per step — comparable to the whole 35 ms step on a remote chip);
    # everything is fetched in one transfer at the end.
    losses = []
    for i in range(start, steps):
        params, state, loss = step(params, state, soa, target)
        losses.append(loss)
        if verbose and i % 10 == 0:
            print(f"step {i}: loss {float(loss):.6f}")
        if checkpoint_dir is not None and (
            (i + 1) % checkpoint_every == 0 or i == steps - 1
        ):
            from cutrace_tpu.diff import checkpoint as ckpt

            ckpt.save_checkpoint(checkpoint_dir, params, state, i)
    return params, [float(l) for l in jax.device_get(losses)]
