"""Device-mesh sharding: image-tile DP x primitive sharding.

Replaces the reference's single-GPU launch (kernel.hpp:103-106) with a 2D
`jax.sharding.Mesh`:

  axis "tiles" — pixels sharded (data parallel). Forward needs no
                 communication at all; backward psums parameter grads.
  axis "prims" — the flattened triangle buffer sharded (the tensor-parallel
                 analog, for scenes too big to replicate). Each device casts
                 its shard; per-ray winners combine via all_gather +
                 (t, scene-order) lexicographic min over the axis, so the
                 reference's tie-break semantics (ray_cast.hpp:43-51) hold
                 across shards bit-for-bit.

Everything is expressed with shard_map so collectives are explicit and
deterministic (fixed reduction order — required for the multi-host allclose
gate, SURVEY.md §7 "multi-host determinism").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cutrace_tpu.ops import intersect as I
from cutrace_tpu.render.renderer import camera_rays, render_rays
from cutrace_tpu.scene.soa import SceneArrays

TILE_AXIS = "tiles"
PRIM_AXIS = "prims"

# Triangle-buffer fields sharded along PRIM_AXIS (everything else in the
# scene is replicated — planes/spheres/materials/lights are small).
_TRI_FIELDS = ("tri_p1", "tri_p2", "tri_p3", "tri_mat", "tri_obj",
               "tri_mesh", "tri_valid")


def make_mesh(n_tiles: int, n_prims: int = 1, devices=None) -> Mesh:
    """A (tiles, prims) mesh over the given (default: all) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(n_tiles, n_prims), (TILE_AXIS, PRIM_AXIS))


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_triangles(soa: SceneArrays, multiple: int) -> SceneArrays:
    """Pad the triangle buffer with never-hit sentinels to a multiple of
    `multiple` so it divides evenly across PRIM_AXIS."""
    t = soa.tri_p1.shape[0]
    t_pad = _ceil_to(t, multiple)
    if t_pad == t:
        return soa
    pad = t_pad - t

    def pad3(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad, 3), fill, x.dtype)], axis=0
        )

    def pad1(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)], axis=0)

    return dataclasses.replace(
        soa,
        tri_p1=pad3(soa.tri_p1, 1.0e8),
        tri_p2=jnp.concatenate(
            [soa.tri_p2, jnp.tile(jnp.asarray([[1.0e8, 64.0, 0.0]],
                                              soa.tri_p2.dtype), (pad, 1))]
        ),
        tri_p3=jnp.concatenate(
            [soa.tri_p3, jnp.tile(jnp.asarray([[1.0e8, 0.0, 64.0]],
                                              soa.tri_p3.dtype), (pad, 1))]
        ),
        tri_mat=pad1(soa.tri_mat, 0),
        tri_obj=pad1(soa.tri_obj, 2**30),
        tri_mesh=pad1(soa.tri_mesh, -1),
        tri_valid=pad1(soa.tri_valid, False),
    )


def scene_specs(soa: SceneArrays, shard_prims: bool):
    """PartitionSpec pytree for a scene: triangles along PRIM_AXIS (if
    sharding primitives), everything else replicated."""
    specs = jax.tree.map(lambda _: P(), soa)
    if shard_prims:
        specs = dataclasses.replace(
            specs, **{f: P(PRIM_AXIS) for f in _TRI_FIELDS}
        )
    return specs


def shard_scene(soa: SceneArrays, mesh: Mesh) -> SceneArrays:
    """device_put the scene onto the mesh: triangles sharded over PRIM_AXIS,
    the rest replicated (the TPU-native cpu_to_gpu, SURVEY.md §2)."""
    n_prims = mesh.shape[PRIM_AXIS]
    soa = pad_triangles(soa, n_prims)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        soa,
        scene_specs(soa, n_prims > 1),
    )


def sharded_tri_candidates(accel_local=None):
    """Triangle query over a PRIM_AXIS-sharded buffer (runs inside
    shard_map): local best — via the local Accel partition when given,
    else brute force — then all_gather the per-shard winners and take the
    (t, global order) lexicographic min. This is how the acceleration
    kernel composes with primitive sharding: each device culls only its
    own triangle shard."""

    def tri_c(soa_local, o, d, min_dist, o0):
        axis = jax.lax.axis_index(PRIM_AXIS)
        t_local = soa_local.tri_p1.shape[0]
        if accel_local is None:
            cand = I.local_tri_candidates(
                soa_local, o, d, min_dist, o0, order_base=axis * t_local
            )
        else:
            from cutrace_tpu.ops import bvh

            cand = bvh.accel_candidates(
                soa_local, accel_local, o, d, min_dist, o0,
                order_base=axis * t_local,
            )
        stacked = jax.lax.all_gather(cand, PRIM_AXIS)  # (K, R, ...) pytree
        return I.combine_tri_candidates(stacked)

    return tri_c


def build_sharded_accel(soa: SceneArrays, mesh: Mesh, kind: str = "pallas",
                        interpret=None, cluster_size: int = None):
    """Per-PRIM-shard Accel partitions stacked to (n_prims, M, C) leaves
    (shard over PRIM_AXIS; `order` indices are LOCAL to each shard's
    triangle buffer). For a tiles-only mesh this is just a replicated
    global Accel."""
    from types import SimpleNamespace

    from cutrace_tpu.ops import bvh

    if cluster_size is None:
        cluster_size = bvh.CLUSTER_SIZE
    n_prims = mesh.shape[PRIM_AXIS]
    if n_prims == 1:
        return bvh.build_accel(soa, cluster_size, kind=kind,
                               interpret=interpret)
    soa_p = pad_triangles(soa, n_prims)
    t_local = soa_p.tri_p1.shape[0] // n_prims
    fields = ("tri_p1", "tri_p2", "tri_p3", "tri_valid")
    host = {f: np.asarray(getattr(soa_p, f)) for f in fields}
    views = [
        SimpleNamespace(**{
            f: host[f][k * t_local:(k + 1) * t_local] for f in fields
        })
        for k in range(n_prims)
    ]
    parts = [
        bvh.build_accel(v, cluster_size, kind=kind, interpret=interpret)
        for v in views
    ]
    m = max(a.order.shape[0] for a in parts)
    parts = [
        a if a.order.shape[0] == m
        else bvh.build_accel(views[i], cluster_size, kind=kind,
                             interpret=interpret, min_clusters=m)
        for i, a in enumerate(parts)
    ]
    return bvh.Accel(
        order=jnp.stack([a.order for a in parts]),
        valid=jnp.stack([a.valid for a in parts]),
        kind=parts[0].kind,
        interpret=parts[0].interpret,
    )


def render_pixels_sharded(soa, mesh: Mesh, idx, bounces: int, fudge,
                          accel=None):
    """shard_map render of flat pixel indices `idx` ((N,) i32, N divisible
    by n_tiles). Returns (color (N,3), depth (N,), normal (N,3)) sharded
    over TILE_AXIS.

    `accel` is an ops.bvh.Accel: replicated (M, C) leaves on a tiles-only
    mesh, or per-shard (n_prims, M, C) leaves from `build_sharded_accel`
    when PRIM_AXIS > 1 (each device culls its own triangle shard before
    the all_gather combine)."""
    n_prims = mesh.shape[PRIM_AXIS]
    shard_prims = n_prims > 1
    if accel is None:
        accel_specs = None
    else:
        spec = P(PRIM_AXIS) if shard_prims else P()
        accel_specs = jax.tree.map(lambda _: spec, accel)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(scene_specs(soa, shard_prims), P(TILE_AXIS), accel_specs),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=False,
    )
    def body(soa_local, idx_local, accel_local):
        o, d = camera_rays(soa_local, idx_local % soa.width,
                           idx_local // soa.width)
        if (
            not shard_prims
            and accel_local is not None
            and accel_local.kind == "fused"
            and isinstance(fudge, (int, float))
        ):
            # Tiles-only mesh + replicated scene: each device runs the
            # fused whole-pipeline kernel on its own ray shard — the
            # multi-chip path gets the single-chip kernel's speed (the
            # composable pipeline below is ~15x slower per chip). Falls
            # through when out of kernel scope. `fudge` must be static
            # (the kernel's custom_vjp keeps it nondiff); both
            # render_sharded and the training step (make_train_step's
            # float default) pass it so — distributed training runs the
            # fused forward + replay backward per shard
            # (tests/test_parallel_fused.py, dryrun_multichip phase 2).
            from cutrace_tpu.ops.fused import (fused_render_rays,
                                               fused_supported)

            if fused_supported(soa_local, accel_local, bounces):
                return fused_render_rays(soa_local, accel_local, o, d,
                                         float(fudge), bounces)
        if shard_prims:
            if accel_local is not None:
                # drop the sharded leading axis: (1, M, C) -> (M, C)
                accel_local = jax.tree.map(lambda x: x[0], accel_local)
            tri_c = sharded_tri_candidates(accel_local)
        else:
            from cutrace_tpu.ops.bvh import candidates_fn

            tri_c = candidates_fn(accel_local)
        return render_rays(soa_local, o, d, bounces, fudge, tri_c)

    return body(soa, idx, accel)


@functools.partial(jax.jit, static_argnames=("bounces", "mesh", "fudge"))
def _render_sharded_jit(soa, mesh, fudge, bounces, accel=None):
    """The compiled multi-chip render step. ZERO collectives by
    construction (machine-checked: tests/test_hlo.py,
    tests/test_parallel_fused.py) — on the fused path each device returns
    its ray shard in BLOCK order and the scanline un-permute happens on
    the host during image assembly (`render_sharded`), exactly where the
    reference pays its device->host copy (kernel.hpp:119-125). An
    in-program global inverse permutation would compile to an
    image-sized all-gather (caught by the round-4 HLO gate)."""
    n = soa.width * soa.height
    n_tiles = mesh.shape[TILE_AXIS]
    fused_path = (
        accel is not None
        and accel.kind == "fused"
        and mesh.shape[PRIM_AXIS] == 1
    )
    if fused_path:
        # Block-coherent pixel order (one kernel tile = one compact image
        # block), padded so every shard holds whole kernel tiles.
        from cutrace_tpu.ops.fused import TILE_R
        from cutrace_tpu.render.renderer import _block_order

        n_pad = _ceil_to(n, n_tiles * TILE_R)
        order, _ = _block_order(soa.width, soa.height, n_pad)
        idx = jnp.asarray(order)
    else:
        n_pad = _ceil_to(n, n_tiles)
        idx = jnp.arange(n_pad, dtype=jnp.int32)
    idx = jax.device_put(idx, NamedSharding(mesh, P(TILE_AXIS)))
    color, depth, normal = render_pixels_sharded(
        soa, mesh, idx, bounces, fudge, accel
    )
    if fused_path:
        # sharded, block-order, padded — host assembles (render_sharded)
        return color, depth, normal
    return (
        color[:n].reshape(soa.height, soa.width, 3),
        depth[:n].reshape(soa.height, soa.width),
        normal[:n].reshape(soa.height, soa.width, 3),
    )


def render_sharded(
    scene, mesh: Mesh, bounces: int = 5, fudge: float = 1e-3
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full-image render over a device mesh. The multi-chip analog of
    render.renderer.render: image tiles over TILE_AXIS, triangles over
    PRIM_AXIS (if mesh has >1), scene otherwise replicated.

    Accepts a SceneArrays or a render.renderer.PreparedScene. On a
    tiles-only mesh the prepared Accel is replicated per device like the
    scene; with PRIM_AXIS > 1 it is re-partitioned per triangle shard
    (build_sharded_accel) so each device culls only its shard."""
    from cutrace_tpu.render.renderer import PreparedScene

    accel = None
    if isinstance(scene, PreparedScene):
        accel = scene.accel
        scene = scene.soa
    if accel is not None and mesh.shape[PRIM_AXIS] > 1:
        accel = build_sharded_accel(
            scene, mesh, kind=accel.kind, interpret=accel.interpret
        )
    soa = shard_scene(scene, mesh)
    out = _render_sharded_jit(soa, mesh, float(fudge), bounces, accel)
    color, depth, normal = out
    n = scene.width * scene.height
    if color.ndim == 3:  # composable path: already assembled in-program
        return color, depth, normal
    # Fused path: per-device block-order shards. Assemble on the host
    # (device_get + scanline un-permute) — the multi-chip analog of the
    # reference's cudaMemcpy image download (kernel.hpp:119-125); the
    # compiled render program itself stays collective-free. Across
    # PROCESSES the local device_get can't see remote shards, so the
    # assembly goes through the explicit multihost gather
    # (multihost.gather_image's primitive) instead.
    from cutrace_tpu.render.renderer import _block_order

    _, inverse = _block_order(scene.width, scene.height, color.shape[0])
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        color, depth, normal = (
            np.asarray(multihost_utils.process_allgather(x, tiled=True))
            for x in (color, depth, normal)
        )
    else:
        color, depth, normal = (np.asarray(x) for x in (color, depth, normal))
    return (
        jnp.asarray(color[inverse][:n].reshape(scene.height, scene.width, 3)),
        jnp.asarray(depth[inverse][:n].reshape(scene.height, scene.width)),
        jnp.asarray(normal[inverse][:n].reshape(scene.height, scene.width, 3)),
    )
