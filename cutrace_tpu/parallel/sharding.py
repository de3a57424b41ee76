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
from typing import Optional, Tuple

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


def sharded_tri_candidates(soa_local, o, d, min_dist, o0):
    """Triangle query over a PRIM_AXIS-sharded buffer (runs inside
    shard_map): local brute-force best, then all_gather the per-shard
    winners and take the (t, global order) lexicographic min."""
    axis = jax.lax.axis_index(PRIM_AXIS)
    t_local = soa_local.tri_p1.shape[0]
    cand = I.local_tri_candidates(
        soa_local, o, d, min_dist, o0, order_base=axis * t_local
    )
    stacked = jax.lax.all_gather(cand, PRIM_AXIS)  # (K, R, ...) pytree
    return I.combine_tri_candidates(stacked)


def render_pixels_sharded(soa, mesh: Mesh, idx, bounces: int, fudge,
                          tri_candidates=None):
    """shard_map render of flat pixel indices `idx` ((N,) i32, N divisible
    by n_tiles). Returns (color (N,3), depth (N,), normal (N,3)) sharded
    over TILE_AXIS.

    `tri_candidates` (an acceleration provider from render.renderer.prepare,
    e.g. the Pallas culling kernel over replicated clusters) applies only
    when the mesh does not shard primitives — with PRIM_AXIS > 1 the
    all_gather-combined sharded cast takes over."""
    n_prims = mesh.shape[PRIM_AXIS]
    shard_prims = n_prims > 1
    tri_c = sharded_tri_candidates if shard_prims else tri_candidates

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(scene_specs(soa, shard_prims), P(TILE_AXIS)),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=False,
    )
    def body(soa_local, idx_local):
        o, d = camera_rays(soa_local, idx_local % soa.width,
                           idx_local // soa.width)
        return render_rays(soa_local, o, d, bounces, fudge, tri_c)

    return body(soa, idx)


@functools.partial(
    jax.jit, static_argnames=("bounces", "mesh", "tri_candidates")
)
def _render_sharded_jit(soa, mesh, fudge, bounces, tri_candidates=None):
    n = soa.width * soa.height
    n_tiles = mesh.shape[TILE_AXIS]
    n_pad = _ceil_to(n, n_tiles)
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    idx = jax.device_put(idx, NamedSharding(mesh, P(TILE_AXIS)))
    color, depth, normal = render_pixels_sharded(
        soa, mesh, idx, bounces, fudge, tri_candidates
    )
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

    Accepts a SceneArrays or a render.renderer.PreparedScene; a prepared
    acceleration provider is used on tile-only meshes (clusters replicated
    per device, like the scene)."""
    from cutrace_tpu.render.renderer import PreparedScene

    provider = None
    if isinstance(scene, PreparedScene):
        provider = scene.tri_candidates
        scene = scene.soa
    soa = shard_scene(scene, mesh)
    if mesh.shape[PRIM_AXIS] > 1:
        provider = None  # sharded cast takes over
    return _render_sharded_jit(soa, mesh, jnp.float32(fudge), bounces, provider)
