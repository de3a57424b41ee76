"""Triangle clustering (2-level BVH): host-side partition + traced geometry.

The reference has no BVH — only one AABB per mesh followed by a linear scan
(/root/reference/inc/default_schema.hpp:99-144). The north star requires a
real acceleration structure (SURVEY.md header). A classic per-ray stack
traversal is the wrong shape for a TPU (divergent control flow, scalar
gathers); instead the triangle soup is built into fixed-size *clusters*:

  build (host, numpy/C++): recursively median-split triangle centroids along
  the widest axis until <= CLUSTER_SIZE triangles remain; each leaf becomes
  one cluster. This is exactly a BVH whose internal levels are discarded and
  whose leaves are padded to a uniform size — uniform because the TPU wants
  dense (rays x CLUSTER_SIZE) intersection tiles.

  traverse (device): rays test all M cluster AABBs with one vectorized slab
  test (cheap: M ~ T/64), then intersect triangles of surviving clusters.
  The pure-JAX "clusters" path evaluates every cluster masked (no skipping —
  it is the semantics oracle); the Pallas kernel (pallas_cast.py) skips a
  cluster's triangle tile when no ray in the program's tile hits its AABB,
  which is where the BVH speedup actually lands.

Differentiability & freshness (the round-1 defect this design removes): the
acceleration structure `Accel` stores only the PARTITION — which original
triangle occupies which cluster slot. Cluster geometry (vertices, AABBs,
per-triangle intersection constants) is gathered from the live
`soa.tri_p1/p2/p3` arrays *inside* the traced program
(`clusters_from_accel`), so

  * `jax.grad` w.r.t. vertex positions flows through the accelerated path
    exactly like the brute-force path (the gather is differentiable), and
  * a `PreparedScene` can never render stale geometry after a vertex
    update — the partition may become suboptimal (AABBs are recomputed from
    the moved vertices, so correctness holds; only culling quality decays),
    but the rendered image always reflects the current parameters.

Cluster order preserves the global scene order of the first triangle of
each cluster, and `order` carries every triangle's original flat index, so
nearest-hit ties keep the reference's scan-order winner semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cutrace_tpu.ops import intersect as I

CLUSTER_SIZE = 64

_FAR = 1.0e8
_BIG = 2**30

# Sentinel triangle parked far away for padding slots (matches scene/soa.py);
# valid=False keeps it from ever hitting, finite values keep grads NaN-free.
# numpy, NOT jnp: this module is imported lazily, sometimes inside a jit
# trace, where jnp.asarray would capture a tracer in module state.
_SENT_P1 = np.asarray([_FAR, 0.0, 0.0], np.float32)
_SENT_P2 = np.asarray([_FAR, 64.0, 0.0], np.float32)
_SENT_P3 = np.asarray([_FAR, 0.0, 64.0], np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Accel:
    """Geometry-free cluster partition (see module docstring).

    `order[m, c]` is the original flat triangle index occupying slot c of
    cluster m (2**30 on padding slots); `valid` masks live slots. The
    `kind` selects the device traversal ("clusters" = dense masked oracle,
    "pallas" = TPU culling kernel); `interpret` runs the kernel in
    interpreter mode (CPU tests). Both are static: they shape the compiled
    program, while `order`/`valid` trace through jit so re-partitioning
    never recompiles."""

    order: jax.Array  # (M, C) i32 original flat triangle index
    valid: jax.Array  # (M, C) bool
    kind: str = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))


def build_partition(centroids: np.ndarray, cluster_size: int):
    """Median-split leaf lists over triangle centroids (host-side).

    Prefers the native C++ builder (native/cluster.cpp, identical stable
    median-split order); numpy recursion is the fallback. Returns a list of
    int arrays (original indices per cluster)."""
    from cutrace_tpu import native

    nat = (
        native.build_clusters(centroids, cluster_size)
        if native.available()
        else None
    )
    if nat is not None:
        perm, starts, counts = nat
        return [perm[s : s + k] for s, k in zip(starts, counts)]

    leaves = []

    def split(idx):
        if len(idx) <= cluster_size:
            leaves.append(idx)
            return
        c = centroids[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(idx) // 2
        split(idx[order[:half]])
        split(idx[order[half:]])

    split(np.arange(len(centroids)))
    return leaves


def build_accel(
    soa,
    cluster_size: int = CLUSTER_SIZE,
    kind: str = "pallas",
    interpret: Optional[bool] = None,
    min_clusters: int = 0,
    host_tris=None,
) -> Accel:
    """Partition the scene's triangles into an Accel (host-side build).

    `min_clusters` pads the cluster axis (for stacking per-shard partitions
    of differing sizes to one static shape). `host_tris` is an optional
    `(p1, p2, p3, valid)` numpy tuple (scene.soa.host_triangle_soup) that
    skips the device->host readback of the triangle buffers — over the dev
    tunnel that readback costs seconds even for tiny scenes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if host_tris is not None:
        p1, p2, p3, valid = (np.asarray(a) for a in host_tris)
    else:
        p1 = np.asarray(soa.tri_p1)
        p2 = np.asarray(soa.tri_p2)
        p3 = np.asarray(soa.tri_p3)
        valid = np.asarray(soa.tri_valid)
    centroids = (p1 + p2 + p3) / 3.0
    leaves = build_partition(centroids, cluster_size)

    m = max(len(leaves), min_clusters, 1)
    order = np.full((m, cluster_size), _BIG, np.int32)
    vmask = np.zeros((m, cluster_size), bool)
    for mi, idx in enumerate(leaves):
        k = len(idx)
        order[mi, :k] = idx
        vmask[mi, :k] = valid[idx]
    return Accel(
        order=jnp.asarray(order),
        valid=jnp.asarray(vmask),
        kind=kind,
        interpret=bool(interpret),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriClusters:
    """Clustered triangle buffers: (M, C, ...) with per-cluster AABBs."""

    p1: jax.Array  # (M, C, 3) f32
    p2: jax.Array  # (M, C, 3) f32
    p3: jax.Array  # (M, C, 3) f32
    mat: jax.Array  # (M, C) i32
    obj: jax.Array  # (M, C) i32
    order: jax.Array  # (M, C) i32 original flat triangle index
    is_mesh: jax.Array  # (M, C) bool
    valid: jax.Array  # (M, C) bool
    bmin: jax.Array  # (M, 3) f32
    bmax: jax.Array  # (M, 3) f32


def clusters_from_accel(soa, accel: Accel) -> TriClusters:
    """Gather live cluster geometry from the scene arrays (traced).

    Runs inside jit: vertices come straight from soa.tri_p1/p2/p3 (so
    gradients flow and updates are never stale), AABBs are recomputed from
    the gathered vertices. Padding slots get the far-away sentinel
    triangle; empty clusters get a far-away point AABB (never hit)."""
    t = soa.tri_p1.shape[0]
    idx = jnp.clip(accel.order, 0, t - 1)
    valid = accel.valid & soa.tri_valid[idx]
    v3 = valid[..., None]
    p1 = jnp.where(v3, soa.tri_p1[idx], _SENT_P1)
    p2 = jnp.where(v3, soa.tri_p2[idx], _SENT_P2)
    p3 = jnp.where(v3, soa.tri_p3[idx], _SENT_P3)

    pts_min = jnp.minimum(jnp.minimum(p1, p2), p3)  # (M, C, 3)
    pts_max = jnp.maximum(jnp.maximum(p1, p2), p3)
    bmin = jnp.min(jnp.where(v3, pts_min, jnp.inf), axis=1)  # (M, 3)
    bmax = jnp.max(jnp.where(v3, pts_max, -jnp.inf), axis=1)
    # Empty cluster: park the AABB at the sentinel point so the slab test
    # (and the Pallas cull bitmask) never selects it.
    bmin = jnp.where(jnp.isfinite(bmin), bmin, _FAR)
    bmax = jnp.where(jnp.isfinite(bmax), bmax, _FAR)

    return TriClusters(
        p1=p1,
        p2=p2,
        p3=p3,
        mat=jnp.where(valid, soa.tri_mat[idx], 0),
        obj=jnp.where(valid, soa.tri_obj[idx], _BIG),
        order=jnp.where(valid, accel.order, _BIG),
        is_mesh=valid & (soa.tri_mesh[idx] >= 0),
        valid=valid,
        bmin=bmin,
        bmax=bmax,
    )


def build_clusters(soa, cluster_size: int = CLUSTER_SIZE) -> TriClusters:
    """Convenience: host partition + geometry gather in one call."""
    return clusters_from_accel(soa, build_accel(soa, cluster_size))


def slab_entry(bmin, bmax, o, d):
    """Vectorized AABB slab interval (default_schema.hpp:99-114,
    tavianator variant with tmin initialized to 0): (R,3) rays x (M,3)
    boxes -> ((R,M) tmin, (R,M) tmax). The box is hit iff tmin <= tmax;
    tmin is then the ray's entry t (a lower bound on any hit inside)."""
    with np.errstate(divide="ignore"):
        inv = 1.0 / d  # (R,3); +-inf on zero components, as the reference
    t1 = (bmin[None, :, :] - o[:, None, :]) * inv[:, None, :]  # (R,M,3)
    t2 = (bmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    # NaN (0 * inf) handling: jnp.minimum/maximum propagate the non-NaN
    # operand is NOT guaranteed; the reference's fminf/fmaxf return the
    # non-NaN one. Use nan-aware forms.
    lo = jnp.fmin(t1, t2)
    hi = jnp.fmax(t1, t2)
    tmin = jnp.max(jnp.where(jnp.isnan(lo), 0.0, lo), axis=-1)
    tmax = jnp.min(jnp.where(jnp.isnan(hi), jnp.inf, hi), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    return tmin, tmax


def slab_test(bmin, bmax, o, d):
    """(R,3) rays x (M,3) boxes -> (R,M) bool hit mask (see slab_entry)."""
    tmin, tmax = slab_entry(bmin, bmax, o, d)
    return tmin <= tmax


@dataclasses.dataclass
class _FlatView:
    """Clustered buffers flattened back to one (M*C) triangle SoA, with
    `tri_obj` set to the ORIGINAL flat triangle index so cast_triangles'
    first-minimum tie-break reproduces scene-scan order despite the
    cluster permutation."""

    tri_p1: jax.Array
    tri_p2: jax.Array
    tri_p3: jax.Array
    tri_obj: jax.Array  # original flat index (tie-break key)
    tri_valid: jax.Array
    scene_center: jax.Array


def _offset_order(order, order_base):
    """Offset live order keys by a (possibly traced) shard base, keeping
    the miss sentinel at _BIG."""
    if isinstance(order_base, int) and order_base == 0:
        return order
    return jnp.where(order >= _BIG, _BIG, order + order_base)


def cluster_candidates(soa, accel: Accel, o, d, min_dist, o0, order_base=0):
    """Dense masked cast over the clustered (live-gathered) buffers — no
    culling. The semantics oracle for the Pallas culling kernel: validates
    that clustering (permutation, padding aside) is hit-for-hit equivalent
    to the scene-order brute force. Fully differentiable (gathered verts)."""
    clusters = clusters_from_accel(soa, accel)
    m, c = clusters.mat.shape
    flat = _FlatView(
        tri_p1=clusters.p1.reshape(m * c, 3),
        tri_p2=clusters.p2.reshape(m * c, 3),
        tri_p3=clusters.p3.reshape(m * c, 3),
        tri_obj=clusters.order.reshape(m * c),
        tri_valid=clusters.valid.reshape(m * c),
        scene_center=soa.scene_center,
    )
    t, idx = I.cast_triangles(flat, o, d, min_dist, o0)
    return I.TriCandidate(
        t=t,
        obj=clusters.obj.reshape(m * c)[idx],
        order=_offset_order(clusters.order.reshape(m * c)[idx], order_base),
        mat=clusters.mat.reshape(m * c)[idx],
        is_mesh=clusters.is_mesh.reshape(m * c)[idx],
        p1=flat.tri_p1[idx],
        p2=flat.tri_p2[idx],
        p3=flat.tri_p3[idx],
    )


def accel_candidates(soa, accel: Accel, o, d, min_dist, o0, order_base=0):
    """ray_cast triangle-query provider for an Accel (kind dispatch).
    A "fused" partition is identical to a "pallas" one — when the fused
    whole-pipeline kernel doesn't apply (ops/fused.py scope), composable
    paths fall back to the culling-cast kernel over the same clusters."""
    if accel.kind == "clusters":
        return cluster_candidates(soa, accel, o, d, min_dist, o0, order_base)
    if accel.kind in ("pallas", "fused"):
        from cutrace_tpu.ops.pallas_cast import pallas_candidates

        return pallas_candidates(soa, accel, o, d, min_dist, o0, order_base)
    raise ValueError(f"unknown accel kind {accel.kind!r}")


def candidates_fn(accel: Optional[Accel]):
    """A ray_cast `tri_candidates` callable bound to `accel` (None -> None,
    i.e. brute force). Build it INSIDE the jit trace that receives the
    Accel pytree, so `order`/`valid` stay traced arguments."""
    if accel is None:
        return None

    def provider(soa, o, d, min_dist, o0):
        return accel_candidates(soa, accel, o, d, min_dist, o0)

    return provider
