"""Triangle clustering (2-level BVH), host build + device providers.

The reference has no BVH — only one AABB per mesh followed by a linear scan
(/root/reference/inc/default_schema.hpp:99-144). The north star requires a
real acceleration structure (SURVEY.md header). A classic per-ray stack
traversal is the wrong shape for a TPU (divergent control flow, scalar
gathers); instead the triangle soup is built into fixed-size *clusters*:

  build (host, numpy): recursively median-split triangle centroids along
  the widest axis until <= CLUSTER_SIZE triangles remain; each leaf becomes
  one cluster with an AABB. This is exactly a BVH whose internal levels
  are discarded and whose leaves are padded to a uniform size — uniform
  because the TPU wants dense (rays x CLUSTER_SIZE) intersection tiles.

  traverse (device): rays test all M cluster AABBs with one vectorized slab
  test (cheap: M ~ T/64), then intersect triangles of surviving clusters.
  The pure-JAX provider below evaluates every cluster masked (no skipping —
  it is the semantics oracle); the Pallas kernel (pallas_cast.py) skips a
  cluster's triangle tile when no ray in the program's tile hits its AABB,
  which is where the BVH speedup actually lands.

Cluster order preserves the global scene order of the first triangle of
each cluster, and `order` carries every triangle's original flat index, so
nearest-hit ties keep the reference's scan-order winner semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cutrace_tpu.ops import intersect as I

CLUSTER_SIZE = 64

_FAR = 1.0e8


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


def build_clusters(soa, cluster_size: int = CLUSTER_SIZE) -> TriClusters:
    """Median-split the scene's triangles into clusters (host-side)."""
    p1 = np.asarray(soa.tri_p1)
    p2 = np.asarray(soa.tri_p2)
    p3 = np.asarray(soa.tri_p3)
    valid = np.asarray(soa.tri_valid)
    n = p1.shape[0]
    centroids = (p1 + p2 + p3) / 3.0

    # Prefer the native C++ builder (native/cluster.cpp, identical stable
    # median-split order) — the numpy recursion below is the fallback.
    from cutrace_tpu import native

    nat = native.build_clusters(centroids, cluster_size) \
        if native.available() else None
    if nat is not None:
        perm, starts, counts = nat
        leaves = [perm[s:s + k] for s, k in zip(starts, counts)]
    else:
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

        split(np.arange(n))

    m = len(leaves)
    c = cluster_size
    shape3 = (m, c, 3)
    # padding slots: the same finite far-away sentinel triangle as
    # scene/soa.py (valid=False keeps it from ever hitting)
    cp1 = np.full(shape3, _FAR, np.float32)
    cp2 = np.zeros(shape3, np.float32)
    cp3 = np.zeros(shape3, np.float32)
    cp1[..., 1:] = 0.0
    cp2[..., :] = (_FAR, 64.0, 0.0)
    cp3[..., :] = (_FAR, 0.0, 64.0)
    cmat = np.zeros((m, c), np.int32)
    cobj = np.full((m, c), 2**30, np.int32)
    corder = np.full((m, c), 2**30, np.int32)
    cmesh = np.zeros((m, c), bool)
    cvalid = np.zeros((m, c), bool)
    bmin = np.full((m, 3), np.inf, np.float32)
    bmax = np.full((m, 3), -np.inf, np.float32)

    tri_mat = np.asarray(soa.tri_mat)
    tri_obj = np.asarray(soa.tri_obj)
    tri_mesh = np.asarray(soa.tri_mesh)

    for mi, idx in enumerate(leaves):
        k = len(idx)
        cp1[mi, :k] = p1[idx]
        cp2[mi, :k] = p2[idx]
        cp3[mi, :k] = p3[idx]
        cmat[mi, :k] = tri_mat[idx]
        cobj[mi, :k] = tri_obj[idx]
        corder[mi, :k] = idx
        cmesh[mi, :k] = tri_mesh[idx] >= 0
        cvalid[mi, :k] = valid[idx]
        live = idx[valid[idx]]
        if len(live):
            pts = np.concatenate([p1[live], p2[live], p3[live]])
            bmin[mi] = pts.min(0)
            bmax[mi] = pts.max(0)

    return TriClusters(
        p1=jnp.asarray(cp1),
        p2=jnp.asarray(cp2),
        p3=jnp.asarray(cp3),
        mat=jnp.asarray(cmat),
        obj=jnp.asarray(cobj),
        order=jnp.asarray(corder),
        is_mesh=jnp.asarray(cmesh),
        valid=jnp.asarray(cvalid),
        bmin=jnp.asarray(bmin),
        bmax=jnp.asarray(bmax),
    )


def slab_test(bmin, bmax, o, d):
    """Vectorized AABB slab test (default_schema.hpp:99-114, tavianator
    variant with tmin initialized to 0): (R,3) rays x (M,3) boxes ->
    (R,M) bool."""
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


def flattened_cluster_candidates(clusters: TriClusters):
    """A ray_cast tri_candidates provider over the clustered (reordered,
    sentinel-padded) buffers — no culling, one dense cast. The semantics
    oracle for the Pallas culling kernel: it validates that clustering
    (permutation, padding, per-cluster AABBs aside) is hit-for-hit
    equivalent to the scene-order brute force."""
    m, c = clusters.mat.shape
    flat = _FlatView(
        tri_p1=clusters.p1.reshape(m * c, 3),
        tri_p2=clusters.p2.reshape(m * c, 3),
        tri_p3=clusters.p3.reshape(m * c, 3),
        tri_obj=clusters.order.reshape(m * c),
        tri_valid=clusters.valid.reshape(m * c),
        scene_center=jnp.zeros(3, jnp.float32),
    )
    obj = clusters.obj.reshape(m * c)
    mat = clusters.mat.reshape(m * c)
    order = clusters.order.reshape(m * c)
    is_mesh = clusters.is_mesh.reshape(m * c)

    def provider(soa, o, d, min_dist, o0):
        t, idx = I.cast_triangles(flat, o, d, min_dist, o0)
        return I.TriCandidate(
            t=t,
            obj=obj[idx],
            order=order[idx],
            mat=mat[idx],
            is_mesh=is_mesh[idx],
            p1=flat.tri_p1[idx],
            p2=flat.tri_p2[idx],
            p3=flat.tri_p3[idx],
        )

    return provider
