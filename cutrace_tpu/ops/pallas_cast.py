"""Pallas TPU kernel: cluster-culled nearest-triangle query.

This is where the BVH speedup actually lands (ops/bvh.py builds the
clusters). Kernel shape, chosen for the TPU's compute model:

  * grid over ray tiles of TILE_R rays, rays on sublanes: per-ray data is
    (TILE_R, 1), per-(ray, triangle) data is a dense (TILE_R, C) tile with
    the cluster's C triangles on lanes. (Mosaic cannot dynamically index
    the lane dimension, so cluster constants are (M, C) arrays whose
    cluster row is a sublane-dynamic slice — the transposed layout does
    not compile.)
  * the cull decision is NOT made in the kernel: a vector->scalar
    reduction per cluster stalls the scalar core ~1us each (measured: 16
    clusters x 1024 tiles of in-kernel `any()` cost more than the culled
    compute). Instead XLA computes a per-(tile, cluster) hit bitmask with
    one batched slab test, and the kernel receives it as a scalar-prefetch
    SMEM table — `@pl.when(hits[i, mi] > 0)` is a pure scalar-core read.
    Primary rays are coherent, so most tiles skip most clusters: 2-level
    BVH traversal with divergence paid once per (tile x cluster).
  * the kernel returns only the winner's ORIGINAL flat triangle index (+ t)
    — the discrete part of the query. The caller re-derives t and hit
    attributes for that single triangle in plain JAX, so jax.grad works
    through the continuous math with no custom_vjp — exactly the
    fixed-topology differentiation contract (diff/grad.py).

Nearest-hit semantics match ray_cast.hpp:43-51: strictly-closer wins, ties
to the smallest original flat index (scene order), both within a cluster
(lane min over (t, order)) and across clusters (merge refs in the
fori_loop over clusters).

Intersection math is the recentered identity form of ops/intersect.py, with
per-triangle constants precomputed per cluster:
  alpha = d.n    beta = (d.ub - w.b)/alpha    gamma = (w.a - d.ug)/alpha
  t = (k - o.n)/alpha            with w = d x o,  all positions - o0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cutrace_tpu.ops import intersect as I
from cutrace_tpu.ops.bvh import TriClusters

TILE_R = 512
_BIG = 2**30  # python int: inline literal inside the kernel


def _cluster_constants(c: TriClusters, o0):
    """Per-triangle constants, recentered by o0: dict of (M, C) arrays; a
    cluster is a (1, C) sublane-dynamic row slice in the kernel."""
    p1 = c.p1 - o0
    p2 = c.p2 - o0
    p3 = c.p3 - o0
    a = p2 - p1
    b = p2 - p3
    n = jnp.cross(a, b)
    ub = jnp.cross(p2, b)
    ug = jnp.cross(p2, a)
    k = jnp.sum(p2 * n, axis=-1)
    out = {}
    for name, arr in (("n", n), ("ub", ub), ("ug", ug), ("a", a), ("b", b)):
        for ax in range(3):
            out[f"{name}{ax}"] = arr[..., ax]  # (M, C)
    out["k"] = k
    out["order"] = c.order.astype(jnp.int32)
    out["valid"] = c.valid.astype(jnp.float32)
    return out


_CONST_NAMES = (
    "n0", "n1", "n2", "ub0", "ub1", "ub2", "ug0", "ug1", "ug2",
    "a0", "a1", "a2", "b0", "b1", "b2", "k", "order", "valid",
)


def _cast_kernel(n_clusters, tile_r, hits_ref, rays_ref, *rest):
    n_words = -(-n_clusters // 32)
    const_refs = dict(zip(_CONST_NAMES, rest[:len(_CONST_NAMES)]))
    t_out, ord_out, bt_s, bo_s = rest[len(_CONST_NAMES):]

    i = pl.program_id(0)
    ox = rays_ref[:, 0:1]  # (TILE_R, 1)
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    md = rays_ref[:, 6:7]
    # w = d x o (per ray)
    wx = dy * oz - dz * oy
    wy = dz * ox - dx * oz
    wz = dx * oy - dy * ox

    bt_s[:] = jnp.full((tile_r, 1), jnp.inf, jnp.float32)
    bo_s[:] = jnp.full((tile_r, 1), _BIG, jnp.int32)

    def visit(mi):
            col = lambda name: const_refs[name][pl.ds(mi, 1), :]  # (1, C)
            n0, n1, n2 = col("n0"), col("n1"), col("n2")
            alpha = dx * n0 + dy * n1 + dz * n2  # (TILE_R, C)
            beta_n = (
                dx * col("ub0") + dy * col("ub1") + dz * col("ub2")
                - (wx * col("b0") + wy * col("b1") + wz * col("b2"))
            )
            gamma_n = (
                wx * col("a0") + wy * col("a1") + wz * col("a2")
                - (dx * col("ug0") + dy * col("ug1") + dz * col("ug2"))
            )
            t_n = col("k") - (ox * n0 + oy * n1 + oz * n2)

            degenerate = alpha == 0.0
            inv = 1.0 / jnp.where(degenerate, 1.0, alpha)
            beta = beta_n * inv
            gamma = gamma_n * inv
            t = t_n * inv
            valid = (
                (~degenerate)
                & (beta >= 0.0)
                & (gamma >= 0.0)
                & (beta + gamma <= 1.0)
                & jnp.isfinite(t)
                & (t > md)
                & (col("valid") > 0.0)
            )
            t = jnp.where(valid, t, jnp.inf)

            tmin_r = jnp.min(t, axis=1, keepdims=True)  # (TILE_R, 1)
            key = jnp.where(t == tmin_r, col("order"), _BIG)
            kmin = jnp.min(key, axis=1, keepdims=True)
            kmin = jnp.where(jnp.isfinite(tmin_r), kmin, _BIG)

            best_t = bt_s[:]
            best_ord = bo_s[:]
            better = (tmin_r < best_t) | (
                (tmin_r == best_t) & (kmin < best_ord)
            )
            bt_s[:] = jnp.where(better, tmin_r, best_t)
            bo_s[:] = jnp.where(better, kmin, best_ord)

    # Word-skip loop over the bit-packed cull mask (flat 1-D prefetch
    # words, like ops/fused.py: a 2-D (n_tiles, M) SMEM operand is padded
    # to (8, 128) tiles and blows the 1 MiB SMEM for big M or many
    # tiles). An empty 32-cluster word costs one scalar branch.
    def wbody(w, _):
        word = hits_ref[i * n_words + w]

        @pl.when(word != 0)
        def _():
            def bbody(b, _):
                @pl.when(((word >> b) & 1) != 0)
                def _():
                    # mask bits beyond n_clusters are never set
                    visit(w * 32 + b)
                return 0

            jax.lax.fori_loop(0, min(32, n_clusters), bbody, 0)
        return 0

    jax.lax.fori_loop(0, n_words, wbody, 0)
    t_out[:] = bt_s[:]
    ord_out[:] = bo_s[:]


def _ceil_to(x, m):
    return -(-x // m) * m


# Clusters per VMEM-resident kernel invocation. Bigger partitions stream
# in chunks of this size via lax.map (tables live in HBM, each chunk's
# tables are DMA'd to VMEM by its pallas_call) — scene size is then
# bounded by HBM, not VMEM. 1024 clusters x C=64 is ~4.7 MB of tables.
M_CHUNK = 1024


def _pack_tile_words(tile_hits):
    """(n_tiles, M) bool -> flat (n_tiles * ceil(M/32),) int32 words."""
    n_tiles, m = tile_hits.shape
    w = -(-m // 32)
    padded = jnp.zeros((n_tiles, w * 32), jnp.uint32)
    padded = padded.at[:, :m].set(tile_hits.astype(jnp.uint32))
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jax.lax.bitcast_convert_type(
        jnp.sum(padded.reshape(n_tiles, w, 32) << shifts, axis=-1,
                dtype=jnp.uint32),
        jnp.int32,
    ).reshape(n_tiles * w)


def _cast_resident(consts, bmin, bmax, rays, interpret, tile_r):
    """One VMEM-resident kernel sweep over all clusters in `consts`.
    rays: (R_pad, 7) padded. Returns (t (R_pad,), order (R_pad,))."""
    from cutrace_tpu.ops.bvh import slab_test

    m = bmin.shape[0]
    r_pad = rays.shape[0]
    n_tiles = r_pad // tile_r
    # XLA-side cull: (R_pad, M) slab -> per-(tile, cluster) any(), packed
    # into int32 words (SMEM prefetch operands are tiny this way).
    ray_hits = slab_test(bmin, bmax, rays[:, 0:3], rays[:, 3:6])
    tile_hits = ray_hits.reshape(n_tiles, tile_r, m).any(axis=1)
    # padding clusters (valid-all-zero) must not be visited
    live = (consts["valid"] > 0.0).any(axis=1)
    hits = _pack_tile_words(tile_hits & live[None, :])

    # Constant-index block specs for the cluster tables: the pipeline skips
    # the HBM->VMEM copy when a block's index is unchanged between grid
    # steps, so the tables are fetched once, not once per ray tile.
    c_dim = consts["k"].shape[1]
    const_spec = lambda: pl.BlockSpec((m, c_dim), lambda i, s: (0, 0),
                                      memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # packed cull words
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_r, 7), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [const_spec() for _ in _CONST_NAMES],
        out_specs=(
            pl.BlockSpec((tile_r, 1), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_r, 1), jnp.float32),
            pltpu.VMEM((tile_r, 1), jnp.int32),
        ],
    )
    t, order = pl.pallas_call(
        functools.partial(_cast_kernel, m, tile_r),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(hits, rays, *[consts[k] for k in _CONST_NAMES])
    return t[:, 0], order[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_r"))
def _run_cast(consts, bmin, bmax, o, d, min_dist, interpret, tile_r=TILE_R):
    """Pad rays to tile_r, run the kernel, return (t (R,), order (R,)).

    o must already be recentered (o - o0); bmin/bmax are the recentered
    (M, 3) cluster AABBs (used only for the XLA-side cull bitmask).
    Partitions over M_CHUNK clusters stream chunk-by-chunk (lax.map) and
    combine by (t, order) lexicographic min — same winner as one sweep."""
    m = bmin.shape[0]
    r = o.shape[0]
    r_pad = _ceil_to(r, tile_r)
    pad = r_pad - r

    def pad1(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    rays = jnp.stack(
        [pad1(o[:, 0], 0.0), pad1(o[:, 1], 0.0), pad1(o[:, 2], 0.0),
         pad1(d[:, 0], 1.0), pad1(d[:, 1], 1.0), pad1(d[:, 2], 1.0),
         pad1(min_dist, jnp.inf)],
        axis=1,
    )  # (R_pad, 7)

    if m <= M_CHUNK:
        t, order = _cast_resident(consts, bmin, bmax, rays, interpret,
                                  tile_r)
        return t[:r], order[:r]

    # streamed chunks: pad M, stack to (K, M_CHUNK, ...), sweep via map
    k = -(-m // M_CHUNK)
    m_pad = k * M_CHUNK

    def padm(x, fill):
        if m_pad == m:
            return x
        return jnp.concatenate(
            [x, jnp.full((m_pad - m,) + x.shape[1:], fill, x.dtype)]
        )

    stk = lambda x: x.reshape(k, M_CHUNK, *x.shape[1:])
    consts_s = {
        n: stk(padm(consts[n], 0 if n != "order" else _BIG))
        for n in _CONST_NAMES
    }
    # padded clusters are culled via their all-zero "valid" table rows
    # (_cast_resident's `live` mask), so the AABB fill value is irrelevant
    bmin_s = stk(padm(bmin, 1.0e8))
    bmax_s = stk(padm(bmax, 1.0e8))

    r_pad = rays.shape[0]

    def body(chunk):
        consts_c, bmn, bmx = chunk
        # conditional chunk execution: when no ray tile touches any live
        # cluster of this chunk, skip the kernel entirely — XLA's cond
        # runs only the taken branch, so the chunk's tables are never
        # DMA'd to VMEM (the slab test below reads only the (M_CHUNK, 3)
        # AABBs). Localized queries touch a few chunks of a huge scene.
        from cutrace_tpu.ops.bvh import slab_test

        live = (consts_c["valid"] > 0.0).any(axis=1)
        any_hit = jnp.any(
            slab_test(bmn, bmx, rays[:, 0:3], rays[:, 3:6]) & live[None, :]
        )
        return jax.lax.cond(
            any_hit,
            lambda: _cast_resident(consts_c, bmn, bmx, rays, interpret,
                                   tile_r),
            lambda: (jnp.full((r_pad,), jnp.inf, jnp.float32),
                     jnp.full((r_pad,), _BIG, jnp.int32)),
        )

    ts, orders = jax.lax.map(body, (consts_s, bmin_s, bmax_s))  # (K, R_pad)
    t_best = jnp.min(ts, axis=0)
    key = jnp.where(ts == t_best[None, :], orders, _BIG)
    o_best = jnp.min(key, axis=0)
    o_best = jnp.where(jnp.isfinite(t_best), o_best, _BIG)
    return t_best[:r], o_best[:r]


def pallas_candidates(soa, accel, o, d, min_dist, o0, order_base=0):
    """ray_cast triangle query backed by the culling kernel, for an
    ops.bvh.Accel partition.

    Runs inside the caller's trace: cluster geometry is gathered from the
    LIVE soa.tri_* arrays (ops.bvh.clusters_from_accel), so the kernel
    always culls against the current vertex positions. The kernel picks
    only the winner's original flat triangle index (discrete, gradient-
    stopped); the winner's vertices are then re-gathered from soa.tri_p1/
    p2/p3 by that index and t is re-derived in plain JAX — the continuous
    math stays attached to the parameters, so `jax.grad` w.r.t. vertices
    flows exactly as in the brute-force path (the round-1 zero-gradient
    defect this signature replaces)."""
    from cutrace_tpu.ops import bvh

    sg = jax.lax.stop_gradient
    clusters = bvh.clusters_from_accel(soa, accel)
    consts = _cluster_constants(sg(clusters), o0)
    t_kernel, order = _run_cast(
        consts, sg(clusters.bmin) - o0, sg(clusters.bmax) - o0,
        sg(o - o0), sg(d), sg(min_dist), accel.interpret,
    )
    miss = order >= _BIG

    # One packed row per ORIGINAL triangle (p1 p2 p3 | mat obj mesh | pad
    # to 16): a single 16-lane row gather is ~3x cheaper on TPU than ten
    # scattered element gathers (measured). Built from the live buffers in
    # trace, so it is differentiable and never stale; XLA CSEs the concat
    # across cast sites.
    tcount = soa.tri_p1.shape[0]
    packed = jnp.concatenate(
        [
            soa.tri_p1, soa.tri_p2, soa.tri_p3,
            soa.tri_mat[:, None].astype(jnp.float32),
            soa.tri_obj[:, None].astype(jnp.float32),
            (soa.tri_mesh >= 0)[:, None].astype(jnp.float32),
            jnp.zeros((tcount, 4), jnp.float32),
        ],
        axis=1,
    )
    safe = jnp.clip(jnp.where(miss, 0, order), 0, tcount - 1)
    row = packed[safe]  # (R, 16) single gather
    p1 = row[:, 0:3]
    p2 = row[:, 3:6]
    p3 = row[:, 6:9]
    r_mat = row[:, 9].astype(jnp.int32)
    r_obj = row[:, 10].astype(jnp.int32)
    r_mesh = row[:, 11] > 0.0
    # Re-derive t differentiably for the winning triangle only.
    op = o - o0
    a = (p2 - o0) - (p1 - o0)
    b = (p2 - o0) - (p3 - o0)
    n = jnp.cross(a, b)
    alpha = jnp.sum(d * n, axis=-1)
    t_n = jnp.sum(((p2 - o0) - op) * n, axis=-1)
    alpha_safe = jnp.where(alpha == 0.0, 1.0, alpha)
    t = t_n / alpha_safe
    t = jnp.where(miss | (alpha == 0.0), jnp.inf, t)

    from cutrace_tpu.ops.bvh import _offset_order

    return I.TriCandidate(
        t=t,
        obj=jnp.where(miss, _BIG, r_obj),
        order=_offset_order(jnp.where(miss, _BIG, order), order_base),
        mat=jnp.where(miss, 0, r_mat),
        is_mesh=r_mesh & ~miss,
        p1=p1,
        p2=p2,
        p3=p3,
    )
