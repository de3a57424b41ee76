"""Vectorized nearest-hit ray cast over the SoA scene.

TPU-native re-design of the reference's per-thread linear object scan
(/root/reference/inc/ray_cast.hpp:29-55) and the per-primitive `intersect`
methods (/root/reference/inc/default_schema.hpp:57-78 triangle, :99-144 mesh,
:189-201 plane, :226-251 sphere): instead of a variant-dispatch loop per ray,
each primitive kind is intersected for a whole ray batch at once, and the
per-(ray, triangle) Cramer determinants are rewritten as ray-by-primitive
matmuls so the MXU does the heavy lifting:

    det[a, b, d]       = d . n           with n  = (p2-p1) x (p2-p3)
    det[p2-o, b, d]    = d . (p2 x b) - (d x o) . b
    det[a, p2-o, d]    = (d x o) . a - d . (p2 x a)
    det[a, b, p2-o]    = p2 . n - o . n

(scalar-triple-product identities; a = p2-p1, b = p2-p3). Every term is an
(R,3) @ (3,T) contraction plus elementwise work — no (R,T,3) intermediates.

Selection parity: the reference keeps strictly-closer hits scanning objects
in scene order (first minimal object wins ties, ray_cast.hpp:43-51); here
each kind argmin-selects its first minimal primitive (flattening preserved
scene order) and kinds are combined by (t, obj_index) lexicographic min.
Known deviation (measure-zero): if a mesh's *internal* best triangle lands
exactly at t == min_dist while a farther triangle of the same mesh also hits,
the reference discards the whole mesh (its intersect returns only the
internal best, default_schema.hpp:125-144) whereas we pick the farther
triangle. This requires exact float equality t == min_dist to manifest.

All math is float32, matching the reference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.inf
# np scalar, not jnp: a module-level jnp constant initializes the
# XLA backend at import time, breaking jax.distributed.initialize()
_BIG_I32 = np.int32(2**31 - 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord:
    """Per-ray nearest-hit data (out-params of ray_cast.hpp:34-41)."""

    hit: jax.Array  # (R,) bool
    t: jax.Array  # (R,) f32, +inf on miss
    obj: jax.Array  # (R,) i32 scene object index (n_objects on miss)
    mat: jax.Array  # (R,) i32 material index (0 on miss)
    point: jax.Array  # (R,3) f32
    normal: jax.Array  # (R,3) f32, zeros on miss
    uv: jax.Array  # (R,2) f32


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(a):
    return a / jnp.sqrt(_dot(a, a))[..., None]


def _mm(rays, prims):
    """(R,3) x (T,3) -> (R,T) contraction, MXU-shaped.

    Precision HIGHEST: on TPU the default f32 "matmul" truncates operands to
    bfloat16 on the MXU, which costs ~3 decimal digits of ray-geometry
    precision — far outside the 1e-3 parity gate. HIGHEST requests the
    full-f32 multi-pass decomposition."""
    return jax.lax.dot_general(
        rays,
        prims,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _first_min(t, order):
    """Index of the minimal t; ties broken by the smaller `order` value.

    jnp.argmin alone returns the first occurrence, but we keep the explicit
    order key so callers can pass scene-object order when array order and
    scene order disagree (they agree for within-kind selection; the key
    matters for the cross-kind combine)."""
    tmin = jnp.min(t, axis=-1, keepdims=True)
    key = jnp.where(t == tmin, order, _BIG_I32)
    return jnp.argmin(key, axis=-1)


# --- triangles --------------------------------------------------------------


def cast_triangles(soa, o, d, min_dist, o0=None):
    """Nearest triangle hit per ray; returns (t, idx) with t=+inf on miss.

    Mirrors triangle::intersect (default_schema.hpp:57-78) with the
    determinant algebra rewritten as matmuls (module docstring). `o0` is a
    recentering origin (defaults to soa.scene_center): the reference
    subtracts positions before any products (p2 - o,
    default_schema.hpp:62), so its f32 rounding stays proportional to the
    *local* geometry; the matmul identities instead produce pairs of large
    near-cancelling terms (p2.n vs o.n). Shifting every position by o0
    (exact in infinite precision — all determinants are translation
    invariant) keeps both terms small and restores the reference's
    conditioning. o0 must be batch-independent for determinism."""
    if o0 is None:
        o0 = jax.lax.stop_gradient(soa.scene_center)
    o = o - o0
    p1, p2, p3 = soa.tri_p1 - o0, soa.tri_p2 - o0, soa.tri_p3 - o0
    a = p2 - p1  # (T,3)
    b = p2 - p3
    n = jnp.cross(a, b)  # (T,3)
    u_beta = jnp.cross(p2, b)
    u_gamma = jnp.cross(p2, a)
    k = _dot(p2, n)  # (T,)

    w = jnp.cross(d, o)  # (R,3)
    alpha = _mm(d, n)  # (R,T)
    beta_n = _mm(d, u_beta) - _mm(w, b)
    gamma_n = _mm(w, a) - _mm(d, u_gamma)
    t_n = k[None, :] - _mm(o, n)

    # Grad safety: alpha==0 lanes are invalid anyway; dividing by a safe
    # denominator keeps inf/NaN out of the forward so the backward pass
    # (which multiplies local grads by zero cotangents) stays finite.
    degenerate = alpha == 0.0
    inv = 1.0 / jnp.where(degenerate, 1.0, alpha)
    beta = beta_n * inv
    gamma = gamma_n * inv
    t = t_n * inv

    valid = (
        ~degenerate
        & (beta >= 0.0)
        & (gamma >= 0.0)
        & (beta + gamma <= 1.0)
        & jnp.isfinite(t)
        & (t > min_dist[:, None])
        & soa.tri_valid[None, :]
    )
    t = jnp.where(valid, t, INF)
    idx = _first_min(t, soa.tri_obj[None, :])
    return jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0], idx


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriCandidate:
    """Per-ray best-triangle candidate, carrying the winning triangle's own
    geometry so hit attributes can be computed without a global gather —
    this is what lets the triangle buffer live sharded across devices
    (parallel/sharding.py) or come out of a BVH traversal."""

    t: jax.Array  # (R,) f32, +inf on miss
    obj: jax.Array  # (R,) i32 scene object index
    order: jax.Array  # (R,) i32 global flat triangle index (tie-break key)
    mat: jax.Array  # (R,) i32
    is_mesh: jax.Array  # (R,) bool
    p1: jax.Array  # (R,3) f32
    p2: jax.Array  # (R,3) f32
    p3: jax.Array  # (R,3) f32


def local_tri_candidates(soa, o, d, min_dist, o0=None, order_base=0):
    """Best triangle among soa's (possibly device-local) buffer, gathered
    into a TriCandidate. `order_base` offsets the tie-break key when the
    buffer is a shard of a larger scene-ordered array."""
    t, idx = cast_triangles(soa, o, d, min_dist, o0)
    return TriCandidate(
        t=t,
        obj=soa.tri_obj[idx],
        order=idx.astype(jnp.int32) + order_base,
        mat=soa.tri_mat[idx],
        is_mesh=soa.tri_mesh[idx] >= 0,
        p1=soa.tri_p1[idx],
        p2=soa.tri_p2[idx],
        p3=soa.tri_p3[idx],
    )


def combine_tri_candidates(stacked: TriCandidate) -> TriCandidate:
    """Reduce a (K, R, ...) stack of candidates (e.g. all-gathered from K
    primitive shards) to the per-ray winner: min t, ties to the smallest
    global `order` (scene order — matches ray_cast.hpp:43-51)."""
    t = stacked.t  # (K, R)
    tmin = jnp.min(t, axis=0, keepdims=True)
    key = jnp.where(t == tmin, stacked.order, _BIG_I32)
    k = jnp.argmin(key, axis=0)  # (R,)

    def pick(x):
        idx = k.reshape((1,) + k.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, idx, axis=0)[0]

    return jax.tree.map(pick, stacked)


def triangle_attrs_from_verts(p1, p2, p3, is_mesh, o, d, t, need_uv=True):
    """Hit attrs from explicit triangle corners.

    normal = -(p2-p3) x (p1-p3), normalized, never flipped toward the ray
    (default_schema.hpp:72 — the reference's "buggy normal map" kept for
    parity); uv per uv_for (default_schema.hpp:37-46); mesh triangles
    overwrite uv with (hit.x, hit.y) (default_schema.hpp:138-139)."""
    point = o + t[:, None] * d
    normal = _normalize(-jnp.cross(p2 - p3, p1 - p3))
    if not need_uv:
        return point, normal, point[:, :2]
    p2p1 = p2 - p1
    p3p1 = p3 - p1
    xp1 = point - p1
    u = jnp.abs(_dot(xp1, p2p1)) / _dot(p2p1, p2p1)
    v = jnp.abs(_dot(xp1, p3p1)) / _dot(p3p1, p3p1)
    uv = jnp.stack([u, v], axis=-1)
    uv = jnp.where(is_mesh[:, None], point[:, :2], uv)
    return point, normal, uv


# --- planes -----------------------------------------------------------------


def cast_planes(soa, o, d, min_dist, o0=None):
    """Point+normal plane intersect (default_schema.hpp:189-201). Recentered
    about o0 for conditioning (see cast_triangles). Plane counts are tiny,
    so the (R,P) products use plain VPU broadcasting — a (R,3)@(3,P) MXU
    matmul at HIGHEST precision costs ~10ms of multi-pass emulation for
    P=5 on a v5e."""
    if o0 is None:
        o0 = jax.lax.stop_gradient(soa.scene_center)
    o = o - o0
    n = soa.pl_normal  # (P,3)
    k = _dot(soa.pl_point - o0, n)  # (P,)
    denom = jnp.sum(d[:, None, :] * n[None, :, :], axis=-1)  # (R,P)
    parallel = denom == 0.0
    on = jnp.sum(o[:, None, :] * n[None, :, :], axis=-1)
    t = (k[None, :] - on) / jnp.where(parallel, 1.0, denom)
    valid = (
        ~parallel
        & jnp.isfinite(t)
        & (t > min_dist[:, None])
        & soa.pl_valid[None, :]
    )
    t = jnp.where(valid, t, INF)
    idx = _first_min(t, soa.pl_obj[None, :])
    return jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0], idx


def plane_hit_attrs(soa, o, d, t, idx, need_uv=True):
    """Plane hit attrs; uv axes per default_schema.hpp:169-178 (NaN uv when
    the plane normal is parallel to the z-axis — reference behavior)."""
    n = soa.pl_normal[idx]
    point_on = soa.pl_point[idx]
    point = o + t[:, None] * d
    if not need_uv:
        return point, n, point[:, :2]
    ax1 = jnp.stack([n[:, 1], -n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1)
    # Normal parallel to z => |ax1| = 0 => NaN uv in the reference; inject
    # the NaN from a constant branch so no NaN enters the backward pass.
    n1 = jnp.sqrt(_dot(ax1, ax1))
    degenerate = n1 == 0.0
    ax1 = jnp.where(
        degenerate[:, None],
        jnp.nan,
        ax1 / jnp.where(degenerate, 1.0, n1)[:, None],
    )
    ax2 = jnp.cross(n, ax1)
    mod = point_on - point
    uv = jnp.stack([_dot(ax1, mod), _dot(ax2, mod)], axis=-1)
    return point, n, uv


# --- spheres ----------------------------------------------------------------


def cast_spheres(soa, o, d, min_dist, o0=None):
    """Quadratic sphere intersect, both roots, t parametric w.r.t. the
    *normalized* direction (default_schema.hpp:226-251). Recentered about o0
    for conditioning (see cast_triangles)."""
    if o0 is None:
        o0 = jax.lax.stop_gradient(soa.scene_center)
    dn = _normalize(d)  # (R,3)
    o = o - o0
    c = soa.sp_center - o0  # (S,3)
    r2 = soa.sp_radius**2  # (S,)
    # Broadcast VPU form (see cast_planes — sphere counts are tiny too).
    # dec = -dn.(o - c) = dn.c - dn.o
    dnc = jnp.sum(dn[:, None, :] * c[None, :, :], axis=-1)  # (R,S)
    dec = dnc - _dot(dn, o)[:, None]
    # ec.ec = |o|^2 - 2 o.c + |c|^2
    oc = jnp.sum(o[:, None, :] * c[None, :, :], axis=-1)
    ec2 = _dot(o, o)[:, None] - 2.0 * oc + _dot(c, c)[None, :]
    sub = dec * dec - (ec2 - r2[None, :])
    # The reference treats sub == 0 (exact tangent) as a hit; we treat it as
    # a miss: sqrt'(0) = inf would otherwise poison the backward pass with
    # inf * 0 = NaN. Deviation only at exact float equality (measure zero).
    missed = sub <= 0.0
    # sqrt of a safe positive value: keeps the forward NaN-free (grad safety)
    sq = jnp.sqrt(jnp.where(missed, 1.0, sub))
    t0 = dec - sq
    t1 = dec + sq
    v0 = ~missed & jnp.isfinite(t0) & (t0 > min_dist[:, None])
    v1 = ~missed & jnp.isfinite(t1) & (t1 > min_dist[:, None])
    t = jnp.where(
        v0 & v1, jnp.minimum(t0, t1), jnp.where(v0, t0, jnp.where(v1, t1, INF))
    )
    valid = (v0 | v1) & soa.sp_valid[None, :]
    t = jnp.where(valid, t, INF)
    idx = _first_min(t, soa.sp_obj[None, :])
    return jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0], idx


def sphere_hit_attrs(soa, o, d, t, idx, need_uv=True):
    """Sphere hit attrs; spherical uv (default_schema.hpp:246-249)."""
    dn = _normalize(d)
    c = soa.sp_center[idx]
    point = o + t[:, None] * dn
    normal = _normalize(point - c)
    if not need_uv:
        return point, normal, point[:, :2]
    u = 0.5 + jnp.arctan2(normal[:, 2], normal[:, 0]) / (2.0 * jnp.pi)
    # arcsin'(+-1) is infinite; at the poles take the exact constant value
    # instead so the backward pass stays finite.
    y = normal[:, 1]
    pole = jnp.abs(y) >= 1.0
    v_safe = jnp.arcsin(jnp.clip(y, -0.999999, 0.999999)) / jnp.pi
    v = 0.5 + jnp.where(pole, jnp.sign(y) * 0.5, v_safe)
    return point, normal, jnp.stack([u, v], axis=-1)


# --- combined nearest-hit query --------------------------------------------


def ray_cast(
    soa, o, d, min_dist, tri_candidates=None, need_attrs=True, need_uv=True
) -> HitRecord:
    """Nearest hit over all primitive kinds (ray_cast.hpp:29-55).

    o, d: (R,3) f32; min_dist: scalar or (R,) f32 (strict lower bound on t,
    matching `dist > min_dist` at ray_cast.hpp:44). Misses get t=+inf,
    normal=0, obj=n_objects (the reference leaves hit_id at objects.size,
    kernel.hpp:47).

    `tri_candidates(soa, o, d, min_dist, o0) -> TriCandidate` overrides the
    triangle query — the hook for BVH traversal and for primitive-sharded
    casting (parallel/sharding.py). Default: brute-force local scan.

    `need_attrs=False` skips point/normal/uv entirely (zeros returned) —
    shadow marches only consume (hit, t, mat), and attribute math for all
    three kinds plus the selection merge is a large share of a cast.
    `need_uv=False` skips just the uv math (only the top-level primary
    cast feeds the uv output)."""
    min_dist = jnp.broadcast_to(jnp.asarray(min_dist, jnp.float32), o.shape[:1])
    o0 = jax.lax.stop_gradient(soa.scene_center)

    if tri_candidates is None:
        tri_candidates = local_tri_candidates
    tri = tri_candidates(soa, o, d, min_dist, o0)
    t_pl, i_pl = cast_planes(soa, o, d, min_dist, o0)
    t_sp, i_sp = cast_spheres(soa, o, d, min_dist, o0)

    ts = jnp.stack([tri.t, t_pl, t_sp], axis=-1)  # (R,3)
    objs = jnp.stack([tri.obj, soa.pl_obj[i_pl], soa.sp_obj[i_sp]], axis=-1)
    kind = _first_min(ts, objs)  # (R,) 0=tri 1=plane 2=sphere
    t = jnp.take_along_axis(ts, kind[:, None], axis=1)[:, 0]
    hit = jnp.isfinite(t)

    def pick(a, b, c):
        k = kind.reshape(kind.shape + (1,) * (a.ndim - 1))
        return jnp.where(k == 0, a, jnp.where(k == 1, b, c))

    mat = pick(tri.mat, soa.pl_mat[i_pl], soa.sp_mat[i_sp])
    obj = jnp.take_along_axis(objs, kind[:, None], axis=1)[:, 0]

    if not need_attrs:
        zero3 = jnp.zeros(o.shape, o.dtype)
        return HitRecord(
            hit=hit,
            t=t,
            obj=jnp.where(hit, obj, soa.n_objects),
            mat=jnp.where(hit, mat, 0),
            point=zero3,
            normal=zero3,
            uv=jnp.zeros(o.shape[:1] + (2,), o.dtype),
        )

    t_safe = jnp.where(hit, t, 1.0)  # keep attr math NaN-free on misses

    p_tri, n_tri, uv_tri = triangle_attrs_from_verts(
        tri.p1, tri.p2, tri.p3, tri.is_mesh, o, d, t_safe, need_uv
    )
    p_pl, n_pl, uv_pl = plane_hit_attrs(soa, o, d, t_safe, i_pl, need_uv)
    p_sp, n_sp, uv_sp = sphere_hit_attrs(soa, o, d, t_safe, i_sp, need_uv)

    point = pick(p_tri, p_pl, p_sp)
    normal = pick(n_tri, n_pl, n_sp)
    uv = pick(uv_tri, uv_pl, uv_sp)

    zero3 = jnp.zeros_like(point)
    return HitRecord(
        hit=hit,
        t=t,
        obj=jnp.where(hit, obj, soa.n_objects),
        mat=jnp.where(hit, mat, 0),
        point=jnp.where(hit[:, None], point, zero3),
        normal=jnp.where(hit[:, None], normal, zero3),
        uv=jnp.where(hit[:, None], uv, jnp.zeros_like(uv)),
    )
