"""Vectorized Phong shading, shadow march, and the unrolled bounce tree.

TPU-native re-design of /root/reference/inc/shading.hpp: the reference's
per-thread recursion (`ray_color`, shading.hpp:116-154) becomes a wavefront
evaluation over whole ray batches — one batched cast+shade per tree LEVEL,
with path weights carrying the reference's exact blend coefficients (see
ray_color). Branch pruning is compile-time: scenes without reflective
(resp. transparent) materials never spawn that child (the reference's
`if(is_reflecting(...))` can never be true), so e.g. bunny.json evaluates
one node per level instead of a binary tree.

The unbounded shadow-march `while` (shading.hpp:22-45) becomes a fixed
`soa.shadow_steps`-step masked march — exact whenever the number of
transparent occluders along any shadow ray is below the cap (scene_to_soa
picks 1 for fully-opaque scenes, where one step saturates).

Accumulation-order parity (the "hard part" per SURVEY.md §7): reflection
*adds* `refl * child` first, transparency then *blends* the whole sum:
`rgb = (1-t)·rgb + t·child` (shading.hpp:126-150) — preserved verbatim.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cutrace_tpu.ops import intersect as I

_EPS = 1e-6  # material activity threshold (default_schema.hpp:334-335)
# np, not jnp: a module-level device constant would initialize the XLA
# backend at import time, breaking jax.distributed.initialize()
_UNIT_Z = np.asarray([0.0, 0.0, 1.0], np.float32)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _norm(a):
    return jnp.sqrt(_dot(a, a))


def _normalize(a):
    return a / _norm(a)[..., None]


def _reflect(incoming, normal):
    # vector.hpp:204-206
    return incoming - 2.0 * _dot(normal, incoming)[..., None] * normal


def shadow_intensity(soa, o, d, max_dist, tri_candidates=None):
    """Masked shadow march (shading.hpp:22-45): accumulate (1-transparency)
    per occluder from min_dist = last_hit + 1e-3 until opacity >= 1 or the
    march passes the light. Returns (R,) intensity in [0, 1]."""
    R = o.shape[0]
    intensity = jnp.zeros(R, jnp.float32)
    last_hit = jnp.zeros(R, jnp.float32)
    active = jnp.ones(R, bool)
    for _ in range(soa.shadow_steps):
        # shadow marching consumes only (hit, t, mat): skip attribute math
        hit = I.ray_cast(soa, o, d, last_hit + 1e-3, tri_candidates,
                         need_attrs=False)
        ok = active & hit.hit & (hit.t < max_dist)
        transp = soa.mat_transparency[hit.mat]
        intensity = intensity + jnp.where(ok, 1.0 - transp, 0.0)
        last_hit = jnp.where(ok, hit.t, last_hit)
        active = ok & (intensity < 1.0)
    return jnp.where(intensity >= 1.0, 1.0, intensity)


def light_direction_to(soa, i, point):
    """get_direction_to for light slot i (static index): sun returns the raw
    negated direction with infinite distance (default_schema.hpp:280-283),
    point lights a normalized direction with Euclidean distance (:305-308)."""
    vec = soa.light_vec[i]
    is_sun = soa.light_kind[i] == 0
    diff = vec[None, :] - point
    dist = _norm(diff)
    direction = jnp.where(is_sun, -vec[None, :], diff / dist[:, None])
    distance = jnp.where(is_sun, jnp.inf, dist)
    return direction, distance


def phong(soa, d, hit: I.HitRecord, tri_candidates=None):
    """Phong shading with shadows for a batch of hits (shading.hpp:64-99).

    final = ambient·diffuse
          + Σ_lights (1-shadow)·(max(0,n·l)·diffuse·c + max(0,n·h)^p·spec·c)

    with specular = mat.specular · mat.color (get_phong_params,
    default_schema.hpp:326-332) and h the half vector. Returns (R,3);
    only meaningful where hit.hit (caller masks)."""
    diffuse = soa.mat_color[hit.mat]  # (R,3)
    spec_f = soa.mat_specular[hit.mat]
    phong_e = soa.mat_phong[hit.mat]
    specular = spec_f[:, None] * diffuse

    # NaN-safe geometry on miss lanes (masked out by the caller).
    nrm = jnp.where(hit.hit[:, None], hit.normal, _UNIT_Z[None, :])
    nn = _normalize(nrm)
    minus_dn = -_normalize(d)

    final = soa.ambient * diffuse
    if soa.n_lights == 0:
        return final

    # All lights' shadow rays march in ONE batched cast per step (the
    # reference loops lights per thread, shading.hpp:78-96; semantics are
    # per-ray independent, so stacking L copies of the hit points into a
    # (L*R,) ray batch changes nothing except cast count: one scene query
    # per march step instead of one per light per step).
    R = hit.point.shape[0]
    sdirs, light_dists = [], []
    for i in range(soa.n_lights):
        direction, distance = light_direction_to(soa, i, hit.point)
        sdirs.append(_normalize(direction))
        # shading.hpp:80 — max_dist = distance * |direction| (sun: inf)
        light_dists.append(distance * _norm(direction))
    origins = jnp.tile(hit.point, (soa.n_lights, 1))
    shadow_all = shadow_intensity(
        soa,
        origins,
        jnp.concatenate(sdirs, axis=0),
        jnp.concatenate(light_dists, axis=0),
        tri_candidates,
    ).reshape(soa.n_lights, R)

    for i in range(soa.n_lights):
        sdir = sdirs[i]
        color = soa.light_color[i][None, :]
        shadow = shadow_all[i]
        lit = shadow < 1.0

        # max(0, x) with CUDA fmaxf semantics: NaN -> 0. A zero-direction
        # sun produces NaN dot products; the reference's fmaxf drops them
        # to 0 and shades those pixels ambient-only (shading.hpp:86-88).
        fdd = _dot(nn, sdir)
        fd = jnp.where(fdd > 0.0, fdd, 0.0)
        hvec = _normalize(minus_dn + sdir)
        # fs = max(0, n.h)^exp (shading.hpp:88). Computed via the double-
        # where pattern: at base == 0 the value is 0 but d/d(exp) of
        # base**exp is 0^exp * log(0) = NaN — evaluate the pow at a safe
        # base and select the exact 0 from a constant branch instead.
        bdd = _dot(nn, hvec)
        base = jnp.where(bdd > 0.0, bdd, 0.0)
        backfacing = base <= 0.0
        fs = jnp.where(
            backfacing, 0.0, jnp.where(backfacing, 1.0, base) ** phong_e
        )
        contrib = fd[:, None] * (diffuse * color) + fs[:, None] * (specular * color)
        final = final + jnp.where(
            lit[:, None], (1.0 - shadow)[:, None] * contrib, 0.0
        )
    return final


def ray_color(soa, o, d, min_t, bounces: int, tri_candidates=None):
    """Bounce color, evaluated wavefront-style (one batched cast per tree
    LEVEL instead of per tree node). Returns (R,3) linear RGB.

    The reference recursion (shading.hpp:116-154)

        rgb = phong
        if reflecting:  rgb += r * C(reflected)
        if transparent: rgb  = (1-f) * rgb + f * C(straight)

    is affine in both children: C(node) = (1-f)·phong + (1-f)·r·C(refl)
    + f·C(straight). Unrolling that linearity gives

        color = Σ_nodes  w(node) · (1-f(node)) · phong(node)
        w(root) = 1;  w(refl-child) = w·(1-f)·r;  w(straight-child) = w·f

    (leaves use w·phong — no blend happens at bounce depth 0). All nodes of
    one depth share a single ray_cast/phong over a (n_nodes·R) ray batch,
    so the compiled program grows linearly with `bounces` while the
    reference's 2^bounces tree semantics (and its accumulation values) are
    preserved; only fp summation order differs. Branches a scene's
    materials can never spawn are pruned at trace time (soa.any_*)."""
    R = o.shape[0]
    min_t = jnp.broadcast_to(jnp.asarray(min_t, jnp.float32), (R,))

    color = jnp.zeros((R, 3), jnp.float32)
    os_, ds_ = o, d
    ws = jnp.ones((R,), jnp.float32)

    for level in range(bounces + 1):
        n_nodes = os_.shape[0] // R
        mt = jnp.tile(min_t, n_nodes)
        # uv never feeds shading; only the primary depth/normal cast
        # (render_rays) needs it
        hit = I.ray_cast(soa, os_, ds_, mt, tri_candidates, need_uv=False)
        ph = jnp.where(
            hit.hit[:, None], phong(soa, ds_, hit, tri_candidates), 0.0
        )

        last = level == bounces or not (soa.any_reflective or soa.any_transparent)
        if last:
            contrib = ws[:, None] * ph
            color = color + contrib.reshape(n_nodes, R, 3).sum(axis=0)
            break

        tr = soa.mat_transparency[hit.mat]
        f = jnp.where(hit.hit & (tr >= _EPS), tr, 0.0) if soa.any_transparent \
            else jnp.zeros_like(ws)
        contrib = (ws * (1.0 - f))[:, None] * ph
        color = color + contrib.reshape(n_nodes, R, 3).sum(axis=0)

        t_safe = jnp.where(hit.hit, hit.t, 1.0)
        child_o = os_ + t_safe[:, None] * ds_  # shading.hpp:131,144
        next_o, next_d, next_w = [], [], []
        if soa.any_reflective:
            nrm = jnp.where(hit.hit[:, None], hit.normal, _UNIT_Z[None, :])
            refl_d = _reflect(_normalize(ds_), _normalize(nrm))
            refl = soa.mat_reflect[hit.mat]
            r = jnp.where(hit.hit & (refl >= _EPS), refl, 0.0)
            next_o.append(child_o)
            next_d.append(refl_d)
            next_w.append(ws * (1.0 - f) * r)
        if soa.any_transparent:
            next_o.append(child_o)
            next_d.append(ds_)
            next_w.append(ws * f)
        os_ = jnp.concatenate(next_o, axis=0)
        ds_ = jnp.concatenate(next_d, axis=0)
        ws = jnp.concatenate(next_w, axis=0)

    return color


def ray_color_recursive(soa, o, d, min_t, bounces: int, tri_candidates=None):
    """Direct transcription of the reference recursion (shading.hpp:116-154)
    — one ray_cast per tree NODE. Kept as the semantic cross-check for the
    wavefront evaluation above (tests assert they agree); the wavefront
    form is the production path (2^bounces times smaller program)."""
    hit = I.ray_cast(soa, o, d, min_t, tri_candidates, need_uv=False)
    rgb = jnp.where(hit.hit[:, None], phong(soa, d, hit, tri_candidates), 0.0)

    if bounces > 0 and (soa.any_reflective or soa.any_transparent):
        t_safe = jnp.where(hit.hit, hit.t, 1.0)
        child_o = o + t_safe[:, None] * d  # shading.hpp:131,144

        if soa.any_reflective:
            nrm = jnp.where(hit.hit[:, None], hit.normal, _UNIT_Z[None, :])
            refl_d = _reflect(_normalize(d), _normalize(nrm))
            child = ray_color_recursive(soa, child_o, refl_d, min_t, bounces - 1, tri_candidates)
            refl = soa.mat_reflect[hit.mat]
            mask = hit.hit & (refl >= _EPS)
            rgb = rgb + jnp.where(mask, refl, 0.0)[:, None] * child

        if soa.any_transparent:
            child = ray_color_recursive(soa, child_o, d, min_t, bounces - 1, tri_candidates)
            tr = soa.mat_transparency[hit.mat]
            f = jnp.where(hit.hit & (tr >= _EPS), tr, 0.0)[:, None]
            rgb = (1.0 - f) * rgb + f * child

    return rgb
