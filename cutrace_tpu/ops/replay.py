"""Topology-replay rendering: the cast-free differentiable backward.

The fixed-topology gradient semantics (BASELINE.md, diff/grad.py) mean the
backward pass never differentiates WHICH primitive a ray hits — only the
continuous surface math at the winners. The winners are pure topology, and
the fused forward kernel already finds all of them; re-finding them in the
backward (the composable re-render the round-2 custom_vjp used) spends
>90 % of the gradient step on ray casts whose results are already known.

This module renders from *topology codes* instead: the fused kernel
(ops/fused.py, emit_topo=True) appends to its per-ray output
  * one winner code per bounce-tree node: the hit primitive as an int
    (original flat triangle index; T + plane index; T + P + sphere index;
    -1 = miss), and
  * per (node, light): an occlusion flag (opaque scenes) or one occluder
    code per shadow-march step (transparent scenes),
and `replay_render_rays` recomputes color/depth/normal as a pure
composition of gathers and elementwise shading math — NO ray casts, no
(rays x primitives) products. Differentiating it under jax.vjp gives
exactly the fixed-topology gradients of the composable pipeline (the same
re-derivation the pallas-candidates path performs after its kernel returns
a winner index, ops/pallas_cast.py): winner geometry is gathered live from
soa.tri_p1/p2/p3 etc., so vertex/material/light/camera gradients all flow.

Cost: O(nodes * rays) elementwise work — on the same order as the fused
forward itself, vs the composable re-render's casts.

Semantics mirror the fused kernel's shade()/do_node() (which mirror
shading.hpp:22-154): reference quirks preserved — unflipped pre-normalized
triangle normals, raw authored plane normals, sphere t parametric in the
NORMALIZED direction, fmaxf NaN->0 phong terms, straight-through
transparency, reflection-then-transparency depth-first order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-6  # material activity threshold (default_schema.hpp:334-335)
_UNIT_Z = np.asarray([0.0, 0.0, 1.0], np.float32)


def topo_layout(bounces, any_refl, any_transp, n_lights, shadow_steps):
    """Static topo-row assignment for the depth-first bounce tree.

    Must enumerate nodes in EXACTLY the order ops/fused.py's do_node
    recurses (reflection child first, then transparency). Returns
    (rows_total, nodes): nodes[k] = (level, cast_row, shadow_base), where
    the node's cast winner code lives at row cast_row and its per-light
    shadow topology at rows [shadow_base + li * per_light, ...) with
    per_light = 1 flag row (opaque) or shadow_steps code rows."""
    per_light = 1 if not any_transp else shadow_steps
    state = [0]
    nodes = []

    def rec(level):
        cast_row = state[0]
        state[0] += 1
        shadow_base = state[0]
        state[0] += n_lights * per_light
        nodes.append((level, cast_row, shadow_base))
        if level == bounces or not (any_refl or any_transp):
            return
        if any_refl:
            rec(level + 1)
        if any_transp:
            rec(level + 1)

    rec(0)
    return state[0], nodes


def replay_rows(soa, bounces: int) -> int:
    """Topo rows the fused kernel would emit for this scene config."""
    return topo_layout(bounces, soa.any_reflective, soa.any_transparent,
                       soa.n_lights, soa.shadow_steps)[0]


# Replay scope: topo rows are bounded by the kernel's out-block budget
# (rows x TILE_R x 4B of VMEM per tile), and the materialized code buffer
# by rows x rays x 4B of HBM. Past either, the composable backward runs.
# The code budget is a quarter of a v5e's HBM: the deep-transparent
# flagship (sphere_plane 1080p b5 = 441 rows x 2.07M rays = 3.66 GB)
# measured 13.3 s/step through the replay vs 46.7 s through the
# chunked+remat composable fallback (round 4) — the buffer is worth its
# memory. CUTRACE_REPLAY_MAX_CODE_BYTES overrides (read in
# ops.fused.replay_supported).
REPLAY_MAX_ROWS = 512
REPLAY_MAX_CODE_BYTES = 4 * 1024 * 1024 * 1024


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(a):
    return a / jnp.sqrt(_dot(a, a))[..., None]


# packed-row column layout (see _packed_table)
_PK_A = slice(0, 3)     # tri p1 | plane point | sphere center
_PK_B = slice(3, 6)     # tri p2 | plane normal | (radius, 0, 0)
_PK_C = slice(6, 9)     # tri p3 | 0 | 0
_PK_COL = slice(10, 13)  # material diffuse color
_PK_SPEC = 13
_PK_REFL = 14
_PK_PHONG = 15
_PK_TRANSP = 16
_PK_W = 17


def _packed_table(soa):
    """(T+P+S, 17) packed per-primitive rows: geometry + the winner's
    material parameters. The replay then needs exactly ONE row gather per
    (node, ray) instead of ~12 scattered element gathers — TPU gathers
    dominated the replay backward (a 1080p b5 grad step traced as ~90
    uniform 18 ms gather fusions vs 0.35 ms of pure bandwidth; the same
    packed-row trick measured 3x in ops/pallas_cast.py). Built from the
    live soa arrays IN TRACE, so it is differentiable (gradients flow
    through the concat back to every geometry/material leaf) and never
    stale; XLA CSEs it across the tree's nodes."""
    def matcols(mat_idx):
        return jnp.concatenate([
            soa.mat_color[mat_idx],
            soa.mat_specular[mat_idx][:, None],
            soa.mat_reflect[mat_idx][:, None],
            soa.mat_phong[mat_idx][:, None],
            soa.mat_transparency[mat_idx][:, None],
        ], axis=1)  # (N, 7)

    T = soa.tri_p1.shape[0]
    P = soa.pl_point.shape[0]
    S = soa.sp_center.shape[0]
    f32 = jnp.float32
    tri = jnp.concatenate(
        [soa.tri_p1, soa.tri_p2, soa.tri_p3,
         jnp.zeros((T, 1), f32), matcols(soa.tri_mat)], axis=1)
    pl = jnp.concatenate(
        [soa.pl_point, soa.pl_normal, jnp.zeros((P, 4), f32),
         matcols(soa.pl_mat)], axis=1)
    sp = jnp.concatenate(
        [soa.sp_center, soa.sp_radius[:, None], jnp.zeros((S, 6), f32),
         matcols(soa.sp_mat)], axis=1)
    return jnp.concatenate([tri, pl, sp], axis=0)


def hit_from_code(soa, o, d, code, mind, o0, table=None):
    """Differentiable hit re-derivation at a FIXED winner primitive.

    o, d: (R,3); code: (R,) i32 (see module docstring); mind: (R,) f32
    strict lower t bound (sphere root choice only — all other validity is
    topology and is not re-checked). Returns (hit, t, normal, is_sphere,
    mrow): t=+inf on miss, normal raw per-kind (triangles pre-normalized,
    planes as authored, spheres normalized), mrow = the winner's packed
    row ((R, 17), material params at the _PK_* columns), everything
    NaN-free on misses (grad safety). `table` is the _packed_table (built
    on demand if absent; pass it in loops so XLA sees one table)."""
    T = soa.tri_p1.shape[0]
    P = soa.pl_point.shape[0]
    S = soa.sp_center.shape[0]
    if table is None:
        table = _packed_table(soa)
    hit = code >= 0
    is_tri = hit & (code < T)
    is_pl = hit & (code >= T) & (code < T + P)
    is_sp = hit & (code >= T + P)

    oc = o - o0
    row = table[jnp.clip(code, 0, T + P + S - 1)]  # (R, 17): ONE gather
    A = row[:, _PK_A] - o0
    Bv = row[:, _PK_B]
    Cv = row[:, _PK_C]

    # triangles (default_schema.hpp:57-78; forms of ops/intersect.py
    # cast_triangles, elementwise on the single gathered winner)
    p1, p3 = A, Cv - o0
    p2 = Bv - o0
    a = p2 - p1
    b = p2 - p3
    n = jnp.cross(a, b)
    alpha = _dot(d, n)
    inv = 1.0 / jnp.where(alpha == 0.0, 1.0, alpha)
    t_tri = (_dot(p2, n) - _dot(oc, n)) * inv
    # unflipped, pre-normalized shading normal (default_schema.hpp:72).
    # The zero-length guard sits INSIDE the sqrt: every ray evaluates
    # every kind-branch on the SAME gathered row, and a plane/sphere row
    # read as a degenerate triangle would otherwise send sqrt(0)'s NaN
    # cotangent through the masked-off branch (jnp.where kills primals,
    # not a branch's own NaN gradients).
    ncr = -jnp.cross(p2 - p3, p1 - p3)
    nl2 = _dot(ncr, ncr)
    nl = jnp.sqrt(jnp.where(nl2 == 0.0, 1.0, nl2))
    n_tri = ncr / jnp.where(nl2 == 0.0, 1.0, nl)[:, None]

    # planes (default_schema.hpp:189-201): A = point, Bv = raw normal
    pn = Bv
    kp = _dot(A, pn)
    denom = _dot(d, pn)
    t_pl = (kp - _dot(oc, pn)) / jnp.where(denom == 0.0, 1.0, denom)

    # spheres (default_schema.hpp:226-251): t parametric w.r.t. the
    # NORMALIZED direction; root choice per the reference's validity rule
    # (both-roots min, else whichever clears mind) — recomputed from
    # values, like the composable path does. A = center, Bv[0] = radius.
    dn = _normalize(d)
    c = A
    r2 = row[:, 3] ** 2
    dec = _dot(dn, c) - _dot(dn, oc)
    ec2 = _dot(oc, oc) - 2.0 * _dot(oc, c) + _dot(c, c)
    sub = dec * dec - (ec2 - r2)
    missed = sub <= 0.0
    sq = jnp.sqrt(jnp.where(missed, 1.0, sub))
    t0 = dec - sq
    t1 = dec + sq
    v0 = ~missed & jnp.isfinite(t0) & (t0 > mind)
    v1 = ~missed & jnp.isfinite(t1) & (t1 > mind)
    t_sp = jnp.where(
        v0 & v1, jnp.minimum(t0, t1),
        jnp.where(v0, t0, jnp.where(v1, t1, 1.0)),
    )
    pt_sp = oc + t_sp[:, None] * dn
    nsp = pt_sp - c
    nil2 = _dot(nsp, nsp)
    nil = jnp.sqrt(jnp.where(nil2 == 0.0, 1.0, nil2))
    n_sp = nsp / jnp.where(nil2 == 0.0, 1.0, nil)[:, None]

    t = jnp.where(is_tri, t_tri,
                  jnp.where(is_pl, t_pl, jnp.where(is_sp, t_sp, 1.0)))
    t = jnp.where(hit, t, jnp.inf)
    normal = jnp.where(
        is_tri[:, None], n_tri,
        jnp.where(is_pl[:, None], pn, jnp.where(is_sp[:, None], n_sp, 0.0)),
    )
    return hit, t, normal, is_sp, row


def _phong_lights(soa, hit, point, nn, nd, mrow, codes, shadow_base,
                  per_light, o0, table):
    """Per-light Phong accumulation with replayed shadow topology
    (shading.hpp:64-99 + 22-45). nn: unit shading normal (miss -> +z);
    nd: unit ray direction; mrow: the winner's packed row (material
    params). Returns the full phong sum incl. ambient."""
    diffuse = mrow[:, _PK_COL]
    spec = mrow[:, _PK_SPEC][:, None] * diffuse
    phong_e = mrow[:, _PK_PHONG]
    final = soa.ambient * diffuse
    md = -nd

    def _safe_len(v2):
        """sqrt(v2) with a FINITE vjp at v2 == 0: sqrt's autodiff is
        0.5/sqrt(0) = inf, and inf * (even a zero cotangent) = NaN — the
        guard must sit INSIDE the sqrt, with the primal value restored by
        the outer where. Reachable: hv = md + sdir == 0 when a light's
        direction coincides exactly with the ray (observed on the v5e at
        dead-node lanes, where garbage codes build degenerate bounce
        chains); diff == 0 when a light sits on the shading point."""
        z = v2 == 0.0
        return jnp.where(z, 0.0, jnp.sqrt(jnp.where(z, 1.0, v2)))

    for li in range(soa.n_lights):
        vec = soa.light_vec[li]
        is_sun = soa.light_kind[li] == 0
        diff = vec[None, :] - point
        dist = _safe_len(_dot(diff, diff))
        dsafe = jnp.where(dist == 0.0, 1.0, dist)
        direction = jnp.where(is_sun, -vec[None, :], diff / dsafe[:, None])
        distance = jnp.where(is_sun, jnp.inf, dist)
        dl = _safe_len(_dot(direction, direction))
        light_dist = distance * dl  # shading.hpp:80
        dls = jnp.where(dl == 0.0, 1.0, dl)
        sdir = direction / dls[:, None]

        if per_light == 1:
            # opaque scene: stored any-hit occlusion flag; sh in {0, 1}
            # carries no gradient (the composable march's clamp at
            # sh == 1.0 selects a constant branch there too)
            sh = codes[:, shadow_base + li].astype(jnp.float32)
            sh = jnp.where(hit, sh, 0.0)
        else:
            # transparent scene: replay the march from per-step occluder
            # codes; sh is differentiable w.r.t. occluder transparency
            sh = jnp.zeros_like(light_dist)
            last = jnp.zeros_like(light_dist)
            act = hit
            for si in range(per_light):
                ccode = codes[:, shadow_base + li * per_light + si]
                shit, st, _, _, srow = hit_from_code(
                    soa, point, sdir, ccode, last + 1e-3, o0, table
                )
                transp = srow[:, _PK_TRANSP]
                okm = act & shit & jnp.isfinite(st) & (st < light_dist)
                sh = sh + jnp.where(okm, 1.0 - transp, 0.0)
                last = jnp.where(okm, st, last)
                act = okm & (sh < 1.0)
            sh = jnp.where(sh >= 1.0, 1.0, sh)
        lit = sh < 1.0

        # max(0, x) with fmaxf NaN->0 semantics (shading.hpp:86-88)
        fdd = _dot(nn, sdir)
        fd = jnp.where(fdd > 0.0, fdd, 0.0)
        hv = md + sdir
        hl = _safe_len(_dot(hv, hv))
        bdd = _dot(nn, hv) / jnp.where(hl == 0.0, 1.0, hl)
        base = jnp.where(bdd > 0.0, bdd, 0.0)
        backf = base <= 0.0
        fs = jnp.where(backf, 0.0, jnp.where(backf, 1.0, base) ** phong_e)
        wgt = jnp.where(lit, 1.0 - sh, 0.0)
        contrib = fd[:, None] * diffuse + fs[:, None] * spec
        final = final + wgt[:, None] * contrib * soa.light_color[li][None, :]
    return final


def replay_render_rays(soa, o, d, codes, fudge, bounces: int):
    """Render (color, depth, normal) from topology codes — zero casts.

    codes: (R, K) i32 as laid out by topo_layout / emitted by the fused
    kernel. Mirrors ops/fused.py do_node()'s depth-first recursion; value
    parity with the kernel is fp-exact up to association, and jax.vjp of
    this function IS the fixed-topology backward."""
    o0 = jax.lax.stop_gradient(soa.scene_center)
    R = o.shape[0]
    per_light = 1 if not soa.any_transparent else soa.shadow_steps
    _, nodes = topo_layout(bounces, soa.any_reflective,
                           soa.any_transparent, soa.n_lights,
                           soa.shadow_steps)
    it = iter(nodes)
    table = _packed_table(soa)

    color = [jnp.zeros((R, 3), jnp.float32)]
    depth_normal = [None, None]
    fudge_v = jnp.full((R,), jnp.float32(fudge))

    def do_node(level, o3, d3, w, mind, root):
        _, cast_row, shadow_base = next(it)
        hit, t, rnorm, is_sp, mrow = hit_from_code(
            soa, o3, d3, codes[:, cast_row], mind, o0, table
        )
        t_safe = jnp.where(hit, t, 1.0)
        nd = _normalize(d3)
        # sphere hit points use the normalized direction
        # (default_schema.hpp:245); others the raw one
        point = o3 + t_safe[:, None] * jnp.where(is_sp[:, None], nd, d3)
        if root:
            depth_normal[0] = t  # +inf on miss
            depth_normal[1] = jnp.where(hit[:, None], rnorm, 0.0)
        nrm = jnp.where(hit[:, None], rnorm, _UNIT_Z[None, :])
        # |nrm| == 0 guard: DEAD nodes' code slots are garbage (the fused
        # kernel's @pl.when subtree skip + alive-masked casts leave them
        # unwritten/uncomputed — ops/fused.py do_node), so a dead lane can
        # carry a spurious "hit" on the zero-area padded triangle, whose
        # zero normal would send NaN through an unguarded normalize and
        # poison the whole vjp via 0 * NaN. Guarded, the lane's phong is
        # finite and its w == 0 kills value and gradient alike.
        nn_l2 = _dot(nrm, nrm)
        nn = nrm / jnp.sqrt(jnp.where(nn_l2 == 0.0, 1.0, nn_l2))[:, None]
        ph = _phong_lights(soa, hit, point, nn, nd, mrow, codes,
                           shadow_base, per_light, o0, table)
        ph = jnp.where(hit[:, None], ph, 0.0)

        if level == bounces or not (soa.any_reflective
                                    or soa.any_transparent):
            color[0] = color[0] + w[:, None] * ph
            return
        if soa.any_transparent:
            tr = mrow[:, _PK_TRANSP]
            f = jnp.where(hit & (tr >= _EPS), tr, 0.0)
        else:
            f = jnp.zeros_like(w)
        weff = w * (1.0 - f)
        color[0] = color[0] + weff[:, None] * ph
        child_o = o3 + t_safe[:, None] * d3  # raw d (shading.hpp:131,144)
        if soa.any_reflective:
            refl = mrow[:, _PK_REFL]
            r = jnp.where(hit & (refl >= _EPS), refl, 0.0)
            rd = nd - 2.0 * _dot(nd, nn)[:, None] * nn
            do_node(level + 1, child_o, rd, weff * r, fudge_v, False)
        if soa.any_transparent:
            do_node(level + 1, child_o, d3, w * f, fudge_v, False)

    do_node(0, o, d, jnp.ones((R,), jnp.float32), fudge_v, True)
    return color[0], depth_normal[0], depth_normal[1]
