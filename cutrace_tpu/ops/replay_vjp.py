"""Pallas replay-VJP kernel: the speed-of-light backward.

Round 3's backward differentiated the code-driven replay (ops/replay.py)
with XLA autodiff: correct, but the compiled program was ~90 HBM-bouncing
fusions per chunk — 778 ms of the 1.18 s bunny 1080p b5 grad step (device
trace, round 4), 20-100x off bandwidth speed-of-light for the bytes it
actually needs to move.

This module replaces that XLA vjp with ONE Pallas kernel that runs the
whole replay backward per 512-ray tile in VMEM:

  * forward sweep over the statically-unrolled bounce TREE (refl-first
    depth-first recursion, replay.topo_layout order; opaque scenes
    degenerate to a chain of `bounces+1` nodes), storing (o, d, w, mind)
    and the gathered winner rows per node;
  * reverse sweep with the hand-derived adjoint of the replay math
    (ops/replay.py hit_from_code + _phong_lights, which mirror
    /root/reference/inc/shading.hpp:22-154 and default_schema.hpp
    intersection algebra) — every guard (`where(x==0, 1, x)` divisors,
    fmaxf NaN->0 gates, backface phong gates) matches the replay so the
    gradients agree with jax.vjp(replay_render_rays) to fp association;
  * winner-row gathers and their transposes as MXU one-hot contractions:
    rows = tblT (C,N) @ onehot (N,R_tile), d_tbl += g_rows @ onehot^T —
    precision=HIGHEST makes the one-hot matmul EXACT (measured bit-equal
    to the gather on chip);
  * parameter cotangents (packed table, lights, ambient) accumulate in
    VMEM across the sequential grid — no chunking, no dynamic_update_slice
    stitching, no HBM round trips between nodes.

The packed-table cotangent is then routed to the scene leaves by
jax.vjp of the (tiny, (N,17)-sized) table constructors — the only XLA
autodiff left in the backward.

Scope (replay_vjp_supported): opaque chains AND transparent two-branch
trees within the lanes-kernel range — covers every BASELINE flagship
backward workload (bunny/mirror 1080p b5 opaque; sphere_plane 1080p b5
transparent). Transparent scenes add (a) the statically-unrolled
two-branch recursion in both sweeps, (b) march adjoints — sh = sum over
steps of (1 - occluder transparency) IS differentiable w.r.t.
mat_transparency through the gathered occluder rows (replay
_phong_lights per_light > 1 branch), one gather/scatter contraction pair
per (node, light, step), and (c) the weff = w*(1-f) / child-weight
adjoints at each spawn. Past the gate's budgets, the XLA replay /
composable fallback runs (ops/fused.py _fused_bwd).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cutrace_tpu.ops.replay import (_PK_COL, _PK_PHONG, _PK_REFL, _PK_SPEC,
                                    _PK_TRANSP, _packed_table, topo_layout)

_EPS = 1e-6  # material activity threshold (default_schema.hpp:334-335)
TILE_R = 512
_C_PAD = 24  # packed-table columns (17) padded to a sublane multiple

# misc output rows: per light 8 rows mirroring the light-table columns
# [kind, vx, vy, vz, cr, cg, cb, pad]; after the lights, one ambient row.
_MISC_LIGHT_ROWS = 8


def replay_vjp_supported(soa, bounces: int) -> bool:
    """Static gate for the Pallas replay-VJP kernel (see module
    docstring): one-hot tiles + per-node scratch within VMEM, statically
    unrolled bounce tree within program-size sanity. Opaque chains AND
    transparent two-branch trees (the march replay multiplies the gather
    count by shadow_steps per (node, light), so the table cap tightens)."""
    import os

    if os.environ.get("CUTRACE_REPLAY_VJP") == "0":
        return False
    n = (soa.tri_p1.shape[0] + soa.pl_point.shape[0]
         + soa.sp_center.shape[0])
    if n > 8192:  # (N, 512) one-hot tile <= 16 MB
        return False
    if soa.n_lights > 8:
        return False
    rows_total, nodes = topo_layout(
        bounces, soa.any_reflective, soa.any_transparent, soa.n_lights,
        soa.shadow_steps)
    if len(nodes) > 64:  # odw+rows scratch ~65 KB/node; unroll budget
        return False
    if rows_total > 512:  # codes VMEM block (K, 512) <= 1 MB
        return False
    if soa.any_transparent:
        # march replay: nodes x lights x steps extra gather contractions
        if n > 2048 or soa.shadow_steps > 8:
            return False
    return True


def _recentered_table(soa, o0):
    """The replay's packed table with positions recentered by o0, exactly
    as hit_from_code would subtract them per kind (ops/replay.py):
    triangles cols 0:9, planes/spheres cols 0:3. Differentiable in soa
    (o0 is stop-gradiented by the caller)."""
    tbl = _packed_table(soa)
    t = soa.tri_p1.shape[0]
    p = soa.pl_point.shape[0]
    s = soa.sp_center.shape[0]
    adj = jnp.zeros_like(tbl)
    if t:
        adj = adj.at[:t, 0:9].set(jnp.tile(o0, 3)[None, :])
    if p:
        adj = adj.at[t:t + p, 0:3].set(o0[None, :])
    if s:
        adj = adj.at[t + p:, 0:3].set(o0[None, :])
    return tbl - adj


def _light_table_diff(soa, o0):
    """(L, 8) light rows [kind, vx, vy, vz, cr, cg, cb, 0] like
    fused._light_table but DIFFERENTIABLE (no stop_gradient): the vjp of
    this constructor routes the kernel's per-light cotangent rows back to
    light_vec / light_color."""
    kind = soa.light_kind.astype(jnp.float32)[:, None]
    is_sun = (soa.light_kind == 0)[:, None]
    vec = jnp.where(is_sun, soa.light_vec, soa.light_vec - o0)
    pad = jnp.zeros((kind.shape[0], 1), jnp.float32)
    return jnp.concatenate([kind, vec, soa.light_color, pad], axis=1)


# ---------------------------------------------------------------------------
# row-triple helpers: per-ray quantities are (1, tile_r) rows, 3-vectors
# are python triples of rows
# ---------------------------------------------------------------------------


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _where3(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _zeros3(z):
    return (z, z, z)


def _norm_vjp_guarded(unit, inv, zero_mask, g):
    """Adjoint of v -> v / where(zero_mask, 1, |v|) given the unit result
    and inv = 1/guarded|v|: g_v = (g - unit (unit.g)) * inv, or g verbatim
    on the guarded (|v| == 0) branch where the map is the identity."""
    du = _dot3(unit, g)
    full = ((g[0] - unit[0] * du) * inv,
            (g[1] - unit[1] * du) * inv,
            (g[2] - unit[2] * du) * inv)
    return _where3(zero_mask, g, full)


def _build_tree(bounces, any_refl, any_transp, n_lights, shadow_steps):
    """Static bounce-tree structure in replay.topo_layout's DF order:
    tuple of (cast_row, shadow_base, refl_child_id, transp_child_id)
    per node (child ids None at leaves)."""
    per_light = 1 if not any_transp else shadow_steps
    state = [0]
    nodes = []

    def rec(level):
        nid = len(nodes)
        cast_row = state[0]
        state[0] += 1
        shadow_base = state[0]
        state[0] += n_lights * per_light
        nodes.append([cast_row, shadow_base, None, None])
        if level == bounces or not (any_refl or any_transp):
            return nid
        if any_refl:
            nodes[nid][2] = rec(level + 1)
        if any_transp:
            nodes[nid][3] = rec(level + 1)
        return nid

    rec(0)
    return tuple(tuple(n) for n in nodes)


def _make_replay_vjp_kernel(n_tab, t_cnt, p_cnt, s_cnt, n_lights, bounces,
                            any_refl, any_transp, shadow_steps, tile_r,
                            n_nodes, tree):
    """Kernel body. Operand order:
    rays (8, tile_r), codes (K, tile_r) i32, cot (8, tile_r),
    tblT (_C_PAD, n_tab), lights (L, 8) SMEM, scalars (1, 4) SMEM;
    outputs d_rays (8, tile_r), d_tbl (_C_PAD, n_tab),
    d_misc (L*8 + 8, tile_r); scratch odw (8*n_nodes, tile_r),
    grows (_C_PAD, tile_r), rows (_C_PAD*n_nodes, tile_r).

    The bounce tree is python-recursed in both sweeps (static unroll —
    opaque scenes degenerate to the chain this kernel originally
    shipped with); transparent scenes add the weff/transparency spawn
    adjoints and the differentiable shadow-march replay (sh depends on
    the gathered occluders' transparency, replay _phong_lights
    per_light > 1 branch)."""
    per_light = 1 if not any_transp else shadow_steps

    def kernel(rays_ref, codes_ref, cot_ref, tbl_ref, lights_ref, scal_ref,
               drays_ref, dtbl_ref, dmisc_ref, odw_s, grows_s, rows_s):
        i = pl.program_id(0)
        ambient = scal_ref[0, 0]
        fudge = scal_ref[0, 1]
        zero = jnp.zeros((1, tile_r), jnp.float32)
        one = zero + 1.0
        inf = jnp.float32(jnp.inf)

        @pl.when(i == 0)
        def _():
            dtbl_ref[...] = jnp.zeros_like(dtbl_ref)
            dmisc_ref[...] = jnp.zeros_like(dmisc_ref)

        def rrow(j):
            return rays_ref[j:j + 1, :]

        def crow(j):
            return cot_ref[j:j + 1, :]

        def onehot(code_row):
            """(n_tab, tile_r) f32 exact one-hot of the winner codes
            (code -1 = miss -> all-zero column)."""
            lanes = jax.lax.broadcasted_iota(
                jnp.int32, (n_tab, tile_r), 0)
            return jnp.where(lanes == code_row, 1.0, 0.0)

        def gather_rows(mask):
            """(C_PAD, tile_r) winner rows = tblT @ onehot — EXACT at
            HIGHEST precision (single nonzero per output element)."""
            return jax.lax.dot_general(
                tbl_ref[...], mask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def node_geom(rows, code, o3, d3, mind):
            """Recompute the replay's per-node cast derivation
            (ops/replay.py hit_from_code + the do_node frame math) from
            the gathered rows; returns the locals both sweeps need.
            All guards mirror the replay verbatim."""
            def row(j):
                return rows[j:j + 1, :]

            hit = code >= 0
            is_tri = hit & (code < t_cnt)
            is_pl = hit & (code >= t_cnt) & (code < t_cnt + p_cnt)
            is_sp = hit & (code >= t_cnt + p_cnt)

            A = (row(0), row(1), row(2))
            B = (row(3), row(4), row(5))
            Cv = (row(6), row(7), row(8))

            # triangle (default_schema.hpp:57-78)
            p1, p2, p3 = A, B, Cv
            a3 = _sub3(p2, p1)
            b3 = _sub3(p2, p3)
            nrm_t = _cross3(a3, b3)
            alpha = _dot3(d3, nrm_t)
            alpha_z = alpha == 0.0
            inv_a = 1.0 / jnp.where(alpha_z, 1.0, alpha)
            s_num = _dot3(p2, nrm_t) - _dot3(o3, nrm_t)
            t_tri = s_num * inv_a
            q3 = _sub3(p1, p3)
            cr = _cross3(b3, q3)
            ncr = (-cr[0], -cr[1], -cr[2])
            nl2 = _dot3(ncr, ncr)
            nl2_z = nl2 == 0.0
            nl = jnp.sqrt(jnp.where(nl2_z, 1.0, nl2))
            inv_nl = 1.0 / jnp.where(nl2_z, 1.0, nl)
            n_tri = _scale3(ncr, inv_nl)

            # plane (default_schema.hpp:189-201)
            pn = B
            kp = _dot3(A, pn)
            denom = _dot3(d3, pn)
            den_z = denom == 0.0
            inv_den = 1.0 / jnp.where(den_z, 1.0, denom)
            pl_num = kp - _dot3(o3, pn)
            t_pl = pl_num * inv_den

            # normalized direction (shared: sphere t + shading nd)
            dlen2 = _dot3(d3, d3)
            dlen = jnp.sqrt(dlen2)
            inv_dlen = 1.0 / dlen
            nd3 = _scale3(d3, inv_dlen)

            # sphere (default_schema.hpp:226-251)
            cC = A
            rad = row(3)
            r2 = rad * rad
            dec = _dot3(nd3, cC) - _dot3(nd3, o3)
            ec2 = (_dot3(o3, o3) - 2.0 * _dot3(o3, cC) + _dot3(cC, cC))
            sub = dec * dec - (ec2 - r2)
            missed = sub <= 0.0
            sq = jnp.sqrt(jnp.where(missed, 1.0, sub))
            t0 = dec - sq
            t1 = dec + sq
            v0 = ~missed & jnp.isfinite(t0) & (t0 > mind)
            v1 = ~missed & jnp.isfinite(t1) & (t1 > mind)
            # t0 <= t1 always (sq >= 0): minimum(t0, t1) == t0
            t_sp = jnp.where(v0, t0, jnp.where(v1, t1, 1.0))
            sel0 = v0                      # cotangent routes to t0
            sel1 = ~v0 & v1                # ... or t1
            pt_sp = _add3(o3, _scale3(nd3, t_sp))
            nsp = _sub3(pt_sp, cC)
            nil2 = _dot3(nsp, nsp)
            nil2_z = nil2 == 0.0
            nil = jnp.sqrt(jnp.where(nil2_z, 1.0, nil2))
            inv_nil = 1.0 / jnp.where(nil2_z, 1.0, nil)
            n_sp = _scale3(nsp, inv_nil)

            t = jnp.where(is_tri, t_tri,
                          jnp.where(is_pl, t_pl,
                                    jnp.where(is_sp, t_sp, 1.0)))
            t = jnp.where(hit, t, inf)
            normal = _where3(is_tri, n_tri,
                             _where3(is_pl, pn,
                                     _where3(is_sp, n_sp, _zeros3(zero))))
            t_safe = jnp.where(hit, t, 1.0)
            # sphere hit points use the normalized direction
            point = _add3(o3, _scale3(_where3(is_sp, nd3, d3), t_safe))
            nrm3 = _where3(hit, normal, (zero, zero, one))
            # |nrm| == 0 guard, mirroring replay do_node: dead-node code
            # slots are garbage (kernel subtree skip), and a spurious
            # "hit" on the zero-area padded triangle must not NaN
            nn_l2 = _dot3(nrm3, nrm3)
            nn_z = nn_l2 == 0.0
            nn_l = jnp.sqrt(jnp.where(nn_z, 1.0, nn_l2))
            inv_nn = 1.0 / jnp.where(nn_z, 1.0, nn_l)
            nn3 = _scale3(nrm3, inv_nn)
            return dict(
                hit=hit, is_tri=is_tri, is_pl=is_pl, is_sp=is_sp,
                p1=p1, p2=p2, p3=p3, a3=a3, b3=b3, q3=q3,
                nrm_t=nrm_t, alpha_z=alpha_z, inv_a=inv_a, t_tri=t_tri,
                s_num=s_num, pl_num=pl_num,
                ncr=ncr, nl2_z=nl2_z, inv_nl=inv_nl, n_tri=n_tri,
                pn=pn, den_z=den_z, inv_den=inv_den, t_pl=t_pl,
                inv_dlen=inv_dlen, nd3=nd3,
                cC=cC, rad=rad, missed=missed, sq=sq, dec=dec,
                sel0=sel0, sel1=sel1, t_sp=t_sp,
                nsp=nsp, nil2_z=nil2_z, inv_nil=inv_nil, n_sp=n_sp,
                t=t, t_safe=t_safe, point=point,
                nrm3=nrm3, inv_nn=inv_nn, nn_z=nn_z, nn3=nn3,
                diffuse=(row(10), row(11), row(12)),
                spec=row(13), refl=row(14), phong_e=row(15),
                transp=row(16), rows=rows,
            )

        def t_only(rows, code, o3, d3, mind):
            """Lean hit re-derivation for the shadow-march replay: only
            (hit, t, occluder transparency) — the march's t feeds
            comparisons exclusively, so no adjoints are ever needed
            through this path (replay _phong_lights per_light > 1)."""
            def row(j):
                return rows[j:j + 1, :]

            hit = code >= 0
            is_tri = hit & (code < t_cnt)
            is_pl = hit & (code >= t_cnt) & (code < t_cnt + p_cnt)
            is_sp = hit & (code >= t_cnt + p_cnt)
            A = (row(0), row(1), row(2))
            B = (row(3), row(4), row(5))
            Cv = (row(6), row(7), row(8))
            p1, p2, p3 = A, B, Cv
            nrm_t = _cross3(_sub3(p2, p1), _sub3(p2, p3))
            alpha = _dot3(d3, nrm_t)
            inv_a = 1.0 / jnp.where(alpha == 0.0, 1.0, alpha)
            t_tri = (_dot3(p2, nrm_t) - _dot3(o3, nrm_t)) * inv_a
            pn = B
            denom = _dot3(d3, pn)
            t_pl = (_dot3(A, pn) - _dot3(o3, pn)) / jnp.where(
                denom == 0.0, 1.0, denom)
            dlen = jnp.sqrt(_dot3(d3, d3))
            nd3 = _scale3(d3, 1.0 / dlen)
            cC = A
            r2 = row(3) * row(3)
            dec = _dot3(nd3, cC) - _dot3(nd3, o3)
            ec2 = (_dot3(o3, o3) - 2.0 * _dot3(o3, cC) + _dot3(cC, cC))
            sub = dec * dec - (ec2 - r2)
            missed = sub <= 0.0
            sq = jnp.sqrt(jnp.where(missed, 1.0, sub))
            t0 = dec - sq
            t1 = dec + sq
            v0 = ~missed & jnp.isfinite(t0) & (t0 > mind)
            v1 = ~missed & jnp.isfinite(t1) & (t1 > mind)
            t_sp = jnp.where(v0, t0, jnp.where(v1, t1, 1.0))
            t = jnp.where(is_tri, t_tri,
                          jnp.where(is_pl, t_pl,
                                    jnp.where(is_sp, t_sp, 1.0)))
            t = jnp.where(hit, t, jnp.float32(jnp.inf))
            return hit, t, row(16)

        # ---------------- forward sweep: store (o, d, w, mind) ----------
        def fwd_node(nid, o3, d3, w, mind):
            base = 8 * nid
            odw_s[base + 0:base + 1, :] = o3[0]
            odw_s[base + 1:base + 2, :] = o3[1]
            odw_s[base + 2:base + 3, :] = o3[2]
            odw_s[base + 3:base + 4, :] = d3[0]
            odw_s[base + 4:base + 5, :] = d3[1]
            odw_s[base + 5:base + 6, :] = d3[2]
            odw_s[base + 6:base + 7, :] = w
            odw_s[base + 7:base + 8, :] = mind
            # winner rows stored for the reverse sweep (saves one gather
            # contraction per node there — masks regenerate cheaply, row
            # GATHERS are the MXU cost)
            cast_row, _, refl_id, transp_id = tree[nid]
            code = codes_ref[cast_row:cast_row + 1, :]
            rows = gather_rows(onehot(code))
            rows_s[_C_PAD * nid:_C_PAD * (nid + 1), :] = rows
            if refl_id is None and transp_id is None:
                return
            g = node_geom(rows, code, o3, d3, mind)
            hit = g["hit"]
            child_o = _add3(o3, _scale3(d3, g["t_safe"]))
            if any_transp:
                f = jnp.where(hit & (g["transp"] >= _EPS), g["transp"], 0.0)
            else:
                f = zero
            weff = w * (1.0 - f)
            if refl_id is not None:
                r = jnp.where(hit & (g["refl"] >= _EPS), g["refl"], 0.0)
                dot_dn = _dot3(g["nd3"], g["nn3"])
                rd = _sub3(g["nd3"], _scale3(g["nn3"], 2.0 * dot_dn))
                fwd_node(refl_id, child_o, rd, weff * r, zero + fudge)
            if transp_id is not None:
                fwd_node(transp_id, child_o, d3, w * f, zero + fudge)

        fwd_node(0, (rrow(0), rrow(1), rrow(2)),
                 (rrow(3), rrow(4), rrow(5)), one, rrow(6))

        # ---------------- reverse sweep ---------------------------------
        cot_c = (crow(0), crow(1), crow(2))
        cot_dep = crow(3)
        cot_n = (crow(4), crow(5), crow(6))

        def bwd_node(nid):
            """Reverse-DF adjoints for node nid; returns the cotangents
            w.r.t. its (o, d, w) inputs."""
            base = 8 * nid
            o3 = (odw_s[base + 0:base + 1, :], odw_s[base + 1:base + 2, :],
                  odw_s[base + 2:base + 3, :])
            d3 = (odw_s[base + 3:base + 4, :], odw_s[base + 4:base + 5, :],
                  odw_s[base + 5:base + 6, :])
            w = odw_s[base + 6:base + 7, :]
            mind = odw_s[base + 7:base + 8, :]
            cast_row, shadow_base, refl_id, transp_id = tree[nid]
            code = codes_ref[cast_row:cast_row + 1, :]
            mask = onehot(code)
            g = node_geom(rows_s[_C_PAD * nid:_C_PAD * (nid + 1), :],
                          code, o3, d3, mind)
            hit = g["hit"]
            nn3 = g["nn3"]
            nd3 = g["nd3"]
            t_safe = g["t_safe"]
            point = g["point"]
            root = nid == 0
            leaf = refl_id is None and transp_id is None

            # children first (reverse DF; sums commute)
            g_o_r = g_d_r = None
            g_w_r = None
            g_o_t = g_d_t = None
            g_w_t = None
            if refl_id is not None:
                g_o_r, g_d_r, g_w_r = bwd_node(refl_id)
            if transp_id is not None:
                g_o_t, g_d_t, g_w_t = bwd_node(transp_id)

            # local cotangent accumulators
            a_o = _zeros3(zero)       # w.r.t. o3 (node origin)
            a_d = _zeros3(zero)       # w.r.t. d3 (raw direction)
            a_nd = _zeros3(zero)      # w.r.t. nd3 (unit direction)
            a_nn = _zeros3(zero)      # w.r.t. nn3 (unit shading normal)
            a_pt = _zeros3(zero)      # w.r.t. point
            a_ts = zero               # w.r.t. t_safe
            a_t = zero                # w.r.t. t (pre-t_safe)
            a_w = zero
            a_row = {j: zero for j in range(17)}

            # spawn weights (replay do_node): f = gated transparency,
            # weff = w (1 - f); color += (leaf ? w : weff) * ph;
            # refl child w = weff*r; transp child w = w*f
            if any_transp and not leaf:
                f = jnp.where(hit & (g["transp"] >= _EPS), g["transp"], 0.0)
            else:
                f = zero
            weff = w * (1.0 - f)

            # --- child-transition adjoints ------------------------------
            g_weff = zero
            if not leaf:
                g_o_c = _zeros3(zero)
                if refl_id is not None:
                    g_o_c = _add3(g_o_c, g_o_r)
                    # rd = nd - 2 (nd.nn) nn
                    dot_dn = _dot3(nd3, nn3)
                    gd_dot_nn = _dot3(g_d_r, nn3)
                    a_nd = _add3(a_nd,
                                 _sub3(g_d_r, _scale3(nn3, 2.0 * gd_dot_nn)))
                    a_nn = _sub3(
                        a_nn,
                        _add3(_scale3(nd3, 2.0 * gd_dot_nn),
                              _scale3(g_d_r, 2.0 * dot_dn)),
                    )
                    # w_refl = weff * r
                    r = jnp.where(hit & (g["refl"] >= _EPS), g["refl"], 0.0)
                    g_weff = g_weff + g_w_r * r
                    a_row[_PK_REFL] = a_row[_PK_REFL] + jnp.where(
                        hit & (g["refl"] >= _EPS), g_w_r * weff, 0.0)
                if transp_id is not None:
                    g_o_c = _add3(g_o_c, g_o_t)
                    a_d = _add3(a_d, g_d_t)      # transp child keeps d
                # child_o = o + t_safe * d (shared by both children)
                a_o = _add3(a_o, g_o_c)
                a_ts = a_ts + _dot3(g_o_c, d3)
                a_d = _add3(a_d, _scale3(g_o_c, t_safe))

            # --- color contribution -------------------------------------
            # leaf: color += w * ph ; non-leaf: color += weff * ph.
            # Recompute phong forward per light and apply adjoints inline
            # (shading.hpp:64-99 / replay _phong_lights).
            w_color = w if leaf else weff
            g_ph = _scale3(cot_c, w_color)     # cotangent of ph (3 rows)
            g_final = _where3(hit, g_ph, _zeros3(zero))
            dif = g["diffuse"]
            spec = g["spec"]
            phong_e = g["phong_e"]
            md3 = (-nd3[0], -nd3[1], -nd3[2])
            a_md = _zeros3(zero)
            # ph recomputation accumulates `final` for a_w
            final = _scale3(dif, ambient)
            # ambient * diffuse adjoints
            amb_g = _dot3(dif, g_final)
            a_dif = _scale3(g_final, ambient)
            a_spec = zero
            a_phong = zero

            for li in range(n_lights):
                kind = lights_ref[li, 0]
                vx = lights_ref[li, 1]
                vy = lights_ref[li, 2]
                vz = lights_ref[li, 3]
                lcr = lights_ref[li, 4]
                lcg = lights_ref[li, 5]
                lcb = lights_ref[li, 6]
                is_sun = kind == 0.0
                vec3 = (zero + vx, zero + vy, zero + vz)
                diff3 = _sub3(vec3, point)
                dist2 = _dot3(diff3, diff3)
                dist = jnp.sqrt(dist2)
                dist_z = dist == 0.0
                inv_ds = 1.0 / jnp.where(dist_z, 1.0, dist)
                dir_pt = _scale3(diff3, inv_ds)
                nvec3 = (-vec3[0], -vec3[1], -vec3[2])
                direction = _where3(is_sun, nvec3, dir_pt)
                dl2 = _dot3(direction, direction)
                dl = jnp.sqrt(dl2)
                dl_z = dl == 0.0
                inv_dl = 1.0 / jnp.where(dl_z, 1.0, dl)
                sdir = _scale3(direction, inv_dl)

                if per_light == 1:
                    # opaque shadow flag (discrete, no gradient)
                    sh = codes_ref[
                        shadow_base + li:shadow_base + li + 1, :
                    ].astype(jnp.float32)
                    sh = jnp.where(hit, sh, 0.0)
                    march_steps = None
                else:
                    # transparent shadow-march replay (replay
                    # _phong_lights per_light > 1): sh accumulates
                    # (1 - occluder transparency) over the coded march
                    # steps — DIFFERENTIABLE w.r.t. the occluders'
                    # transparency; every other march quantity feeds
                    # comparisons only. light_dist = distance * dl
                    # (shading.hpp:80; inf for suns).
                    distance = jnp.where(is_sun, jnp.float32(jnp.inf),
                                         dist)
                    light_dist = distance * dl
                    sh = zero
                    last = zero
                    act = hit
                    march_steps = []
                    for si in range(per_light):
                        srow_idx = shadow_base + li * per_light + si
                        ccode = codes_ref[srow_idx:srow_idx + 1, :]
                        mask_s = onehot(ccode)
                        mrow = gather_rows(mask_s)
                        shit, st, transp_s = t_only(
                            mrow, ccode, point, sdir, last + 1e-3)
                        okm = (act & shit & jnp.isfinite(st)
                               & (st < light_dist))
                        sh = sh + jnp.where(okm, 1.0 - transp_s, 0.0)
                        last = jnp.where(okm, st, last)
                        act = okm & (sh < 1.0)
                        march_steps.append((okm, mask_s))
                    sh_raw = sh
                    sh = jnp.where(sh >= 1.0, 1.0, sh)
                lit = sh < 1.0

                fdd = _dot3(nn3, sdir)
                fd_pos = fdd > 0.0
                fd = jnp.where(fd_pos, fdd, 0.0)
                hv3 = _add3(md3, sdir)
                hl2 = _dot3(hv3, hv3)
                hl = jnp.sqrt(hl2)
                hl_z = hl == 0.0
                inv_hl = 1.0 / jnp.where(hl_z, 1.0, hl)
                bddv = _dot3(nn3, hv3)
                bdd = bddv * inv_hl
                bdd_pos = bdd > 0.0
                base_v = jnp.where(bdd_pos, bdd, 0.0)
                backf = base_v <= 0.0
                base_g = jnp.where(backf, 1.0, base_v)
                log_b = jnp.log(base_g)
                fs = jnp.where(backf, 0.0, jnp.exp(phong_e * log_b))
                wgt = jnp.where(lit, 1.0 - sh, 0.0)

                contrib = (fd * dif[0] + fs * spec * dif[0],
                           fd * dif[1] + fs * spec * dif[1],
                           fd * dif[2] + fs * spec * dif[2])
                final = (final[0] + wgt * contrib[0] * lcr,
                         final[1] + wgt * contrib[1] * lcg,
                         final[2] + wgt * contrib[2] * lcb)

                # ---- adjoints for this light ----
                lc3 = (zero + lcr, zero + lcg, zero + lcb)
                g_lcol = (wgt * contrib[0] * g_final[0],
                          wgt * contrib[1] * g_final[1],
                          wgt * contrib[2] * g_final[2])
                g_contrib = (wgt * lc3[0] * g_final[0],
                             wgt * lc3[1] * g_final[1],
                             wgt * lc3[2] * g_final[2])
                if march_steps is not None:
                    # wgt = where(sh_raw < 1, 1 - sh_raw, 0) and
                    # sh_raw = sum over okm steps of (1 - transp_occ):
                    # route the wgt cotangent to each step's occluder
                    # transparency (single-row scatter per step)
                    g_wgt = (contrib[0] * lc3[0] * g_final[0]
                             + contrib[1] * lc3[1] * g_final[1]
                             + contrib[2] * lc3[2] * g_final[2])
                    g_sh_raw = jnp.where(sh_raw < 1.0, -g_wgt, 0.0)
                    for okm, mask_s in march_steps:
                        g_tr_s = jnp.where(okm, -g_sh_raw, 0.0)
                        dtbl_ref[_PK_TRANSP:_PK_TRANSP + 1, :] += (
                            jax.lax.dot_general(
                                g_tr_s, mask_s, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                        )
                dg = _dot3(dif, g_contrib)
                g_fd = dg
                g_fs = spec * dg
                a_spec = a_spec + fs * dg
                a_dif = _add3(a_dif, _scale3(g_contrib, fd + fs * spec))
                a_phong = a_phong + jnp.where(backf, 0.0,
                                              fs * log_b * g_fs)
                g_base = jnp.where(backf, 0.0,
                                   fs * phong_e / base_g * g_fs)
                g_bdd = jnp.where(bdd_pos, g_base, 0.0)
                # bdd = (nn.hv) * inv_hl
                a_nn = _add3(a_nn, _scale3(hv3, g_bdd * inv_hl))
                ddhl = jnp.where(hl_z, 0.0,
                                 bddv * inv_hl * inv_hl * inv_hl)
                g_hv = (g_bdd * (nn3[0] * inv_hl - ddhl * hv3[0]),
                        g_bdd * (nn3[1] * inv_hl - ddhl * hv3[1]),
                        g_bdd * (nn3[2] * inv_hl - ddhl * hv3[2]))
                a_md = _add3(a_md, g_hv)
                g_sdir = g_hv
                g_fdd = jnp.where(fd_pos, g_fd, 0.0)
                a_nn = _add3(a_nn, _scale3(sdir, g_fdd))
                g_sdir = _add3(g_sdir, _scale3(nn3, g_fdd))
                # sdir = direction / where(dl==0, 1, dl)
                g_dir = _norm_vjp_guarded(sdir, inv_dl, dl_z, g_sdir)
                # direction: sun -> -vec ; point -> diff / guarded dist
                g_vec_sun = (-g_dir[0], -g_dir[1], -g_dir[2])
                g_diff = _norm_vjp_guarded(dir_pt, inv_ds, dist_z, g_dir)
                g_vec = _where3(is_sun, g_vec_sun, g_diff)
                a_pt = _sub3(a_pt, _where3(is_sun, _zeros3(zero), g_diff))
                # accumulate per-light partials (misc rows mirror the
                # light-table columns)
                mb = li * _MISC_LIGHT_ROWS
                dmisc_ref[mb + 1:mb + 2, :] += g_vec[0]
                dmisc_ref[mb + 2:mb + 3, :] += g_vec[1]
                dmisc_ref[mb + 3:mb + 4, :] += g_vec[2]
                dmisc_ref[mb + 4:mb + 5, :] += g_lcol[0]
                dmisc_ref[mb + 5:mb + 6, :] += g_lcol[1]
                dmisc_ref[mb + 6:mb + 7, :] += g_lcol[2]

            # ph = where(hit, final, 0); color += w_color * ph
            ph = _where3(hit, final, _zeros3(zero))
            if leaf:
                a_w = a_w + _dot3(ph, cot_c)
            else:
                # color term: d(weff * ph)/d(weff)
                g_weff = g_weff + _dot3(ph, cot_c)
                # weff = w (1 - f)
                a_w = a_w + (1.0 - f) * g_weff
                g_f = -w * g_weff
                if transp_id is not None:
                    # transp child w = w * f
                    a_w = a_w + f * g_w_t
                    g_f = g_f + w * g_w_t
                if any_transp:
                    a_row[_PK_TRANSP] = a_row[_PK_TRANSP] + jnp.where(
                        hit & (g["transp"] >= _EPS), g_f, 0.0)
            # ambient partial (row after the light blocks)
            ab = n_lights * _MISC_LIGHT_ROWS
            dmisc_ref[ab:ab + 1, :] += amb_g
            # material rows (all hit-gated through g_final)
            a_row[_PK_COL.start] = a_dif[0]
            a_row[_PK_COL.start + 1] = a_dif[1]
            a_row[_PK_COL.start + 2] = a_dif[2]
            a_row[_PK_SPEC] = a_row.get(_PK_SPEC, zero) + a_spec
            a_row[_PK_PHONG] = a_row.get(_PK_PHONG, zero) + a_phong

            # md = -nd
            a_nd = _sub3(a_nd, a_md)

            # root outputs: depth = t (inf on miss); normal = hit ? raw : 0
            a_normal = _zeros3(zero)
            if root:
                a_t = a_t + jnp.where(hit, cot_dep, 0.0)
                a_normal = _where3(hit, cot_n, _zeros3(zero))

            # point = o + t_safe * (is_sp ? nd : d)
            is_sp = g["is_sp"]
            a_o = _add3(a_o, a_pt)
            a_ts = a_ts + _dot3(a_pt, _where3(is_sp, nd3, d3))
            a_nd = _add3(a_nd, _where3(is_sp, _scale3(a_pt, t_safe),
                                       _zeros3(zero)))
            a_d = _add3(a_d, _where3(is_sp, _zeros3(zero),
                                     _scale3(a_pt, t_safe)))

            # nn = nrm / guarded |nrm| (replay do_node, |nrm|==0 -> /1);
            # nrm = where(hit, normal, unit_z)
            g_nrm = _norm_vjp_guarded(nn3, g["inv_nn"], g["nn_z"], a_nn)
            a_normal = _add3(a_normal, _where3(hit, g_nrm, _zeros3(zero)))

            # t_safe = where(hit, t, 1)
            a_t = a_t + jnp.where(hit, a_ts, 0.0)

            # ---- per-kind t / normal adjoints --------------------------
            is_tri = g["is_tri"]
            is_pl = g["is_pl"]
            g_t_tri = jnp.where(is_tri, a_t, 0.0)
            g_t_pl = jnp.where(is_pl, a_t, 0.0)
            g_t_sp = jnp.where(is_sp, a_t, 0.0)
            g_n_tri = _where3(is_tri, a_normal, _zeros3(zero))
            g_n_pl = _where3(is_pl, a_normal, _zeros3(zero))
            g_n_sp = _where3(is_sp, a_normal, _zeros3(zero))

            # triangle: t = (p2.n - o.n) * inv_a ; inv_a = 1/guard(d.n)
            p1, p2, p3 = g["p1"], g["p2"], g["p3"]
            nrm_t = g["nrm_t"]
            g_p1 = _zeros3(zero)
            g_p2 = _zeros3(zero)
            g_p3 = _zeros3(zero)
            g_ntri_raw = _zeros3(zero)  # w.r.t. the cross product n
            g_snum = g_t_tri * g["inv_a"]
            g_inv = g_t_tri * g["s_num"]
            g_alpha = jnp.where(g["alpha_z"], 0.0,
                                -g_inv * g["inv_a"] * g["inv_a"])
            g_p2 = _add3(g_p2, _scale3(nrm_t, g_snum))
            a_o = _sub3(a_o, _scale3(nrm_t, g_snum))
            g_ntri_raw = _add3(g_ntri_raw,
                               _scale3(_sub3(p2, o3), g_snum))
            a_d = _add3(a_d, _scale3(nrm_t, g_alpha))
            g_ntri_raw = _add3(g_ntri_raw, _scale3(d3, g_alpha))
            # n = cross(a, b): g_a = b x g_n ; g_b = g_n x a
            g_a3 = _cross3(g["b3"], g_ntri_raw)
            g_b3 = _cross3(g_ntri_raw, g["a3"])
            # shading normal: n_tri = ncr * inv_nl (guard nl2 == 0)
            g_ncr = _norm_vjp_guarded(g["n_tri"], g["inv_nl"],
                                      g["nl2_z"], g_n_tri)
            # ncr = -(b x q)
            g_ncr_neg = (-g_ncr[0], -g_ncr[1], -g_ncr[2])
            g_b3 = _add3(g_b3, _cross3(g["q3"], g_ncr_neg))
            g_q3 = _cross3(g_ncr_neg, g["b3"])
            # a = p2 - p1 ; b = p2 - p3 ; q = p1 - p3
            g_p2 = _add3(g_p2, _add3(g_a3, g_b3))
            g_p1 = _add3(_sub3(g_p1, g_a3), g_q3)
            g_p3 = _sub3(_sub3(g_p3, g_b3), g_q3)

            # plane: t = (kp - o.pn) * inv_den ; normal = pn (raw)
            pn = g["pn"]
            g_num_pl = g_t_pl * g["inv_den"]
            g_invden = g_t_pl * g["pl_num"]
            g_den = jnp.where(g["den_z"], 0.0,
                              -g_invden * g["inv_den"] * g["inv_den"])
            g_A_pl = _scale3(pn, g_num_pl)
            a_o = _sub3(a_o, _scale3(pn, g_num_pl))
            g_pn = _add3(_add3(_scale3(_sub3(g["p1"], o3), g_num_pl),
                               _scale3(d3, g_den)),
                         g_n_pl)
            a_d = _add3(a_d, _scale3(pn, g_den))

            # sphere
            cC = g["cC"]
            nd_s = nd3
            g_cC = _zeros3(zero)
            a_nd_sp = _zeros3(zero)
            # n_sp = nsp * inv_nil (guard); nsp = pt - c; pt = o + t*nd
            g_nsp = _norm_vjp_guarded(g["n_sp"], g["inv_nil"],
                                      g["nil2_z"], g_n_sp)
            g_pt_sp = g_nsp
            g_cC = _sub3(g_cC, g_nsp)
            a_o = _add3(a_o, g_pt_sp)
            g_t_sp = g_t_sp + _dot3(g_pt_sp, nd_s)
            a_nd_sp = _add3(a_nd_sp, _scale3(g_pt_sp, g["t_sp"]))
            # t_sp = sel0 ? dec - sq : (sel1 ? dec + sq : 1)
            g_dec = jnp.where(g["sel0"] | g["sel1"], g_t_sp, 0.0)
            g_sq = (jnp.where(g["sel1"], g_t_sp, 0.0)
                    - jnp.where(g["sel0"], g_t_sp, 0.0))
            # sq = sqrt(guard(sub)); sub = dec^2 - ec2 + r2
            g_sub = jnp.where(g["missed"], 0.0, 0.5 / g["sq"] * g_sq)
            g_dec = g_dec + 2.0 * g["dec"] * g_sub
            g_ec2 = -g_sub
            g_r2 = g_sub
            g_rad = 2.0 * g["rad"] * g_r2
            # dec = nd.c - nd.o
            a_nd_sp = _add3(a_nd_sp, _scale3(_sub3(cC, o3), g_dec))
            g_cC = _add3(g_cC, _scale3(nd_s, g_dec))
            a_o = _sub3(a_o, _scale3(nd_s, g_dec))
            # ec2 = o.o - 2 o.c + c.c
            a_o = _add3(a_o, _scale3(_sub3(o3, cC), 2.0 * g_ec2))
            g_cC = _add3(g_cC, _scale3(_sub3(cC, o3), 2.0 * g_ec2))
            a_nd = _add3(a_nd, _where3(is_sp, a_nd_sp, _zeros3(zero)))

            # nd = d / |d| (replay _normalize, unguarded)
            dnu = _dot3(nd3, a_nd)
            a_d = _add3(a_d, ((a_nd[0] - nd3[0] * dnu) * g["inv_dlen"],
                              (a_nd[1] - nd3[1] * dnu) * g["inv_dlen"],
                              (a_nd[2] - nd3[2] * dnu) * g["inv_dlen"]))

            # ---- assemble per-row cotangents and scatter ---------------
            # geometry columns share rows across kinds; the one-hot mask
            # is zero for misses, so miss-lane garbage cannot leak.
            ztri = _zeros3(zero)
            gA = _add3(_add3(_where3(is_tri, g_p1, ztri),
                             _where3(is_pl, g_A_pl, ztri)),
                       _where3(is_sp, g_cC, ztri))
            gB = _add3(_where3(is_tri, g_p2, ztri),
                       _where3(is_pl, g_pn, ztri))
            gB = (gB[0] + jnp.where(is_sp, g_rad, 0.0), gB[1], gB[2])
            gC = _where3(is_tri, g_p3, ztri)
            grows_s[0:1, :] = gA[0]
            grows_s[1:2, :] = gA[1]
            grows_s[2:3, :] = gA[2]
            grows_s[3:4, :] = gB[0]
            grows_s[4:5, :] = gB[1]
            grows_s[5:6, :] = gB[2]
            grows_s[6:7, :] = gC[0]
            grows_s[7:8, :] = gC[1]
            grows_s[8:9, :] = gC[2]
            grows_s[9:10, :] = zero
            grows_s[10:11, :] = a_row[_PK_COL.start]
            grows_s[11:12, :] = a_row[_PK_COL.start + 1]
            grows_s[12:13, :] = a_row[_PK_COL.start + 2]
            grows_s[13:14, :] = a_row[_PK_SPEC]
            grows_s[14:15, :] = a_row[_PK_REFL]
            grows_s[15:16, :] = a_row[_PK_PHONG]
            grows_s[16:17, :] = a_row[_PK_TRANSP]
            grows_s[17:24, :] = jnp.zeros((7, tile_r), jnp.float32)
            dtbl_ref[...] += jax.lax.dot_general(
                grows_s[...], mask, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

            return a_o, a_d, a_w

        g_o, g_d, _ = bwd_node(0)

        drays_ref[0:1, :] = g_o[0]
        drays_ref[1:2, :] = g_o[1]
        drays_ref[2:3, :] = g_o[2]
        drays_ref[3:4, :] = g_d[0]
        drays_ref[4:5, :] = g_d[1]
        drays_ref[5:6, :] = g_d[2]
        drays_ref[6:8, :] = jnp.zeros((2, tile_r), jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("t_cnt", "p_cnt", "s_cnt", "n_lights", "bounces",
                     "any_refl", "any_transp", "shadow_steps", "n_nodes",
                     "tree", "interpret"),
)
def _run_replay_vjp(rays, codes_t, cot, tbl_t, lights, scalars,
                    t_cnt, p_cnt, s_cnt, n_lights, bounces, any_refl,
                    any_transp, shadow_steps, n_nodes, tree, interpret):
    n_tab = tbl_t.shape[1]
    r_pad = rays.shape[1]
    n_tiles = r_pad // TILE_R
    k_rows = codes_t.shape[0]
    misc_rows = n_lights * _MISC_LIGHT_ROWS + 8

    kernel = _make_replay_vjp_kernel(
        n_tab, t_cnt, p_cnt, s_cnt, n_lights, bounces, any_refl,
        any_transp, shadow_steps, TILE_R, n_nodes, tree,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:
        params = None
    drays, dtbl, dmisc = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const((_C_PAD, n_tab)),
            smem((max(1, n_lights), 8)),
            smem((1, 4)),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const((_C_PAD, n_tab)),
            const((misc_rows, TILE_R)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((_C_PAD, n_tab), jnp.float32),
            jax.ShapeDtypeStruct((misc_rows, TILE_R), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8 * max(1, n_nodes), TILE_R), jnp.float32),
            pltpu.VMEM((_C_PAD, TILE_R), jnp.float32),
            pltpu.VMEM((_C_PAD * max(1, n_nodes), TILE_R), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=params,
    )(rays, codes_t, cot, tbl_t, lights, scalars)
    return drays, dtbl, dmisc


def replay_vjp(soa, o, d, codes, cot, fudge, bounces: int, interpret):
    """The full fixed-topology backward for an opaque fused render:
    (g_soa, g_o, g_d) from topology codes and output cotangents, via the
    Pallas kernel above. Semantics match jax.vjp of
    ops.replay.replay_render_rays (tests/test_replay_vjp.py)."""
    sg = jax.lax.stop_gradient
    o0 = sg(soa.scene_center)
    t_cnt = soa.tri_p1.shape[0]
    p_cnt = soa.pl_point.shape[0]
    s_cnt = soa.sp_center.shape[0]
    n_tab = t_cnt + p_cnt + s_cnt
    _, topo_nodes = topo_layout(bounces, soa.any_reflective,
                                soa.any_transparent, soa.n_lights,
                                soa.shadow_steps)
    n_nodes = len(topo_nodes)
    tree = _build_tree(bounces, bool(soa.any_reflective),
                       bool(soa.any_transparent), soa.n_lights,
                       soa.shadow_steps)
    # the tree MUST assign the same code rows topo_layout/the fused
    # kernel emitted (both recursions are refl-first DF; this pins it)
    assert len(tree) == n_nodes and all(
        tree[k][0] == topo_nodes[k][1] and tree[k][1] == topo_nodes[k][2]
        for k in range(n_nodes)
    ), "replay_vjp tree out of sync with topo_layout"

    r = o.shape[0]
    r_pad = -(-r // TILE_R) * TILE_R
    pad = r_pad - r

    def pad_rows(x, fill):
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )

    oc = sg(o) - o0
    rays = jnp.concatenate(
        [pad_rows(oc, 0.0), pad_rows(sg(d), 1.0),
         jnp.full((r_pad, 1), jnp.float32(fudge)),
         jnp.zeros((r_pad, 1), jnp.float32)], axis=1,
    ).T  # (8, r_pad)
    codes_t = pad_rows(codes, -1).T  # (K, r_pad)
    cot_c, cot_dep, cot_nrm = cot
    cot8 = jnp.concatenate(
        [pad_rows(cot_c, 0.0), pad_rows(cot_dep[:, None], 0.0),
         pad_rows(cot_nrm, 0.0), jnp.zeros((r_pad, 1), jnp.float32)],
        axis=1,
    ).T  # (8, r_pad)

    def park(s):
        """Everything the kernel differentiates w.r.t., as the small
        tensors it actually consumes: vjp through this routes the
        kernel's cotangents to the scene leaves."""
        return (_recentered_table(s, o0), _light_table_diff(s, o0),
                s.ambient)

    tbl, lights, _ = park(soa)
    tbl_t = jnp.zeros((_C_PAD, n_tab), jnp.float32).at[:17].set(sg(tbl).T)
    scalars = jnp.stack(
        [sg(soa.ambient).astype(jnp.float32), jnp.float32(fudge),
         jnp.float32(0), jnp.float32(0)]
    ).reshape(1, 4)

    drays, dtbl, dmisc = _run_replay_vjp(
        rays, codes_t, cot8, tbl_t, sg(lights), scalars,
        t_cnt=t_cnt, p_cnt=p_cnt, s_cnt=s_cnt, n_lights=soa.n_lights,
        bounces=bounces, any_refl=bool(soa.any_reflective),
        any_transp=bool(soa.any_transparent),
        shadow_steps=int(soa.shadow_steps),
        n_nodes=n_nodes, tree=tree,
        interpret=bool(interpret),
    )

    g_o = drays[0:3, :r].T
    g_d = drays[3:6, :r].T
    d_tbl = dtbl[:17].T  # (N, 17)
    # cotangent for park's light table: must match its SoA-PADDED shape
    # (n_lights == 0 still yields a (1, 8) zero row — ADVICE r4 medium)
    d_lights = jnp.zeros(lights.shape, jnp.float32)
    if soa.n_lights:
        d_lights = d_lights.at[:soa.n_lights].set(jnp.stack([
            jnp.concatenate([
                jnp.zeros((1,), jnp.float32),
                jnp.sum(dmisc[li * _MISC_LIGHT_ROWS + 1:
                              li * _MISC_LIGHT_ROWS + 7], axis=1),
                jnp.zeros((1,), jnp.float32),
            ])
            for li in range(soa.n_lights)
        ]))
    d_ambient = jnp.sum(dmisc[soa.n_lights * _MISC_LIGHT_ROWS])

    _, vjp = jax.vjp(park, soa)
    (g_soa,) = vjp((d_tbl, d_lights,
                    d_ambient.astype(soa.ambient.dtype)))
    return g_soa, g_o, g_d
