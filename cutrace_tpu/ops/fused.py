"""Fused wavefront Pallas kernel: the whole pixel pipeline in one kernel.

The reference runs cast + shadow marches + the bounce recursion for a pixel
inside a single CUDA kernel with zero host round trips
(/root/reference/inc/kernel.hpp:35-60, shading.hpp:22-154). Round 1 put only
the nearest-hit cast in Pallas; phong, the shadow march and the wavefront
bookkeeping were hundreds of XLA fusions with the pallas custom-call as a
fusion barrier at every cast site — ~80 % of the frame (docs/performance.md).
This kernel is the TPU answer to the reference's megakernel: one grid step
processes one 512-ray tile (a 32x16 pixel block) through

    primary cast -> [per level: phong (per light: shadow-march casts)
                     -> spawn reflection/transparency children]

entirely in VMEM. Scene tables (cluster triangle constants, per-slot shading
attributes, plane/sphere rows, material params) are VMEM-resident for the
whole grid (constant block index -> fetched once), lights and scalars sit in
SMEM, and a tile's rays never touch HBM between casts.

Kernel shapes (same conventions as ops/pallas_cast.py):
  * rays on sublanes: per-ray data is (TILE_R, 1); per-(ray, triangle) data
    is a dense (TILE_R, C) tile with the cluster's C triangles on lanes.
  * the primary cast culls clusters via the XLA-precomputed scalar-prefetch
    bitmask (hits[i, mi] — an SMEM read, no VPU->scalar stall).
  * secondary casts (shadow, bounce) cull in-kernel with ONE vector->scalar
    sync per cast: the (TILE_R, M) slab test reduces to an M-bit mask packed
    into a single SMEM scalar (sum of 2^mi), and the per-cluster branch is a
    scalar bit test. (Round 1 measured ~1 us per vector->scalar sync; one
    per cast instead of one per cluster.)
  * winner ATTRIBUTES (shading normal, material params, object id, sphere
    center) are accumulated during the cluster loop as one-hot masked sums
    over the (TILE_R, C) tile — no gathers, which Mosaic laces poorly.

Differentiation contract: the kernel is FORWARD-ONLY; `fused_render_rays`
wraps it in jax.custom_vjp. Where `replay_supported`, the forward also
emits per-ray TOPOLOGY CODES and the backward differentiates the cast-free
code-driven replay (ops/replay.py — gathers + shading math, no casts);
otherwise the backward re-runs the composable JAX path
(render.shading.ray_color + ops.intersect.ray_cast) and differentiates
that. Either way jax.grad through a fused render is exact w.r.t. the same
fixed-topology semantics, never silently zero. Scene semantics match the
composable path to ~1e-4 (tests/test_fused.py, test_replay.py); the
composable path remains the oracle.

Scope: any scene whose unrolled bounce tree stays within 63 nodes
(two-branch trees at the reference CLI's bounces=5 included; since the
depth-first tile-dead skipping, dead nodes cost one scalar sync). Cluster
tables are VMEM-resident up to ~256k triangle slots and HBM-streamed per
visited cluster beyond (the round-3 default — measured faster than the
composable streamed pipeline at every config); render.renderer.render()
falls back to the composable pipeline past the 63-node budget or the
stacked-table HBM bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 512
_BIG = 2**30
_BIGF = float(2**30)
_EPS = 1e-6  # material activity threshold (default_schema.hpp:334-335)

# attribute column layout in the per-ray winner scratch (TILE_R, 16)
_A_OBJ = 0
_A_NX, _A_NY, _A_NZ = 1, 2, 3
_A_CR, _A_CG, _A_CB = 4, 5, 6
_A_SPEC, _A_REFL, _A_PHONG, _A_TRANSP = 7, 8, 9, 10
_A_SPH = 11
_A_CX, _A_CY, _A_CZ = 12, 13, 14
# winner topology code (emit_topo kernels only): original flat triangle
# index / T + plane idx / T + P + sphere idx / -1 miss (ops/replay.py).
# f32 rows are exact for codes < 2^24 (buffers are bounded far below that).
_A_CODE = 15

# (Per-visit attribute accumulation is down to identity/geometry columns
# + the material INDEX since round 3 — both kernels define their reduced
# attr tuples locally and materialize material params once per cast via
# the (8, n_mats) table.)

# plane/sphere tables are (24, N): rows 0-14 mirror the attr columns
# (planes: is_sphere/center rows are 0; spheres: rows 11-14 = 1, cx, cy, cz),
# row 15-… hold cast constants, validity, topology code, material index.
_ROW_KP = 15      # planes: dot(point - o0, normal)
_ROW_R2 = 15      # spheres: radius^2
_ROW_VALID = 16
_ROW_CODE = 17    # topology code of this primitive (see _A_CODE)
_ROW_MAT = 18     # material INDEX (sublane kernel's deferred mat lookup)
_PS_ROWS = 24

_CAST_CONSTS = (
    "n0", "n1", "n2", "ub0", "ub1", "ub2", "ug0", "ug1", "ug2",
    "a0", "a1", "a2", "b0", "b1", "b2", "k", "order", "valid",
)
_SHADE_CONSTS = (
    "snx", "sny", "snz", "obj", "colr", "colg", "colb",
    "spec", "refl", "phong", "transp", "mat",
)
_TABLE_NAMES = _CAST_CONSTS + _SHADE_CONSTS
# rows streamed per visited cluster in the HBM-stacked (M, 24, C) layout
# (sublane kernel): the 18 cast constants + the 5 winner attributes the
# visits actually read. Material parameters (colr..transp) never stream —
# they are deferred to the per-cast one-hot over the (8, n_mats) VMEM
# table — which cuts the per-visit DMA 25% vs stacking all 30 names.
# Row 23 pads to the (8, 128) tile.
_HBM_STREAM_NAMES = _CAST_CONSTS + ("snx", "sny", "snz", "obj", "mat")
_TROW = {name: i for i, name in enumerate(_HBM_STREAM_NAMES)}
_HBM_TAB_ROWS = 24
# material-parameter table rows ((8, n_mats) VMEM operand): the sublane
# kernel's visits accumulate only the winner's material INDEX and params
# are fetched once per cast by a one-hot over this table
_MATP_ROWS = ("colr", "colg", "colb", "spec", "refl", "phong", "transp")
# Above this many (cluster x slot) table entries (~29 tables x slots x 4B =
# 30 MB of VMEM) the tables move to HBM and each visited cluster is DMA'd
# into a VMEM scratch block per visit (the streamed sublane kernel).
_VMEM_TABLE_SLOTS = 262144
# cluster AABBs for the in-kernel secondary-cast cull: (8, M) rows
# [bmin x y z, bmax x y z, 0, 0]
_AABB_ROWS = 8
_SUPER_FAR = 1.0e8  # empty-cluster sentinel (matches ops/bvh._FAR)
# Transparent-scene topology emission in the sublane kernel statically
# unrolls nodes x (1 + lights x shadow_steps) cast bodies (see
# _make_kernel's topo_static): cap the program size it may reach.
_SUBLANE_TOPO_MAX_CASTS = 128
# Above this cluster count the sublane kernel's secondary culls go
# hierarchical: exact slab over the ceil(M/32) supercluster (word) AABBs
# + O(M) conservative interval refine per cluster, instead of the exact
# (tile_r, M) per-cluster slab whose vector volume dominates big-M casts.
_SUPER_MIN_M = 256


def _n_wave_nodes(bounces, any_refl, any_transp):
    """Total bounce-tree nodes after static pruning (render/shading.py)."""
    if any_refl and any_transp:
        return 2 ** (bounces + 1) - 1
    if any_refl or any_transp:
        return bounces + 1
    return 1


def fused_supported(soa, accel, bounces: int) -> bool:
    """Static feasibility: tables fit VMEM and the unrolled tree is sane."""
    if accel is None or accel.kind != "fused":
        return False
    m, c = accel.order.shape
    # ~30 tables * m * c * 4B: up to 262144 slots (256k triangles at
    # C=256) the cluster tables are VMEM-resident (~30 MB, inside the
    # 100 MB scoped budget). Beyond it the HBM-streamed variant
    # (hbm_tables in _make_kernel) takes over — DEFAULT since round 3:
    # with 128-ray tiles + C=256 + deferred material lookups it measures
    # FASTER than the composable streamed pipeline at every config (1M
    # triangles 480x270 b2: 1.14 vs 1.67 s; even round 2's 12x-loss
    # config, 160x90 b2, is now 0.57 vs 0.61 s — the smaller per-tile
    # visit unions amortized away the per-visit DMA that killed it).
    # CUTRACE_FUSED_HBM=0 opts out; scene size is bounded by the stacked
    # HBM table (128 B per triangle slot).
    if m * c > _VMEM_TABLE_SLOTS:
        import os

        if os.environ.get("CUTRACE_FUSED_HBM") == "0":
            return False
        if m * _HBM_TAB_ROWS * c * 4 > 8 * 2**30:  # ~16M triangle slots
            return False
    # The in-kernel unroll costs ~2 cast blocks per wave node (the light
    # and shadow-march loops are dynamic fori_loops, so they don't
    # multiply program size). 63 nodes = a two-branch bounces=5 tree
    # (sphere_plane.json at the reference CLI's settings) compiles in a
    # few minutes (one-time, persistently cached); beyond that the
    # composable wavefront takes over.
    if _n_wave_nodes(bounces, soa.any_reflective, soa.any_transparent) > 63:
        return False
    return True


# --------------------------------------------------------------------------
# table construction (traced, forward-only: everything stop-gradiented)
# --------------------------------------------------------------------------


def _tables(soa, accel, o0):
    """All VMEM tables for the kernel, recentered by o0."""
    from cutrace_tpu.ops.bvh import clusters_from_accel
    from cutrace_tpu.ops.pallas_cast import _cluster_constants

    sg = jax.lax.stop_gradient
    clusters = sg(clusters_from_accel(soa, accel))
    t = dict(_cluster_constants(clusters, o0))  # 18 x (M, C)

    # per-slot shading attributes
    sn = -jnp.cross(clusters.p2 - clusters.p3, clusters.p1 - clusters.p3)
    sn = sn / jnp.sqrt(jnp.sum(sn * sn, axis=-1, keepdims=True))
    mat = clusters.mat
    col = sg(soa.mat_color)[mat]  # (M, C, 3)
    t.update(
        snx=sn[..., 0], sny=sn[..., 1], snz=sn[..., 2],
        obj=clusters.obj.astype(jnp.float32),
        colr=col[..., 0], colg=col[..., 1], colb=col[..., 2],
        spec=sg(soa.mat_specular)[mat],
        refl=sg(soa.mat_reflect)[mat],
        phong=sg(soa.mat_phong)[mat],
        transp=sg(soa.mat_transparency)[mat],
        mat=mat.astype(jnp.float32),
    )

    m = clusters.bmin.shape[0]
    aabb = jnp.zeros((_AABB_ROWS, m), jnp.float32)
    aabb = aabb.at[0:3].set((clusters.bmin - o0).T)
    aabb = aabb.at[3:6].set((clusters.bmax - o0).T)

    # Supercluster (per-32-cluster-word) AABBs for the big-M hierarchical
    # cull (third hierarchy level): clusters are median-split leaves in
    # tree order, so 32 consecutive clusters are a compact subtree and
    # their merged AABB is tight. Empty clusters sit at the +FAR sentinel
    # and merge harmlessly (the word then never survives unless a live
    # cluster does... sentinel boxes are points at +FAR, never hit).
    g = -(-m // 32)
    pad = g * 32 - m
    bmn = jnp.concatenate(
        [clusters.bmin - o0,
         jnp.full((pad, 3), _SUPER_FAR, jnp.float32)]) if pad else (
        clusters.bmin - o0)
    bmx = jnp.concatenate(
        [clusters.bmax - o0,
         jnp.full((pad, 3), _SUPER_FAR, jnp.float32)]) if pad else (
        clusters.bmax - o0)
    aabb2 = jnp.zeros((_AABB_ROWS, g), jnp.float32)
    aabb2 = aabb2.at[0:3].set(jnp.min(bmn.reshape(g, 32, 3), axis=1).T)
    aabb2 = aabb2.at[3:6].set(jnp.max(bmx.reshape(g, 32, 3), axis=1).T)

    # two-level exact cull table: columns [0:m3) = cluster AABBs padded to
    # a 128 multiple with the never-hit sentinel, [m3:m3+g3) = the
    # 128-cluster-group AABBs (fused.py group-exact branch)
    g3 = -(-m // 128)
    m3 = g3 * 128
    pad3 = m3 - m
    bmn3 = jnp.concatenate(
        [clusters.bmin - o0,
         jnp.full((pad3, 3), _SUPER_FAR, jnp.float32)]) if pad3 else (
        clusters.bmin - o0)
    bmx3 = jnp.concatenate(
        [clusters.bmax - o0,
         jnp.full((pad3, 3), _SUPER_FAR, jnp.float32)]) if pad3 else (
        clusters.bmax - o0)
    aabbg = jnp.zeros((_AABB_ROWS, m3 + g3), jnp.float32)
    aabbg = aabbg.at[0:3, :m3].set(bmn3.T)
    aabbg = aabbg.at[3:6, :m3].set(bmx3.T)
    aabbg = aabbg.at[0:3, m3:].set(
        jnp.min(bmn3.reshape(g3, 128, 3), axis=1).T)
    aabbg = aabbg.at[3:6, m3:].set(
        jnp.max(bmx3.reshape(g3, 128, 3), axis=1).T)

    def kind_rows(n, normal, col_k, mats, mat_idx, obj, valid, is_sphere,
                  center, extra, code_base):
        rows = jnp.zeros((_PS_ROWS, n), jnp.float32)
        rows = rows.at[_A_OBJ].set(obj.astype(jnp.float32))
        rows = rows.at[_A_NX:_A_NZ + 1].set(normal.T)
        rows = rows.at[_A_CR:_A_CB + 1].set(col_k.T)
        rows = rows.at[_A_SPEC].set(mats[0])
        rows = rows.at[_A_REFL].set(mats[1])
        rows = rows.at[_A_PHONG].set(mats[2])
        rows = rows.at[_A_TRANSP].set(mats[3])
        rows = rows.at[_A_SPH].set(jnp.full((n,), float(is_sphere)))
        rows = rows.at[_A_CX:_A_CZ + 1].set(center.T)
        rows = rows.at[15].set(extra)
        rows = rows.at[_ROW_VALID].set(valid.astype(jnp.float32))
        rows = rows.at[_ROW_CODE].set(
            code_base + jnp.arange(n, dtype=jnp.float32)
        )
        rows = rows.at[_ROW_MAT].set(mat_idx.astype(jnp.float32))
        return rows

    def mat_params(idx):
        return (
            sg(soa.mat_specular)[idx], sg(soa.mat_reflect)[idx],
            sg(soa.mat_phong)[idx], sg(soa.mat_transparency)[idx],
        )

    n_tri_slots = soa.tri_p1.shape[0]
    pln = sg(soa.pl_normal)
    ppt = sg(soa.pl_point) - o0
    plane = kind_rows(
        pln.shape[0], pln, sg(soa.mat_color)[soa.pl_mat],
        mat_params(soa.pl_mat), soa.pl_mat, soa.pl_obj, sg(soa.pl_valid),
        0.0, jnp.zeros_like(pln), jnp.sum(ppt * pln, axis=-1),
        float(n_tri_slots),
    )

    spc = sg(soa.sp_center) - o0
    spr = sg(soa.sp_radius)
    # sphere shading normal rows unused (computed from the hit point);
    # normal rows hold zeros
    sphere = kind_rows(
        spc.shape[0], jnp.zeros_like(spc), sg(soa.mat_color)[soa.sp_mat],
        mat_params(soa.sp_mat), soa.sp_mat, soa.sp_obj, sg(soa.sp_valid),
        1.0, spc, spr * spr,
        float(n_tri_slots + soa.pl_point.shape[0]),
    )

    # (8, n_mats) material-parameter rows in _MATP_ROWS order (sublane
    # kernel's per-cast one-hot lookup; row 7 zero padding)
    mc = sg(soa.mat_color)
    mat_tab = jnp.stack([
        mc[:, 0], mc[:, 1], mc[:, 2],
        sg(soa.mat_specular), sg(soa.mat_reflect),
        sg(soa.mat_phong), sg(soa.mat_transparency),
        jnp.zeros_like(sg(soa.mat_specular)),
    ])
    return t, aabb, aabb2, aabbg, plane, sphere, mat_tab


def _sublane_table_names(mxu_visits):
    """Per-name (M, C) VMEM operands the sublane kernel consumes. In MXU
    mode the 16 cast-constant rows (n*, ub*, ug*, a*, b*, k) live only
    inside the packed weight blocks, so they are dropped from the VMEM
    operand list (15 MB at the 256k flagship)."""
    if mxu_visits:
        return ("order", "valid") + _SHADE_CONSTS
    return _TABLE_NAMES


def _mxu_weight_blocks(tables):
    """(M, 32, C) matmul weight blocks for the MXU-form visit math.

    The visit's four per-slot quantities are linear in per-ray vectors
    (d, w = d x o, o), so each is one (tile_r, 8) @ (8, C) matmul on the
    otherwise-idle MXU instead of ~33 VPU elementwise ops per slot:

      rows  0:8   alpha   = d.n            vs R_dw = [d, w, 0, 0]
      rows  8:16  beta_n  = d.ub - w.b     vs R_dw
      rows 16:24  gamma_n = w.a - d.ug     vs R_dw
      rows 24:32  t_n     = k - o.n        vs R_o1 = [o, 1, 0, 0, 0, 0]

    The minus signs are folded into the weights; k rides as the constant
    row against R_o1's 1-lane. Accumulation order/rounding differs from
    the VPU form (MXU passes), so MXU-vs-VPU parity is allclose, not
    bit-identical — in-kernel winner logic only ever compares the kernel's
    own values, so tie-breaks stay self-consistent."""
    m, c = tables["k"].shape
    z = jnp.zeros((m, c), jnp.float32)
    rows = [
        tables["n0"], tables["n1"], tables["n2"], z, z, z, z, z,
        tables["ub0"], tables["ub1"], tables["ub2"],
        -tables["b0"], -tables["b1"], -tables["b2"], z, z,
        -tables["ug0"], -tables["ug1"], -tables["ug2"],
        tables["a0"], tables["a1"], tables["a2"], z, z,
        -tables["n0"], -tables["n1"], -tables["n2"], tables["k"],
        z, z, z, z,
    ]
    return jnp.stack(rows, axis=1)


def _mxu_weight_blocks16(tables):
    """(M, 16, 4C) combined weight block: ONE (tile_r, 16) @ (16, 4C)
    matmul per visit computes all four per-slot quantities side by side
    (lane blocks [alpha | beta_n | gamma_n | t_n]), against
    R16 = [d, w, o, 1, 0...]. Same algebra as _mxu_weight_blocks with the
    four K=8 contractions fused into one K=16 — quarter the per-visit
    matmul count (the fixed cost the 4-dot form measured to be paying)."""
    m, c = tables["k"].shape
    z = jnp.zeros((m, c), jnp.float32)

    def block(rows3):
        """(M, 16, C) from a dict of row-index -> (M, C)."""
        return jnp.stack([rows3.get(i, z) for i in range(16)], axis=1)

    alpha = block({0: tables["n0"], 1: tables["n1"], 2: tables["n2"]})
    beta = block({0: tables["ub0"], 1: tables["ub1"], 2: tables["ub2"],
                  3: -tables["b0"], 4: -tables["b1"], 5: -tables["b2"]})
    gamma = block({0: -tables["ug0"], 1: -tables["ug1"],
                   2: -tables["ug2"],
                   3: tables["a0"], 4: tables["a1"], 5: tables["a2"]})
    tq = block({6: -tables["n0"], 7: -tables["n1"], 8: -tables["n2"],
                9: tables["k"]})
    return jnp.concatenate([alpha, beta, gamma, tq], axis=2)


def _light_table(soa, o0):
    """(L, 8) f32 SMEM rows: [kind, vx, vy, vz, cr, cg, cb, 0]. Point-light
    positions recentered by o0 (every position in-kernel is recentered);
    sun directions are translation-invariant and stay as authored."""
    sg = jax.lax.stop_gradient
    kind = soa.light_kind.astype(jnp.float32)[:, None]
    is_sun = (soa.light_kind == 0)[:, None]
    vec = jnp.where(is_sun, sg(soa.light_vec), sg(soa.light_vec) - o0)
    color = sg(soa.light_color)
    pad = jnp.zeros((kind.shape[0], 1), jnp.float32)
    return jnp.concatenate([kind, vec, color, pad], axis=1)


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _ceil_to(x, m):
    return -(-x // m) * m


def _mxu_visits_enabled():
    """MXU-form visit math for the sublane (big-M) kernel
    (CUTRACE_MXU_VISITS): 0 = VPU elementwise form (default), 1 = four
    (tile_r, 8) @ (8, C) matmuls per visit (_mxu_weight_blocks), 2 = ONE
    combined (tile_r, 16) @ (16, 4C) matmul per visit
    (_mxu_weight_blocks16). The MXU forms are allclose to the VPU form,
    not bit-identical: dot accumulation order differs."""
    import os

    return int(os.environ.get("CUTRACE_MXU_VISITS", "0") or 0)


def _mxu_precision():
    """MXU pass count for the visit matmuls (CUTRACE_MXU_PRECISION):
    highest = fp32-faithful multi-pass (the default), default = one bf16
    pass (A/B instrumentation only: ~1e-3 relative is outside the
    renderer's parity budget — and it measured SLOWER anyway, see the
    negative-results log). bf16x3 (HIGH) is not offered: Mosaic raises
    NotImplementedError for HIGH-precision dots."""
    import os

    name = os.environ.get("CUTRACE_MXU_PRECISION", "highest")
    return {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def _prefetch_primary_ok(n_tiles: int, m: int) -> bool:
    """Whether the primary-cast cull can use prefetched SMEM mask words:
    the (n_tiles * ceil(M/32)) int32 prefetch operand must leave room in
    the chip's ~1 MiB SMEM. Past that the root cast culls in-kernel like
    the secondaries (sound; slightly looser for incoherent tiles).
    CUTRACE_PREFETCH_PRIMARY=0 forces the in-kernel path (experiments)."""
    import os

    if os.environ.get("CUTRACE_PREFETCH_PRIMARY") == "0":
        return False
    return n_tiles * (-(-m // 32)) * 4 <= 512 * 1024


def _make_kernel(m, n_pl, n_sp, n_lights, bounces, shadow_steps,
                 any_refl, any_transp, tile_r, secondary_cull,
                 has_planes, has_spheres, node_skip=True, emit_topo=False,
                 hbm_tables=False, prefetch_primary=True,
                 mxu_visits=False, mxu_precision=None):
    """Build the fused kernel body (python-specialized on static config).

    `has_planes`/`has_spheres` statically elide whole primitive kinds
    (empty kinds carry only a never-hit padding row — soa.py); an opaque
    scene (not any_transp) replaces every shadow march with a single
    any-hit occlusion query (one occluder saturates the accumulated
    opacity, shading.hpp:22-45).

    `hbm_tables`: cluster tables arrive as ONE stacked (M, 32, C) HBM
    operand instead of 29 VMEM-resident (M, C) arrays; each visited
    cluster's block is DMA'd into a VMEM scratch before its triangle math
    — scene size is then bounded by HBM, not VMEM, with shading still
    fused. `prefetch_primary=False` culls the root cast in-kernel too
    (the (n_tiles, M/32) prefetch words outgrow SMEM at large M).

    `emit_topo` (OPAQUE scenes only here): appends 2 out columns per
    bounce-tree node — winner code + per-light occlusion flags packed as
    bits (flag_col += occ * 2^light). Mosaic cannot dynamically index the
    lane dimension, so per-light columns are impossible in this layout;
    the bit-packing keeps the column index static while the light loop
    stays a dynamic fori. _fused_forward unpacks to the standard
    ops/replay.py row layout."""
    n_words = -(-m // 32)  # packed cull-mask words per tile
    opaque = not any_transp
    # Topology emission in the sublane layout comes in two flavors:
    #   * opaque: 2 static out columns per node (winner code + per-light
    #     occlusion flags bit-packed by a doubling scalar carry) — light
    #     loop stays a dynamic fori.
    #   * transparent (topo_static): per-STEP occluder codes can't be
    #     bit-packed (24-bit values) and Mosaic cannot dynamically index
    #     the lane (column) dimension, so the light AND march loops unroll
    #     statically and each step writes its code to its own static
    #     column (one column per ops/replay.py topo row). Compile cost is
    #     nodes x (1 + lights x steps) cast bodies — replay_supported
    #     gates this on _SUBLANE_TOPO_MAX_CASTS.
    topo_static = emit_topo and not opaque
    # Deferred material fetch (sublane only): visits accumulate the
    # winner's material INDEX (one column, rides in the _A_CR slot during
    # the loop) instead of 7 materialized parameter columns; one one-hot
    # over the (8, n_mats) table after the merges materializes them. Cuts
    # the dominant per-visit attr work ~2x at big M.
    attrs_full = (
        ("obj", _A_OBJ),
        ("snx", _A_NX), ("sny", _A_NY), ("snz", _A_NZ),
        ("mat", _A_CR),
    ) + ((("order", _A_CODE),) if emit_topo else ())
    attrs_shadow = (("obj", _A_OBJ), ("mat", _A_CR)) + (
        (("order", _A_CODE),) if topo_static else ())
    if emit_topo:
        from cutrace_tpu.ops.replay import topo_layout

        _, _topo_nodes = topo_layout(bounces, any_refl, any_transp,
                                     n_lights, shadow_steps)
    # cost-attribution ablation knobs (see _make_kernel_lanes): wrong
    # output, exact timing; never set in production
    import os as _os_ab

    ablate = set(filter(None, _os_ab.environ.get(
        "CUTRACE_ABLATE", "").split(",")))
    # near-to-far ordered group visits: opt-in negative result (see the
    # group-rank block below for the A/B numbers)
    group_order = ("noorder" not in ablate
                   and _os_ab.environ.get("CUTRACE_GROUP_ORDER") == "1")
    # Double-buffered HBM visit streaming (opt-out CUTRACE_HBM_DB=0;
    # nodma/nodb ablations force the synchronous path so the DMA share
    # stays measurable). MXU visit modes keep the synchronous v1 path
    # (negative results — not worth a second weight buffer).
    double_buf = (
        hbm_tables and mxu_visits == 0
        and "nodma" not in ablate and "nodb" not in ablate
        and _os_ab.environ.get("CUTRACE_HBM_DB", "1") == "1"
    )
    # streamed-block rows per slot (MXU mode 1 appends 32 weight rows)
    hbm_rows_k = _HBM_TAB_ROWS + (32 if mxu_visits == 1 else 0)

    # Hierarchical secondary cull (third hierarchy level): the exact
    # per-word supercluster slab AUGMENTS the interval per-cluster cull in
    # the M > _EXACT_CULL_MAX_M regime. It must never REPLACE the exact
    # per-cluster cull: measured on the 256k bunny (M=2048) at 960x540
    # b5, swapping exact-per-cluster for word-exact+interval blew the
    # frame 2.33 s -> 12.2 s — the interval refine is ~5x looser within a
    # surviving word and visit math dominates the cull math it saved.
    use_super = m > max(
        int(_os_ab.environ.get("CUTRACE_SUPER_MIN_M", _SUPER_MIN_M)),
        _EXACT_CULL_MAX_M if _os_ab.environ.get(
            "CUTRACE_SUPER_MIN_M") is None else 0,
    )

    if mxu_visits:
        _prec = mxu_precision or jax.lax.Precision.HIGHEST

        def _dot8(lhs, rhs):
            """(tile_r, 8) @ (8, C) on the MXU."""
            return jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                precision=_prec, preferred_element_type=jnp.float32,
            )

    def kernel(hits_ref, rays_ref, *rest):
        wgt_ref = None
        tab_hbm_w = wvm_s = None
        if hbm_tables:
            tab_hbm, rest = rest[0], rest[1:]
            if mxu_visits == 2:
                tab_hbm_w, rest = rest[0], rest[1:]
            tabs = None
            if mxu_visits == 2:
                (aabb_ref, aabb2_ref, aabbg_ref, mat_ref, plane_ref,
                 sphere_ref, lights_ref, scal_ref, out_ref, bt_s, bk_s,
                 at_s, mst_s, tree_s, bits_s, tvm_s, wvm_s,
                 dma_sem, dbuf_s) = rest
            else:
                (aabb_ref, aabb2_ref, aabbg_ref, mat_ref, plane_ref,
                 sphere_ref, lights_ref, scal_ref, out_ref, bt_s, bk_s,
                 at_s, mst_s, tree_s, bits_s, tvm_s,
                 dma_sem, dbuf_s) = rest
        else:
            names = _sublane_table_names(mxu_visits)
            n_tab = len(names)
            tabs = dict(zip(names, rest[:n_tab]))
            rest = rest[n_tab:]
            if mxu_visits:
                wgt_ref, rest = rest[0], rest[1:]
            (aabb_ref, aabb2_ref, aabbg_ref, mat_ref, plane_ref,
             sphere_ref, lights_ref, scal_ref, out_ref, bt_s, bk_s, at_s,
             mst_s, tree_s, bits_s) = rest

        node_counter = [0]  # DF node index (matches replay.topo_layout)

        i = pl.program_id(0)
        ambient = scal_ref[0, 0]
        fudge = scal_ref[0, 1]

        rays = rays_ref[:]
        ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        mind0 = rays[:, 6:7]

        inf = jnp.float32(jnp.inf)

        def norm3(x, y, z):
            return jnp.sqrt(x * x + y * y + z * z)

        def cast(cox, coy, coz, cdx, cdy, cdz, mind, full, primary,
                 ldist=None, alive=None):
            """Nearest hit over all kinds. Results land in bt_s (t) and
            at_s (winner attrs); returns nothing. `full` selects all attr
            columns vs obj+transparency only; `primary` uses the prefetch
            cull bitmask, secondaries the in-kernel one.

            `alive` ((tile_r, 1) bool) drops dead rays (missed earlier /
            zero weight / inactive march lane) from the in-kernel cull —
            output-invariant because every consumer multiplies a dead
            ray's result by an exact 0 (see the lanes kernel's cast).

            `ldist` switches to an any-hit OCCLUSION query (opaque-scene
            shadows): only "does any valid t in (mind, ldist) exist" is
            computed — bt_s becomes a per-ray 0/1 flag, and all winner
            bookkeeping (min-reductions, tie-break keys, one-hot attr
            accumulation) is elided."""
            occl = ldist is not None
            if occl:
                bt_s[:] = jnp.zeros((tile_r, 1), jnp.float32)
            else:
                bt_s[:] = jnp.full((tile_r, 1), inf, jnp.float32)
                bk_s[:] = jnp.full((tile_r, 1), _BIG, jnp.int32)
                at_s[:] = jnp.zeros((tile_r, 16), jnp.float32)
                at_s[:, _A_OBJ:_A_OBJ + 1] = jnp.full((tile_r, 1), _BIGF)
                if emit_topo:
                    at_s[:, _A_CODE:_A_CODE + 1] = jnp.full(
                        (tile_r, 1), -1.0
                    )

            attr_cols = attrs_full if full else attrs_shadow
            # w = d x o (per ray)
            wx = cdy * coz - cdz * coy
            wy = cdz * cox - cdx * coz
            wz = cdx * coy - cdy * cox

            if mxu_visits == 2:
                # combined per-cast ray matrix (_mxu_weight_blocks16)
                zc = jnp.zeros_like(cdx)
                r16 = jnp.concatenate(
                    [cdx, cdy, cdz, wx, wy, wz, cox, coy, coz,
                     jnp.ones_like(cox), zc, zc, zc, zc, zc, zc], axis=1)
            elif mxu_visits:
                # per-cast ray matrices for the MXU visit form (see
                # _mxu_weight_blocks): built once per cast, consumed by
                # every visit's (tile_r, 8) @ (8, C) matmuls
                zc = jnp.zeros_like(cdx)
                rdw = jnp.concatenate(
                    [cdx, cdy, cdz, wx, wy, wz, zc, zc], axis=1)
                ro1 = jnp.concatenate(
                    [cox, coy, coz, jnp.ones_like(cox), zc, zc, zc, zc],
                    axis=1)

            # normalized direction: spheres are parametric w.r.t. it
            # (reference quirk, default_schema.hpp:226-251) and shading
            # needs it regardless of sphere presence
            dlen = norm3(cdx, cdy, cdz)
            ndx, ndy, ndz = cdx / dlen, cdy / dlen, cdz / dlen

            # Plane/sphere intersections hoisted BEFORE the cluster loop:
            # computed once, consumed by (a) the t-bound cull refinement
            # and (b) the winner merges after the loop (merge ORDER stays
            # triangles -> planes -> spheres: tie-breaks unchanged).
            tp = okp = ts = oks = None
            if has_planes:
                # planes (default_schema.hpp:189-201)
                pnx = plane_ref[_A_NX:_A_NX + 1, :]
                pny = plane_ref[_A_NY:_A_NY + 1, :]
                pnz = plane_ref[_A_NZ:_A_NZ + 1, :]
                kp = plane_ref[_ROW_KP:_ROW_KP + 1, :]
                pvalid = plane_ref[_ROW_VALID:_ROW_VALID + 1, :]
                denom = cdx * pnx + cdy * pny + cdz * pnz  # (tile_r, P)
                on = cox * pnx + coy * pny + coz * pnz
                tp = (kp - on) / jnp.where(denom == 0.0, 1.0, denom)
                okp = (
                    (denom != 0.0) & jnp.isfinite(tp) & (tp > mind)
                    & (pvalid > 0.0)
                )
            if has_spheres:
                # spheres (default_schema.hpp:226-251): t parametric
                # w.r.t. the NORMALIZED direction (reference quirk)
                scx = sphere_ref[_A_CX:_A_CX + 1, :]
                scy = sphere_ref[_A_CY:_A_CY + 1, :]
                scz = sphere_ref[_A_CZ:_A_CZ + 1, :]
                r2 = sphere_ref[_ROW_R2:_ROW_R2 + 1, :]
                svalid = sphere_ref[_ROW_VALID:_ROW_VALID + 1, :]
                dec = (ndx * scx + ndy * scy + ndz * scz) - (
                    ndx * cox + ndy * coy + ndz * coz
                )
                oc = cox * scx + coy * scy + coz * scz
                ec2 = (cox * cox + coy * coy + coz * coz) - 2.0 * oc + (
                    scx * scx + scy * scy + scz * scz
                )
                sub = dec * dec - (ec2 - r2)
                missed = sub <= 0.0
                sq = jnp.sqrt(jnp.where(missed, 1.0, sub))
                t0 = dec - sq
                t1 = dec + sq
                v0 = ~missed & jnp.isfinite(t0) & (t0 > mind)
                v1 = ~missed & jnp.isfinite(t1) & (t1 > mind)
                ts = jnp.where(
                    v0 & v1, jnp.minimum(t0, t1),
                    jnp.where(v0, t0, jnp.where(v1, t1, inf)),
                )
                oks = (v0 | v1) & (svalid > 0.0)

            # t-bound cull refinement (nearest-hit casts; see the lanes
            # kernel for the soundness argument): clusters whose slab
            # entry lies beyond the ray's best plane/sphere hit can never
            # win the numeric (t, key) merge and drop out of the cull.
            t_bound = None
            if not occl and (has_planes or has_spheres):
                t_bound = jnp.full((tile_r, 1), inf, jnp.float32)
                if has_planes:
                    t_bound = jnp.minimum(t_bound, jnp.min(
                        jnp.where(okp, tp, inf), axis=1, keepdims=True))
                if has_spheres:
                    t_bound = jnp.minimum(t_bound, jnp.min(
                        jnp.where(oks, ts, inf), axis=1, keepdims=True))
            if occl and (has_planes or has_spheres):
                # occlusion decided by a plane/sphere: those rays need no
                # triangle visit — drop them from the cluster cull (their
                # flag is committed by the merges after the loop anyway)
                pocc = jnp.zeros((tile_r, 1), jnp.float32)
                if has_planes:
                    pocc = jnp.maximum(pocc, jnp.max(
                        jnp.where(okp & (tp < ldist), 1.0, 0.0),
                        axis=1, keepdims=True))
                if has_spheres:
                    pocc = jnp.maximum(pocc, jnp.max(
                        jnp.where(oks & (ts < ldist), 1.0, 0.0),
                        axis=1, keepdims=True))
                undecided = pocc < 0.5
                alive = undecided if alive is None else (alive & undecided)

            skip_cull = (("nocullo" in ablate and occl)
                         or ("nocull2" in ablate and not occl))
            interleave = None
            if secondary_cull and not primary and not skip_cull:
                # In-kernel secondary-cast cull, packed into ceil(M/32)
                # int32 SMEM words (2 vector->scalar syncs per word; an
                # unpacked per-cluster any() would stall the scalar core
                # ~1us per cluster).
                bmnx = aabb_ref[0:1, :]
                bmny = aabb_ref[1:2, :]
                bmnz = aabb_ref[2:3, :]
                bmxx = aabb_ref[3:4, :]
                bmxy = aabb_ref[4:5, :]
                bmxz = aabb_ref[5:6, :]

                def axis_minmax(bmn, bmx, o1, d1):
                    innv = 1.0 / d1  # +-inf on zero components
                    t1 = (bmn - o1) * innv  # (tile_r, M | G)
                    t2 = (bmx - o1) * innv
                    lo = jnp.minimum(t1, t2)
                    hi = jnp.maximum(t1, t2)
                    lo = jnp.where(jnp.isnan(lo), 0.0, lo)
                    hi = jnp.where(jnp.isnan(hi), inf, hi)
                    return lo, hi

                def exact_anyray(ref, n_boxes, at=0, tbound=None,
                                 alive_=None, want_entry=False):
                    """Exact per-ray slab over `n_boxes` boxes of `ref`
                    starting at STATIC column `at`, reduced to the
                    (1, n_boxes) any-alive-ray-touches mask (with the
                    cast's ldist / t_bound / alive refinements).
                    `tbound`/`alive_` override the cast-level bounds with
                    REFRESHED per-ray state (the group-interleaved loop
                    below tightens them with the evolving bt_s).
                    `want_entry` also returns the per-box MIN slab entry
                    over the passing rays ((1, n_boxes), +inf where none)
                    — the near-to-far group ordering key."""
                    tbound = t_bound if tbound is None else tbound
                    alive_ = alive if alive_ is None else alive_
                    sl = slice(at, at + n_boxes)
                    lx, hx = axis_minmax(ref[0:1, sl], ref[3:4, sl],
                                         cox, cdx)
                    ly, hy = axis_minmax(ref[1:2, sl], ref[4:5, sl],
                                         coy, cdy)
                    lz, hz = axis_minmax(ref[2:3, sl], ref[5:6, sl],
                                         coz, cdz)
                    tmn = jnp.maximum(jnp.maximum(lx, ly),
                                      jnp.maximum(lz, 0.0))
                    tmx = jnp.minimum(jnp.minimum(hx, hy), hz)
                    cond = tmn <= tmx
                    if occl:
                        # boxes entirely beyond the light can't occlude
                        cond &= tmn < ldist
                    if tbound is not None:
                        cond &= tmn <= tbound  # (tile_r, 1) broadcast
                    if alive_ is not None:
                        cond &= alive_  # (tile_r, 1) broadcast
                    anym = jnp.max(
                        jnp.where(cond, 1.0, 0.0), axis=0, keepdims=True
                    )  # (1, n_boxes)
                    if want_entry:
                        entry = jnp.min(
                            jnp.where(cond, tmn, inf), axis=0,
                            keepdims=True,
                        )
                        return anym, entry
                    return anym

                g3 = -(-m // 128)
                if m <= _EXACT_CULL_MAX_M:
                    # exact per-ray slab test: (tile_r, M) work, tightest
                    # possible mask
                    anyhit = exact_anyray(aabb_ref, m)
                elif m <= _EXACT_GROUP_MAX_M:
                    # Two-level EXACT cull (the big-M production regime,
                    # round 3): level 1 slab-tests the ceil(M/128)
                    # 128-cluster-group AABBs ((tile_r, G3) work); level 2
                    # slab-tests the clusters of each SURVIVING group via
                    # a STATIC 128-column slice of the padded table (the
                    # group loop is Python-unrolled, so no dynamic lane
                    # indexing). Level 2 runs INTERLEAVED with the visit
                    # loop (group word at bits_s[4*g3]; the per-group
                    # refresh there tightens each group's cull with the
                    # evolving per-ray state — see the visit phase).
                    m3 = g3 * 128
                    gany, gentry = exact_anyray(aabbg_ref, g3, at=m3,
                                                want_entry=True)  # (1, G3)
                    laneg = jax.lax.broadcasted_iota(jnp.int32, (1, g3), 1)
                    bits_s[4 * g3] = jnp.sum(jnp.where(
                        gany > 0.0, jnp.int32(1) << (laneg & 31), 0))
                    if group_order:
                        # NEAR-TO-FAR group ranks: visiting groups in
                        # ascending slab-entry order maximizes what the
                        # per-group cull refresh can prune (the best-t /
                        # decided flags established by near groups empty
                        # far groups' level-2 masks). Rank extraction is
                        # vector-only (no scalar syncs): g3 static rounds
                        # of min-entry selection with index tie-break,
                        # then ranks pack 8-bit into SMEM words (one
                        # vector->scalar sync per 4 groups). Output-
                        # invariant: the visit SET a refresh prunes is
                        # already proven winner-preserving; order changes
                        # only which prunes fire.
                        #
                        # OPT-IN (CUTRACE_GROUP_ORDER=1): measured a NET
                        # LOSS at the 256k flagship (round 4 A/B, same
                        # session: 1.365 s ordered vs 1.117 s static at
                        # 960x540 b5) — the per-cast rank work plus the
                        # pass-loop's g3^2 scalar guards cost more than
                        # the extra prunes win; the per-group refresh
                        # already converges under static order at these
                        # group counts. Kept as the documented negative
                        # result (same fate as round 3's per-ray ordered
                        # visits), bit-identical by construction
                        # (tests/test_fused.py multi-group parity).
                        identry = jnp.where(gany > 0.0, gentry, inf)
                        rank = jnp.full((1, g3), -1, jnp.int32)
                        remaining = gany > 0.0
                        for p in range(g3):
                            cur = jnp.min(jnp.where(remaining, identry,
                                                    inf),
                                          axis=1, keepdims=True)
                            sel = remaining & (identry == cur)
                            firsti = jnp.min(
                                jnp.where(sel, laneg, _BIG),
                                axis=1, keepdims=True)
                            sel = sel & (laneg == firsti)
                            rank = jnp.where(sel, p, rank)
                            remaining = remaining & ~sel
                        rank_u = jnp.where(rank < 0, 0, rank)
                        for w in range(-(-g3 // 4)):
                            in_w = (laneg >= 4 * w) & (laneg < 4 * (w + 1))
                            bits_s[4 * g3 + 1 + w] = jnp.sum(jnp.where(
                                in_w, rank_u << ((laneg & 3) * 8), 0))
                    anyhit = None  # level 2 deferred to the visit loop
                    interleave = exact_anyray
                else:
                    # conservative interval slab: O(M) per cast instead of
                    # O(tile_r * M) — the tile's rays collapse to per-axis
                    # origin/direction intervals ((1,1) vector reductions,
                    # no scalar sync), and interval arithmetic bounds the
                    # per-ray slab's tmin from below / tmax from above.
                    # A cluster is culled only if NO ray in the bounding
                    # box of the tile's rays can touch it (superset mask:
                    # always safe, tight for coherent tiles).
                    # dead rays drop out of the ray-bounding intervals
                    # (all-dead tile: bounds go +-inf, the NaN widening
                    # below keeps the mask conservative = everything)
                    def rmin(x):
                        if alive is not None:
                            x = jnp.where(alive, x, inf)
                        return jnp.min(x, axis=0, keepdims=True)  # (1, 1)

                    def rmax(x):
                        if alive is not None:
                            x = jnp.where(alive, x, -inf)
                        return jnp.max(x, axis=0, keepdims=True)

                    def imul_bounds(x_lo, x_hi, y_lo, y_hi):
                        """Lower/upper bound of {x*y : x in X, y in Y}."""
                        p1 = x_lo * y_lo
                        p2 = x_lo * y_hi
                        p3 = x_hi * y_lo
                        p4 = x_hi * y_hi
                        lo = jnp.minimum(jnp.minimum(p1, p2),
                                         jnp.minimum(p3, p4))
                        hi = jnp.maximum(jnp.maximum(p1, p2),
                                         jnp.maximum(p3, p4))
                        # inf * 0 -> NaN: widen to unbounded (conservative)
                        lo = jnp.where(jnp.isnan(lo), -inf, lo)
                        hi = jnp.where(jnp.isnan(hi), inf, hi)
                        return lo, hi

                    def axis_bounds(bmn, bmx, o1, d1):
                        """(lo of per-ray slab-lo, hi of per-ray slab-hi)
                        per cluster, over all rays in the tile."""
                        o_lo, o_hi = rmin(o1), rmax(o1)
                        d_lo, d_hi = rmin(d1), rmax(d1)
                        crosses = (d_lo <= 0.0) & (d_hi >= 0.0)
                        i1 = 1.0 / d_lo
                        i2 = 1.0 / d_hi
                        inv_lo = jnp.where(crosses, -inf,
                                           jnp.minimum(i1, i2))
                        inv_hi = jnp.where(crosses, inf,
                                           jnp.maximum(i1, i2))
                        t1_lo, t1_hi = imul_bounds(bmn - o_hi, bmn - o_lo,
                                                   inv_lo, inv_hi)
                        t2_lo, t2_hi = imul_bounds(bmx - o_hi, bmx - o_lo,
                                                   inv_lo, inv_hi)
                        # per-ray lo = min(t1, t2): lower bound is
                        # min(t1_lo, t2_lo); hi = max(t1, t2) likewise
                        return (jnp.minimum(t1_lo, t2_lo),
                                jnp.maximum(t1_hi, t2_hi))

                    lx, hx = axis_bounds(bmnx, bmxx, cox, cdx)
                    ly, hy = axis_bounds(bmny, bmxy, coy, cdy)
                    lz, hz = axis_bounds(bmnz, bmxz, coz, cdz)
                    tmn_lb = jnp.maximum(jnp.maximum(lx, ly),
                                         jnp.maximum(lz, 0.0))
                    tmx_ub = jnp.minimum(jnp.minimum(hx, hy), hz)
                    cond = tmn_lb <= tmx_ub  # (1, M)
                    if occl:
                        cond &= tmn_lb < rmax(ldist)
                    if t_bound is not None:
                        # sound upper bound over alive rays of best
                        # plane/sphere t (dead rays excluded by rmax)
                        cond &= tmn_lb <= rmax(t_bound)
                    if use_super:
                        # third hierarchy level: EXACT per-ray slab over
                        # the ceil(M/32) supercluster (word) AABBs — (32x
                        # less vector volume than per-cluster exactness)
                        # contains the interval refine's looseness to the
                        # words whose merged box some alive ray really
                        # touches. Sound: a cluster hit implies its word's
                        # merged box is hit, so word-exact AND cluster-
                        # interval is a superset of the exact mask.
                        g = aabb2_ref.shape[1]
                        wany = exact_anyray(aabb2_ref, g)  # (1, G)
                        exp = pltpu.repeat(wany, 32, axis=1)  # (1, 32G)
                        cond &= exp[:, :m] > 0.0
                    anyhit = jnp.where(cond, 1.0, 0.0)

                if anyhit is not None:
                    # pack the M-bit mask into int32 words: one integer
                    # shift+sum reduction per word = ONE vector->scalar
                    # sync each. lane & 31 keeps every shift in [0, 31];
                    # selection masks the rest. (The group-exact branch
                    # above packed its words already.)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
                    shifted = jnp.int32(1) << (lane & 31)
                    for w in range(n_words):
                        in_w = (lane >= 32 * w) & (lane < 32 * (w + 1))
                        bits_s[w] = jnp.sum(
                            jnp.where(in_w & (anyhit > 0.0), shifted, 0)
                        )

            def visit(mi):
                    """Dispatch: stream the cluster block (HBM regimes)
                    then run the math. The double-buffered path overlaps
                    the DMA with the PREVIOUS cluster's math (db_push);
                    all per-visit merges are min/max/tie-key folds, so
                    the one-visit lag changes no output, and the group
                    refresh reading a one-visit-stale bound stays sound
                    (a looser bound only keeps more clusters)."""
                    if hbm_tables and double_buf:
                        db_push(mi)
                        return
                    if hbm_tables:
                        # synchronous fallback (CUTRACE_HBM_DB=0):
                        # ~1-2 us DMA latency serialized with ~1-2 us of
                        # visit math. CUTRACE_ABLATE=nodma skips the copy
                        # (stale scratch -> WRONG output, exact timing):
                        # the cost-attribution knob for the DMA share.
                        if "nodma" not in ablate:
                            cp = pltpu.make_async_copy(
                                tab_hbm.at[mi],
                                tvm_s.at[pl.ds(0, hbm_rows_k)],
                                dma_sem.at[0],
                            )
                            cp.start()
                            cp.wait()
                    visit_math(mi, 0)

            def visit_math(mi, slot):
                    """The per-cluster slot test + winner fold. `slot`
                    selects the streamed block's half of the 2-slot tvm_s
                    scratch (a PYTHON 0 on the synchronous path — static
                    slicing — or the traced drain parity when
                    double-buffered); unused in the VMEM-table regime."""
                    if hbm_tables:
                        # ONE dynamic-offset load of the whole slot, then
                        # static row slices of the loaded value (23
                        # dynamic-sublane reads per visit measured as
                        # real overhead in the double-buffered path)
                        blk = tvm_s[pl.ds(slot * hbm_rows_k,
                                          hbm_rows_k), :]

                        def col(name):
                            row = blk[_TROW[name]:_TROW[name] + 1, :]
                            # the stacked table is f32; the tie-break key
                            # compares against the i32 bk_s scratch. Order
                            # values are exact in f32 (< 2^24, sentinel
                            # 2^30 is a power of two).
                            if name == "order":
                                return row.astype(jnp.int32)
                            return row
                    else:
                        col = lambda name: tabs[name][pl.ds(mi, 1), :]
                    if mxu_visits == 2:
                        # combined MXU visit: ONE (tile_r, 16) @ (16, 4C)
                        # matmul; lane blocks [alpha|beta_n|gamma_n|t_n]
                        if hbm_tables:
                            cpw = pltpu.make_async_copy(
                                tab_hbm_w.at[mi], wvm_s, dma_sem.at[0]
                            )
                            cpw.start()
                            cpw.wait()
                            wblk = wvm_s[:]
                        else:
                            wblk = wgt_ref[pl.ds(mi * 16, 16), :]
                        p4 = _dot8(r16, wblk)  # (tile_r, 4C)
                        cw = p4.shape[1] // 4
                        alpha = p4[:, 0:cw]
                        beta_n = p4[:, cw:2 * cw]
                        gamma_n = p4[:, 2 * cw:3 * cw]
                        t_n = p4[:, 3 * cw:]
                    elif mxu_visits:
                        # MXU-form visit math: 4 matmuls against the
                        # packed weight blocks (_mxu_weight_blocks) on
                        # the otherwise-idle systolic array
                        if hbm_tables:
                            wsrc = lambda r0: blk[_HBM_TAB_ROWS + r0:
                                                  _HBM_TAB_ROWS + r0 + 8]
                        else:
                            wsrc = lambda r0: wgt_ref[
                                pl.ds(mi * 32 + r0, 8), :]
                        alpha = _dot8(rdw, wsrc(0))    # (tile_r, C)
                        beta_n = _dot8(rdw, wsrc(8))
                        gamma_n = _dot8(rdw, wsrc(16))
                        t_n = _dot8(ro1, wsrc(24))
                    else:
                        n0, n1, n2 = col("n0"), col("n1"), col("n2")
                        alpha = cdx * n0 + cdy * n1 + cdz * n2
                        beta_n = (
                            cdx * col("ub0") + cdy * col("ub1")
                            + cdz * col("ub2")
                            - (wx * col("b0") + wy * col("b1")
                               + wz * col("b2"))
                        )
                        gamma_n = (
                            wx * col("a0") + wy * col("a1")
                            + wz * col("a2")
                            - (cdx * col("ug0") + cdy * col("ug1")
                               + cdz * col("ug2"))
                        )
                        t_n = col("k") - (cox * n0 + coy * n1 + coz * n2)

                    degenerate = alpha == 0.0
                    inv = 1.0 / jnp.where(degenerate, 1.0, alpha)
                    beta = beta_n * inv
                    gamma = gamma_n * inv
                    t = t_n * inv
                    ok = (
                        (~degenerate)
                        & (beta >= 0.0)
                        & (gamma >= 0.0)
                        & (beta + gamma <= 1.0)
                        & jnp.isfinite(t)
                        & (t > mind)
                        & (col("valid") > 0.0)
                    )
                    if occl:
                        occ = jnp.max(
                            jnp.where(ok & (t < ldist), 1.0, 0.0),
                            axis=1, keepdims=True,
                        )
                        bt_s[:] = jnp.maximum(bt_s[:], occ)
                        return
                    t = jnp.where(ok, t, inf)

                    tmin = jnp.min(t, axis=1, keepdims=True)  # (tile_r, 1)
                    key = jnp.where(t == tmin, col("order"), _BIG)
                    kmin = jnp.min(key, axis=1, keepdims=True)
                    kmin = jnp.where(jnp.isfinite(tmin), kmin, _BIG)

                    best_t = bt_s[:]
                    best_k = bk_s[:]
                    better = (tmin < best_t) | (
                        (tmin == best_t) & (kmin < best_k)
                    )
                    if "noattr" not in ablate:
                        oneh = ((t == tmin) & (key == kmin)).astype(
                            jnp.float32)
                        for name, j in attr_cols:
                            val = jnp.sum(oneh * col(name), axis=1,
                                          keepdims=True)
                            at_s[:, j:j + 1] = jnp.where(
                                better, val, at_s[:, j:j + 1]
                            )
                    bt_s[:] = jnp.where(better, tmin, best_t)
                    bk_s[:] = jnp.where(better, kmin, best_k)

            if hbm_tables and double_buf:
                # Double-buffered visit streaming: each set cull bit
                # STARTS the DMA of its cluster block into the free slot
                # of the 2-slot tvm_s scratch, then runs the math of the
                # PREVIOUS cluster from the other slot (whose DMA has had
                # a full visit of math to land). dbuf_s: [0] pending
                # cluster id (-1 none), [1] slot of the NEXT start.
                # Invariant: the pending block sits in slot 1 - parity;
                # every started copy is waited exactly once (at the next
                # push, or at the post-loop drain), so slot reuse is
                # safe. Branch-free: slot selection is address arithmetic
                # (dynamic sublane offset + a 2-element DMA semaphore
                # array), so visit_math is traced ONCE per drain site —
                # a pl.when-per-parity version doubled the program and
                # measured SLOWER than the synchronous copy.
                def db_reset():
                    dbuf_s[0] = -1
                    dbuf_s[1] = 0

                def db_drain(par=None):
                    par = dbuf_s[1] if par is None else par
                    pend = dbuf_s[0]
                    slot = 1 - par

                    @pl.when(pend >= 0)
                    def _():
                        pltpu.make_async_copy(
                            tab_hbm.at[pend],
                            tvm_s.at[pl.ds(slot * hbm_rows_k,
                                           hbm_rows_k)],
                            dma_sem.at[slot],
                        ).wait()
                        visit_math(pend, slot)

                def db_push(mi):
                    par = dbuf_s[1]
                    pltpu.make_async_copy(
                        tab_hbm.at[mi],
                        tvm_s.at[pl.ds(par * hbm_rows_k, hbm_rows_k)],
                        dma_sem.at[par],
                    ).start()
                    db_drain(par)
                    dbuf_s[0] = mi
                    dbuf_s[1] = 1 - par

                db_reset()

            skip_visit = (
                ("novisit2" in ablate and not primary)
                or ("novisito" in ablate and occl)
                or ("novisitn" in ablate and not primary and not occl)
            )
            if skip_visit:
                pass
            elif interleave is not None:
                # Group-interleaved visits with per-group cull REFRESH:
                # level 2 of the two-level exact cull runs right before
                # its group's visits, with the cast-level bound tightened
                # by the EVOLVING per-ray state — occlusion casts drop
                # rays already decided by an earlier group's visit
                # (bt_s flag == 1), nearest casts bound the slab entry by
                # the best triangle t found so far (equality keeps the
                # cluster, so the (t, key) tie-break winner set is
                # unchanged — the same soundness argument as the static
                # t-bound cull). Zero extra cull volume or scalar syncs
                # versus the non-interleaved form: the identical per-group
                # slab tests and word packs, merely ordered after the
                # previous groups' visits. CUTRACE_ABLATE=norefresh keeps
                # the interleaving but passes the static bounds (exact
                # old-mask behavior, for A/B timing).
                lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                shift128 = jnp.int32(1) << (lane128 & 31)

                def group_body(j):
                    """Level-2 exact cull + visits for STATIC group j
                    (static 128-column slice — Mosaic cannot dynamically
                    index the lane dimension), bounds refreshed from the
                    evolving per-ray state."""
                    if "norefresh" in ablate:
                        anyh = interleave(aabbg_ref, 128, at=128 * j)
                    elif occl:
                        alive2 = bt_s[:] == 0.0
                        if alive is not None:
                            alive2 &= alive
                        anyh = interleave(aabbg_ref, 128, at=128 * j,
                                          alive_=alive2)
                    else:
                        tb2 = bt_s[:]
                        if t_bound is not None:
                            tb2 = jnp.minimum(tb2, t_bound)
                        anyh = interleave(aabbg_ref, 128, at=128 * j,
                                          tbound=tb2)
                    for w2 in range(4):
                        in_w = ((lane128 >= 32 * w2)
                                & (lane128 < 32 * (w2 + 1)))
                        bits_s[4 * j + w2] = jnp.sum(jnp.where(
                            in_w & (anyh > 0.0), shift128, 0))

                    def w2body(w2, _):
                        word2 = bits_s[4 * j + w2]

                        @pl.when(word2 != 0)
                        def _():
                            def bbody(b, _):
                                @pl.when(((word2 >> b) & 1) != 0)
                                def _():
                                    # padded table columns beyond m
                                    # never slab-hit, so
                                    # 128*j + 32*w2 + b < m here
                                    visit(128 * j + 32 * w2 + b)
                                return 0
                            jax.lax.fori_loop(0, 32, bbody, 0)
                        return 0

                    jax.lax.fori_loop(0, 4, w2body, 0)

                if not group_order:
                    # static index order (the measured default)
                    for j in range(g3):
                        @pl.when(((bits_s[4 * g3] >> j) & 1) != 0)
                        def _(j=j):
                            group_body(j)
                else:
                    # Near-to-far: pass p runs the group ranked p by slab
                    # entry. One fori over passes keeps program size at
                    # g3 bodies (each group's body traces once; the rank
                    # guards are scalar SMEM reads).
                    def pass_body(p, _):
                        for j in range(g3):
                            rk = (bits_s[4 * g3 + 1 + j // 4]
                                  >> ((j % 4) * 8)) & 255

                            @pl.when(
                                (((bits_s[4 * g3] >> j) & 1) != 0)
                                & (rk == p)
                            )
                            def _(j=j):
                                group_body(j)
                        return 0

                    jax.lax.fori_loop(0, g3, pass_body, 0)
            elif primary or secondary_cull:
                # Word-skip loop: whole 32-cluster words with an empty
                # mask are skipped in ONE scalar branch (cull masks are
                # spatially sparse — a flat per-cluster loop pays branch
                # overhead M times, dominating skipped-iteration cost at
                # large M).
                # Primary masks are bit-packed 1-D (n_tiles * ceil(M/32),)
                # int32 prefetch words: 2-D prefetch operands are padded
                # to (8, 128) tiles even in SMEM, so a (n_tiles, M) mask
                # blows the 1 MiB SMEM at 1080p; the flat packed form is
                # 65 KiB. Secondary masks are the in-kernel bits_s words.
                def wbody(w, _):
                    word = (hits_ref[i * n_words + w] if primary
                            else bits_s[w])

                    @pl.when(word != 0)
                    def _():
                        def bbody(b, _):
                            @pl.when(((word >> b) & 1) != 0)
                            def _():
                                # mask bits beyond m are never set, so
                                # w*32+b < m whenever we get here
                                visit(w * 32 + b)
                            return 0
                        jax.lax.fori_loop(0, min(32, m), bbody, 0)
                    return 0

                jax.lax.fori_loop(0, n_words, wbody, 0)
            else:
                jax.lax.fori_loop(0, m, lambda mi, _: (visit(mi), 0)[1], 0)

            if hbm_tables and double_buf:
                # flush: the last pushed cluster's math is still pending
                db_drain()

            def merge_kind(tab_ref, n, t, ok):
                """Cross-kind merge by (t, scene obj); one-hot attr rows."""
                t = jnp.where(ok, t, inf)
                tmin = jnp.min(t, axis=1, keepdims=True)
                row_obj = tab_ref[_A_OBJ:_A_OBJ + 1, :]
                key = jnp.where(t == tmin, row_obj, _BIGF)
                kmin = jnp.min(key, axis=1, keepdims=True)
                kmin = jnp.where(jnp.isfinite(tmin), kmin, _BIGF)
                best_t = bt_s[:]
                best_obj = at_s[:, _A_OBJ:_A_OBJ + 1]
                better = (tmin < best_t) | (
                    (tmin == best_t) & (kmin < best_obj)
                )
                oneh = ((t == tmin) & (key == kmin)).astype(jnp.float32)
                # material params are deferred (the mat INDEX rides in the
                # _A_CR slot until the post-merge lookup); only geometry /
                # identity rows merge here
                if full:
                    pairs = [(j, j) for j in
                             (_A_OBJ, _A_NX, _A_NY, _A_NZ,
                              _A_SPH, _A_CX, _A_CY, _A_CZ)]
                    pairs.append((_ROW_MAT, _A_CR))
                else:
                    pairs = [(_A_OBJ, _A_OBJ), (_ROW_MAT, _A_CR)]
                if emit_topo and (full or topo_static):
                    # march casts need the occluder CODE too in the
                    # transparent (topo_static) mode
                    pairs.append((_ROW_CODE, _A_CODE))
                for src_j, j in pairs:
                    val = jnp.sum(oneh * tab_ref[src_j:src_j + 1, :],
                                  axis=1, keepdims=True)
                    at_s[:, j:j + 1] = jnp.where(
                        better, val, at_s[:, j:j + 1]
                    )
                bt_s[:] = jnp.where(better, tmin, best_t)

            if has_planes:
                if occl:
                    occ = jnp.max(
                        jnp.where(okp & (tp < ldist), 1.0, 0.0),
                        axis=1, keepdims=True,
                    )
                    bt_s[:] = jnp.maximum(bt_s[:], occ)
                else:
                    merge_kind(plane_ref, n_pl, tp, okp)

            if has_spheres:
                if occl:
                    # the march compares the winner t directly against
                    # light_dist (shadow dirs are unit length, so the
                    # sphere's normalized-dir parametrization coincides)
                    occ = jnp.max(
                        jnp.where(oks & (ts < ldist), 1.0, 0.0),
                        axis=1, keepdims=True,
                    )
                    bt_s[:] = jnp.maximum(bt_s[:], occ)
                else:
                    merge_kind(sphere_ref, n_sp, ts, oks)

            if not occl:
                # Deferred material-parameter fetch: the merges above left
                # the winner's material INDEX in the _A_CR slot; ONE
                # one-hot over the (8, n_mats) table materializes the
                # parameter columns (exact: a single nonzero term). Rays
                # with no hit pick material 0 — every consumer masks by
                # `hit`, exactly as the old garbage-free zeros were masked.
                n_mats = mat_ref.shape[1]
                matv = at_s[:, _A_CR:_A_CR + 1]
                onehm = (matv == jax.lax.broadcasted_iota(
                    jnp.int32, (1, n_mats), 1).astype(jnp.float32)
                ).astype(jnp.float32)  # (tile_r, n_mats)
                fetch = (
                    ((0, _A_CR), (1, _A_CG), (2, _A_CB), (3, _A_SPEC),
                     (4, _A_REFL), (5, _A_PHONG), (6, _A_TRANSP))
                    if full else ((6, _A_TRANSP),)
                )
                for row, j in fetch:
                    at_s[:, j:j + 1] = jnp.sum(
                        onehm * mat_ref[row:row + 1, :], axis=1,
                        keepdims=True,
                    )

            return ndx, ndy, ndz

        def shade(o3, d3, nd3, level_first, topo_col=None,
                  topo_shadow_col=None):
            """Phong + shadows for the current winner in bt_s/at_s
            (shading.hpp:64-99). Returns (rgb3, spawn info...). `topo_col`
            (static): out column accumulating packed occlusion-flag bits
            (opaque emit_topo only). `topo_shadow_col` (static,
            topo_static only): first out column of this node's per-step
            march occluder codes — forces the Python-unrolled loops."""
            cox, coy, coz = o3
            cdx, cdy, cdz = d3
            ndx, ndy, ndz = nd3
            bt = bt_s[:]
            hit = jnp.isfinite(bt)
            t_safe = jnp.where(hit, bt, 1.0)
            at = at_s[:]
            is_sph = at[:, _A_SPH:_A_SPH + 1] > 0.5
            # sphere point uses the normalized direction (sphere t is
            # parametric w.r.t. it); others the raw one
            px = cox + t_safe * jnp.where(is_sph, ndx, cdx)
            py = coy + t_safe * jnp.where(is_sph, ndy, cdy)
            pz = coz + t_safe * jnp.where(is_sph, ndz, cdz)
            # shading normal: triangles/planes from the tables (triangles
            # pre-normalized, planes raw as authored); spheres from the
            # hit point
            sx = px - at[:, _A_CX:_A_CX + 1]
            sy = py - at[:, _A_CY:_A_CY + 1]
            sz = pz - at[:, _A_CZ:_A_CZ + 1]
            sl = norm3(sx, sy, sz)
            sl = jnp.where(sl == 0.0, 1.0, sl)
            rnx = jnp.where(is_sph, sx / sl, at[:, _A_NX:_A_NX + 1])
            rny = jnp.where(is_sph, sy / sl, at[:, _A_NY:_A_NY + 1])
            rnz = jnp.where(is_sph, sz / sl, at[:, _A_NZ:_A_NZ + 1])

            if level_first:
                out_ref[:, 3:4] = bt  # depth (+inf on miss)
                zero = jnp.zeros((tile_r, 1), jnp.float32)
                out_ref[:, 4:5] = jnp.where(hit, rnx, zero)
                out_ref[:, 5:6] = jnp.where(hit, rny, zero)
                out_ref[:, 6:7] = jnp.where(hit, rnz, zero)

            # NaN-safe unit normal for shading (misses masked later):
            # substitute +z on miss, like render/shading.py phong()
            gx = jnp.where(hit, rnx, 0.0)
            gy = jnp.where(hit, rny, 0.0)
            gz = jnp.where(hit, rnz, 1.0)
            gl = norm3(gx, gy, gz)
            gl = jnp.where(gl == 0.0, 1.0, gl)
            nnx, nny, nnz = gx / gl, gy / gl, gz / gl

            difr = at[:, _A_CR:_A_CR + 1]
            difg = at[:, _A_CG:_A_CG + 1]
            difb = at[:, _A_CB:_A_CB + 1]
            spec = at[:, _A_SPEC:_A_SPEC + 1]
            phong_e = at[:, _A_PHONG:_A_PHONG + 1]
            mdx, mdy, mdz = -ndx, -ndy, -ndz

            accr = ambient * difr
            accg = ambient * difg
            accb = ambient * difb

            # Lights and shadow-march steps run as fori_loops (dynamic SMEM
            # light index), NOT static unrolls: each bounce level then
            # contains exactly TWO cast bodies (primary + shadow) and
            # Mosaic compile time stays linear in bounce depth instead of
            # bounces x lights x steps (measured: the unrolled b5 kernel
            # took >8 min to compile).
            def light_body(li, acc):
                if opaque:
                    if topo_col is None:
                        accr, accg, accb = acc
                    else:
                        # pw = 2^li, doubled per iteration (exact in f32):
                        # keeps the packed-flag bit weight a scalar carry
                        accr, accg, accb, pw = acc
                else:
                    # accumulators live in scratch when the body contains
                    # the march loop: Mosaic cannot legalize an scf.for
                    # with vector carries around a nested loop
                    accr = mst_s[:, 3:4]
                    accg = mst_s[:, 4:5]
                    accb = mst_s[:, 5:6]
                kind = lights_ref[li, 0]
                vx = lights_ref[li, 1]
                vy = lights_ref[li, 2]
                vz = lights_ref[li, 3]
                lcr = lights_ref[li, 4]
                lcg = lights_ref[li, 5]
                lcb = lights_ref[li, 6]
                is_sun = kind == 0.0
                dfx = vx - px
                dfy = vy - py
                dfz = vz - pz
                dist = norm3(dfx, dfy, dfz)
                dsafe = jnp.where(dist == 0.0, 1.0, dist)
                dirx = jnp.where(is_sun, -vx, dfx / dsafe)
                diry = jnp.where(is_sun, -vy, dfy / dsafe)
                dirz = jnp.where(is_sun, -vz, dfz / dsafe)
                distance = jnp.where(is_sun, inf, dist)
                dl = norm3(dirx, diry, dirz)
                light_dist = distance * dl  # shading.hpp:80
                dl = jnp.where(dl == 0.0, 1.0, dl)
                sdx, sdy, sdz = dirx / dl, diry / dl, dirz / dl

                # shadow march (shading.hpp:22-45)
                if opaque:
                    if "noocc" in ablate:
                        sh = jnp.zeros((tile_r, 1), jnp.float32)
                    else:
                        # every occluder contributes full opacity, so ONE
                        # any-hit occlusion query decides the march
                        cast(px, py, pz, sdx, sdy, sdz,
                             jnp.zeros((tile_r, 1), jnp.float32) + 1e-3,
                             full=False, primary=False, ldist=light_dist,
                             alive=hit)
                        occ = hit & (bt_s[:] > 0.0)
                        sh = jnp.where(occ, 1.0, 0.0)
                    if topo_col is not None:
                        out_ref[:, topo_col:topo_col + 1] += sh * pw
                else:
                    # march state lives in VMEM scratch, NOT loop
                    # carries: Mosaic cannot legalize an scf.for with
                    # vector carries nested inside another loop (the
                    # light fori) — scalar-only carries lower fine.
                    mst_s[:, 0:1] = jnp.zeros((tile_r, 1), jnp.float32)
                    mst_s[:, 1:2] = jnp.zeros((tile_r, 1), jnp.float32)
                    mst_s[:, 2:3] = jnp.where(hit, 1.0, 0.0)

                    def step_body(si, _):
                        sh = mst_s[:, 0:1]
                        last = mst_s[:, 1:2]
                        act = mst_s[:, 2:3] > 0.5
                        cast(px, py, pz, sdx, sdy, sdz, last + 1e-3,
                             full=False, primary=False, alive=act)
                        if topo_shadow_col is not None:
                            # static li AND si (Python-unrolled loops):
                            # this step's occluder code in its own column
                            c = topo_shadow_col + li * shadow_steps + si
                            out_ref[:, c:c + 1] = (
                                at_s[:, _A_CODE:_A_CODE + 1])
                        st = bt_s[:]
                        stransp = at_s[:, _A_TRANSP:_A_TRANSP + 1]
                        okm = act & jnp.isfinite(st) & (st < light_dist)
                        sh = sh + jnp.where(okm, 1.0 - stransp, 0.0)
                        mst_s[:, 0:1] = sh
                        mst_s[:, 1:2] = jnp.where(okm, st, last)
                        mst_s[:, 2:3] = jnp.where(
                            okm & (sh < 1.0), 1.0, 0.0
                        )
                        return 0

                    if topo_shadow_col is not None:
                        for si in range(shadow_steps):
                            step_body(si, 0)
                    else:
                        jax.lax.fori_loop(0, shadow_steps, step_body, 0)
                    sh = mst_s[:, 0:1]
                    sh = jnp.where(sh >= 1.0, 1.0, sh)
                lit = sh < 1.0

                # max(0, x) with CUDA fmaxf semantics: NaN -> 0 (a
                # zero-direction sun yields NaN dot products and the
                # reference shades those pixels ambient-only)
                fdd = nnx * sdx + nny * sdy + nnz * sdz
                fd = jnp.where(fdd > 0.0, fdd, 0.0)
                hvx, hvy, hvz = mdx + sdx, mdy + sdy, mdz + sdz
                hl = norm3(hvx, hvy, hvz)
                hl = jnp.where(hl == 0.0, 1.0, hl)
                bdd = (nnx * hvx + nny * hvy + nnz * hvz) / hl
                base = jnp.where(bdd > 0.0, bdd, 0.0)
                backf = base <= 0.0
                fs = jnp.where(
                    backf, 0.0,
                    jnp.exp(phong_e * jnp.log(jnp.where(backf, 1.0, base))),
                )
                wgt = jnp.where(lit, 1.0 - sh, 0.0)
                accr = accr + wgt * (fd * difr + fs * spec * difr) * lcr
                accg = accg + wgt * (fd * difg + fs * spec * difg) * lcg
                accb = accb + wgt * (fd * difb + fs * spec * difb) * lcb
                if opaque:
                    if topo_col is None:
                        return accr, accg, accb
                    return accr, accg, accb, pw * 2.0
                mst_s[:, 3:4] = accr
                mst_s[:, 4:5] = accg
                mst_s[:, 5:6] = accb
                return 0

            if opaque:
                if topo_col is None:
                    accr, accg, accb = jax.lax.fori_loop(
                        0, n_lights, light_body, (accr, accg, accb)
                    )
                else:
                    accr, accg, accb, _ = jax.lax.fori_loop(
                        0, n_lights, light_body,
                        (accr, accg, accb, jnp.float32(1.0)),
                    )
            else:
                mst_s[:, 3:4] = accr
                mst_s[:, 4:5] = accg
                mst_s[:, 5:6] = accb
                if topo_shadow_col is not None:
                    # topo_static: static light indices (Python unroll)
                    for li in range(n_lights):
                        light_body(li, 0)
                else:
                    jax.lax.fori_loop(0, n_lights, light_body, 0)
                accr = mst_s[:, 3:4]
                accg = mst_s[:, 4:5]
                accb = mst_s[:, 5:6]

            ph = (
                jnp.where(hit, accr, 0.0),
                jnp.where(hit, accg, 0.0),
                jnp.where(hit, accb, 0.0),
            )
            return ph, hit, t_safe, (nnx, nny, nnz), at

        # ---- bounce tree: DEPTH-FIRST unroll with tile-dead skipping ----
        # (see the lanes kernel's tree for the full rationale; identical
        # structure on (tile_r, 1) columns, tree_s is (tile_r, 8(b+1)))
        ones = jnp.ones((tile_r, 1), jnp.float32)
        tree_s[:, 0:3] = jnp.zeros((tile_r, 3), jnp.float32)

        def do_node(level, o3, d3, w, mind, root):
            if emit_topo:
                k_node = node_counter[0]
                node_counter[0] += 1

            def body():
                nd3 = cast(*o3, *d3, mind, full=True,
                           primary=(root and prefetch_primary),
                           alive=None if root else (w > 0.0))
                tc = tsc = None
                if emit_topo and topo_static:
                    # transparent layout: one out column per replay topo
                    # row, DF order identical to topo_layout (lanes parity)
                    _, cast_row, shadow_base = _topo_nodes[k_node]
                    out_ref[:, 8 + cast_row:9 + cast_row] = (
                        at_s[:, _A_CODE:_A_CODE + 1])
                    tsc = 8 + shadow_base
                elif emit_topo:
                    # opaque layout: winner code + zeroed packed-flag
                    # column for this node (static lane indices)
                    c0 = 8 + 2 * k_node
                    out_ref[:, c0:c0 + 1] = at_s[:, _A_CODE:_A_CODE + 1]
                    out_ref[:, c0 + 1:c0 + 2] = jnp.zeros(
                        (tile_r, 1), jnp.float32
                    )
                    tc = c0 + 1
                ph, hit, t_safe, nn3, at = shade(o3, d3, nd3,
                                                 level_first=root,
                                                 topo_col=tc,
                                                 topo_shadow_col=tsc)
                if level == bounces or not (any_refl or any_transp):
                    tree_s[:, 0:1] += w * ph[0]
                    tree_s[:, 1:2] += w * ph[1]
                    tree_s[:, 2:3] += w * ph[2]
                    return
                if any_transp:
                    tr = at[:, _A_TRANSP:_A_TRANSP + 1]
                    f = jnp.where(hit & (tr >= _EPS), tr, 0.0)
                else:
                    f = jnp.zeros((tile_r, 1), jnp.float32)
                weff = w * (1.0 - f)
                tree_s[:, 0:1] += weff * ph[0]
                tree_s[:, 1:2] += weff * ph[1]
                tree_s[:, 2:3] += weff * ph[2]
                # child origin = o + t_safe * RAW d for every kind
                # (shading.hpp:131,144 / render.shading.ray_color) — note
                # this differs from the sphere's shading point, which uses
                # the normalized dir; t_safe was captured by shade() before
                # the shadow casts clobbered bt_s
                chx = o3[0] + t_safe * d3[0]
                chy = o3[1] + t_safe * d3[1]
                chz = o3[2] + t_safe * d3[2]
                fmin = jnp.full((tile_r, 1), 0.0, jnp.float32) + fudge
                if any_refl and any_transp:
                    c0 = 8 * (level + 1)
                    tree_s[:, c0 + 0:c0 + 1] = chx
                    tree_s[:, c0 + 1:c0 + 2] = chy
                    tree_s[:, c0 + 2:c0 + 3] = chz
                    tree_s[:, c0 + 3:c0 + 4] = d3[0]
                    tree_s[:, c0 + 4:c0 + 5] = d3[1]
                    tree_s[:, c0 + 5:c0 + 6] = d3[2]
                    tree_s[:, c0 + 6:c0 + 7] = w * f
                if any_refl:
                    rf = at[:, _A_REFL:_A_REFL + 1]
                    r = jnp.where(hit & (rf >= _EPS), rf, 0.0)
                    nnx, nny, nnz = nn3
                    ndx, ndy, ndz = nd3
                    dot = ndx * nnx + ndy * nny + ndz * nnz
                    rd = (ndx - 2.0 * dot * nnx, ndy - 2.0 * dot * nny,
                          ndz - 2.0 * dot * nnz)
                    do_node(level + 1, (chx, chy, chz), rd, weff * r,
                            fmin, False)
                if any_refl and any_transp:
                    c0 = 8 * (level + 1)
                    to3 = (tree_s[:, c0 + 0:c0 + 1],
                           tree_s[:, c0 + 1:c0 + 2],
                           tree_s[:, c0 + 2:c0 + 3])
                    td3 = (tree_s[:, c0 + 3:c0 + 4],
                           tree_s[:, c0 + 4:c0 + 5],
                           tree_s[:, c0 + 5:c0 + 6])
                    do_node(level + 1, to3, td3,
                            tree_s[:, c0 + 6:c0 + 7], fmin, False)
                elif any_transp:
                    do_node(level + 1, (chx, chy, chz), d3, w * f,
                            fmin, False)

            if root or not node_skip:
                body()
            else:
                @pl.when(jnp.max(w) > 0.0)
                def _():
                    body()

        do_node(0, (ox, oy, oz), (dx, dy, dz), ones, mind0, True)
        out_ref[:, 0:1] = tree_s[:, 0:1]
        out_ref[:, 1:2] = tree_s[:, 1:2]
        out_ref[:, 2:3] = tree_s[:, 2:3]
        out_ref[:, 7:8] = jnp.zeros((tile_r, 1), jnp.float32)

    return kernel


# --------------------------------------------------------------------------
# transposed kernel: rays on LANES (the fast path for small cluster counts)
# --------------------------------------------------------------------------
#
# The sublane-layout kernel above keeps per-ray data as (tile_r, 1) columns.
# On TPU a (512, 1) f32 occupies 64 (8, 128) vregs with ONE valid lane each,
# so every per-ray op (phong, shadow setup, slab tests, spawn math) costs as
# much as a full (512, 128) tile op at <1 % utilization. This variant puts
# rays on lanes instead: per-ray data is (1, tile_r) (4 vregs for 512 rays),
# per-(triangle, ray) tiles are (C, tile_r) with the cluster's triangles on
# SUBLANES, and reductions run across sublanes. The dense triangle math is
# the same vector volume as before — everything else collapses to ~1/16th.
#
# The price: per-cluster constants must be (C, 1) column slices of the
# transposed (C, M) tables, and Mosaic cannot dynamically index the lane
# dimension — so the cluster loop is STATICALLY UNROLLED over M. That bounds
# this kernel to M <= _LANES_MAX_M clusters (<= 4k triangles at C=128);
# bigger partitions fall back to the sublane kernel above. prepare()
# picks the smallest C keeping M in range (finer clusters cull more).

_LANES_MAX_M = 32  # bits of one int32 cull word (bit 31 lands via the
# exact two-half packing: hi16 << 16 wraps into the sign bit, and the
# arithmetic-shift read masks with & 1, so the full word is usable)

# Secondary-cull flavor threshold for the sublane kernel: at or below this
# cluster count the exact per-ray slab test is cheap and tightest; above it
# the O(M) conservative interval cull wins (tests lower this to exercise
# the interval path on small scenes).
_EXACT_CULL_MAX_M = int(__import__("os").environ.get(
    "CUTRACE_EXACT_CULL_MAX_M", 512))
# Between _EXACT_CULL_MAX_M and this, the sublane kernel's secondary culls
# run the TWO-LEVEL exact scheme (128-cluster-group slab, then exact
# per-cluster slabs inside surviving groups via static slices) — identical
# mask to the flat exact cull at a fraction of the vector volume. Beyond
# it (G3 > 32 static group bodies) the interval+supercluster cull runs.
_EXACT_GROUP_MAX_M = 4096


def _make_kernel_lanes(m, n_pl, n_sp, n_lights, bounces, shadow_steps,
                       any_refl, any_transp, tile_r,
                       has_planes, has_spheres, node_skip=True,
                       emit_topo=False, prefetch_primary=True,
                       defer_attrs=True, refresh_at=()):
    """Rays-on-lanes kernel body (see block comment above). Operand
    layouts: rays/out (8, tile_r); triangle tables (C, M); aabb (M, 8);
    plane/sphere tables (P|S, 24).

    `defer_attrs`: nearest-hit casts track only (t, order-key, cluster)
    during the cluster loop and fetch the 11 winner attribute columns in a
    post-loop pass over just the clusters CONTAINING winners (typically
    1-3 vs the 5-12 visited) — the per-visit one-hot attr accumulation was
    ~40 % of visit cost. Output-invariant: `order` is the globally unique
    original triangle index, so `col("order") == best_key` selects exactly
    the winning slot; the winner-cluster guard masks no-hit rays (whose
    _BIGF key would otherwise match padding slots). Costs one extra
    vector->scalar sync per nearest cast (the winner-cluster word pack).

    `refresh_at`: static unroll positions at which nearest-hit casts
    re-cull the REMAINING clusters against the evolving triangle best-t
    (min'd with the static plane/sphere bound): a cluster whose slab entry
    exceeds every alive ray's current best t cannot win the (t, key) merge
    (strictly greater t — ties keep the cluster via <=), so pruning it is
    output-invariant. This is the dynamic half of the front-to-back
    ordered-visit win (ray_cast.hpp:29-55 nearest-hit contract preserved;
    only the visit SET shrinks): one slab recompute + word re-pack (~1 us
    sync) per refresh point buys skipping visits the static spatial order
    would still have paid."""
    n_words = -(-m // 32)  # packed cull-mask words per tile
    opaque = not any_transp
    # Ablation knobs for kernel-cost attribution (WRONG OUTPUT, exact
    # timing): CUTRACE_ABLATE=novisit2 skips secondary nearest-cast
    # cluster loops, noocc skips occlusion casts, noshade skips the light
    # loop. Timing-differencing these isolates where a frame goes
    # (docs/performance.md). Never set in production; each bench run is a
    # fresh process so the env is read coherently at trace time.
    import os

    ablate = set(filter(None, os.environ.get(
        "CUTRACE_ABLATE", "").split(",")))
    # topology emission (ops/replay.py): full casts also track the winner
    # CODE column; shadow-march casts track it too in transparent scenes
    # (opaque shadows store only the occlusion flag).
    # Material params are deferred like the sublane kernel's: the attr
    # pass / march accumulate only the winner's material INDEX (riding in
    # the _A_CR slot), one one-hot over the (n_mats, 8) table per cast
    # materializes the parameter columns.
    attrs_full = (
        ("obj", _A_OBJ),
        ("snx", _A_NX), ("sny", _A_NY), ("snz", _A_NZ),
        ("mat", _A_CR),
    ) + ((("order", _A_CODE),) if emit_topo else ())
    attrs_shadow = (("obj", _A_OBJ), ("mat", _A_CR)) + (
        (("order", _A_CODE),) if (emit_topo and not opaque) else ())
    per_light = 1 if opaque else shadow_steps
    if emit_topo:
        from cutrace_tpu.ops.replay import topo_layout

        _, topo_nodes = topo_layout(bounces, any_refl, any_transp,
                                    n_lights, shadow_steps)

    def kernel(hits_ref, rays_ref, *rest):
        n_tab = len(_TABLE_NAMES)
        tabs = dict(zip(_TABLE_NAMES, rest[:n_tab]))
        (aabb_ref, mat_ref, plane_ref, sphere_ref, lights_ref, scal_ref,
         out_ref, bt_s, bk_s, at_s, mst_s, tree_s, bits_s) = rest[n_tab:]

        topo_iter = iter(topo_nodes) if emit_topo else None

        i = pl.program_id(0)
        ambient = scal_ref[0, 0]
        fudge = scal_ref[0, 1]

        ox = rays_ref[0:1, :]
        oy = rays_ref[1:2, :]
        oz = rays_ref[2:3, :]
        dx = rays_ref[3:4, :]
        dy = rays_ref[4:5, :]
        dz = rays_ref[5:6, :]
        mind0 = rays_ref[6:7, :]

        inf = jnp.float32(jnp.inf)

        def norm3(x, y, z):
            return jnp.sqrt(x * x + y * y + z * z)

        def at(j):  # (1, tile_r) attribute row
            return at_s[j:j + 1, :]

        def cull_anyhit(cox, coy, coz, cdx, cdy, cdz, ldist, alive,
                        tbound=None):
            """(M, 1) any-ray-touches-cluster mask: slab test with
            clusters on SUBLANES — (M, R) tiles are M/8 x R/128 vregs.
            `ldist` drops clusters entirely beyond the light; `alive`
            drops dead rays; `tbound` ((1, R)) drops clusters whose slab
            entry lies beyond the ray's best plane/sphere hit — a cluster
            triangle there can never win the numeric (t, key) merge."""
            bmnx = aabb_ref[:, 0:1]
            bmny = aabb_ref[:, 1:2]
            bmnz = aabb_ref[:, 2:3]
            bmxx = aabb_ref[:, 3:4]
            bmxy = aabb_ref[:, 4:5]
            bmxz = aabb_ref[:, 5:6]

            def axis_minmax(bmn, bmx, o1, d1):
                innv = 1.0 / d1  # +-inf on zero components
                t1 = (bmn - o1) * innv  # (M, R)
                t2 = (bmx - o1) * innv
                lo = jnp.minimum(t1, t2)
                hi = jnp.maximum(t1, t2)
                lo = jnp.where(jnp.isnan(lo), 0.0, lo)
                hi = jnp.where(jnp.isnan(hi), inf, hi)
                return lo, hi

            lx, hx = axis_minmax(bmnx, bmxx, cox, cdx)
            ly, hy = axis_minmax(bmny, bmxy, coy, cdy)
            lz, hz = axis_minmax(bmnz, bmxz, coz, cdz)
            tmn = jnp.maximum(jnp.maximum(lx, ly), jnp.maximum(lz, 0.0))
            tmx = jnp.minimum(jnp.minimum(hx, hy), hz)
            cond = tmn <= tmx
            if ldist is not None:
                cond &= tmn < ldist
            if tbound is not None:
                cond &= tmn <= tbound  # (1, R) broadcast over (M, R)
            if alive is not None:
                cond &= alive  # (1, R) broadcast over (M, R)
            return jnp.max(
                jnp.where(cond, 1.0, 0.0), axis=1, keepdims=True
            )  # (M, 1)

        def pack_cull(anyhit):
            """Pack the per-SUBLANE (M, 1) mask into one int32 word with
            a single integer shift+sum reduction (ONE vector->scalar sync;
            m <= 32 so every shift is in range)."""
            lane = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
            bits_s[0] = jnp.sum(
                jnp.where(anyhit > 0.0, jnp.int32(1) << (lane & 31), 0)
            )

        def cast(cox, coy, coz, cdx, cdy, cdz, mind, full, primary,
                 ldist=None, alive=None, reuse_cull=False):
            """Nearest hit over all kinds (rays-on-lanes layout). Winner t
            lands in bt_s (1, R), attrs in at_s (16, R). `ldist` switches
            to the any-hit occlusion query (see the sublane kernel).
            `reuse_cull` skips the in-kernel cull and consumes whatever
            packed word bits_s already holds (must be a SUPERSET of this
            cast's tight mask; kept for kernel experiments — the batched
            occlusion cull that used it measured 20 % slower than
            per-light tight culls on bunny 1080p and was removed).

            `alive` ((1, R) bool) marks rays whose result is consumed:
            dead rays (missed at an earlier level / zero bounce weight /
            inactive march lane) are dropped from the in-kernel cluster
            cull so they stop inflating the visit mask. Their winner then
            flips from garbage-hit to miss, which is output-invariant:
            every consumer multiplies by a weight that is exactly 0 for a
            dead ray (shade masks by `hit`, spawn weights carry w=0, march
            accumulation masks by `act`), and all winner fields stay
            finite either way (no NaN * 0)."""
            occl = ldist is not None
            # deferred attribute fetch (see _make_kernel_lanes docstring):
            # the winner-cluster id rides in mst_s row 6 (march state uses
            # rows 0-5 only, and full casts never run inside the light
            # loop, so the row is free for the cast's duration)
            defer = defer_attrs and full and not occl
            if occl:
                bt_s[:] = jnp.zeros((1, tile_r), jnp.float32)
            else:
                bt_s[:] = jnp.full((1, tile_r), inf, jnp.float32)
                bk_s[:] = jnp.full((1, tile_r), _BIGF, jnp.float32)
                at_s[:] = jnp.zeros((16, tile_r), jnp.float32)
                at_s[_A_OBJ:_A_OBJ + 1, :] = jnp.full(
                    (1, tile_r), _BIGF
                )
                if defer:
                    mst_s[6:7, :] = jnp.full((1, tile_r), -1.0)
                if emit_topo:
                    at_s[_A_CODE:_A_CODE + 1, :] = jnp.full(
                        (1, tile_r), -1.0
                    )

            attr_cols = attrs_full if full else attrs_shadow
            # w = d x o (per ray)
            wx = cdy * coz - cdz * coy
            wy = cdz * cox - cdx * coz
            wz = cdx * coy - cdy * cox

            # normalized direction: spheres are parametric w.r.t. it
            # (reference quirk, default_schema.hpp:226-251) and shading
            # needs it regardless of sphere presence
            dlen = norm3(cdx, cdy, cdz)
            ndx, ndy, ndz = cdx / dlen, cdy / dlen, cdz / dlen

            # Plane/sphere intersections hoisted BEFORE the cluster loop:
            # computed once, consumed by (a) the t-bound cull refinement
            # below and (b) the winner merges after the loop (merge ORDER
            # stays triangles -> planes -> spheres, so tie-break semantics
            # are unchanged).
            tp = okp = ts = oks = None
            if has_planes:
                # planes (default_schema.hpp:189-201), planes on sublanes
                pnx = plane_ref[:, _A_NX:_A_NX + 1]
                pny = plane_ref[:, _A_NY:_A_NY + 1]
                pnz = plane_ref[:, _A_NZ:_A_NZ + 1]
                kp = plane_ref[:, _ROW_KP:_ROW_KP + 1]
                pvalid = plane_ref[:, _ROW_VALID:_ROW_VALID + 1]
                denom = cdx * pnx + cdy * pny + cdz * pnz  # (P, R)
                on = cox * pnx + coy * pny + coz * pnz
                tp = (kp - on) / jnp.where(denom == 0.0, 1.0, denom)
                okp = (
                    (denom != 0.0) & jnp.isfinite(tp) & (tp > mind)
                    & (pvalid > 0.0)
                )
            if has_spheres:
                # spheres (default_schema.hpp:226-251): t parametric w.r.t.
                # the NORMALIZED direction (reference quirk)
                scx = sphere_ref[:, _A_CX:_A_CX + 1]
                scy = sphere_ref[:, _A_CY:_A_CY + 1]
                scz = sphere_ref[:, _A_CZ:_A_CZ + 1]
                r2 = sphere_ref[:, _ROW_R2:_ROW_R2 + 1]
                svalid = sphere_ref[:, _ROW_VALID:_ROW_VALID + 1]
                dec = (ndx * scx + ndy * scy + ndz * scz) - (
                    ndx * cox + ndy * coy + ndz * coz
                )
                oc = cox * scx + coy * scy + coz * scz
                ec2 = (cox * cox + coy * coy + coz * coz) - 2.0 * oc + (
                    scx * scx + scy * scy + scz * scz
                )
                sub = dec * dec - (ec2 - r2)
                missed = sub <= 0.0
                sq = jnp.sqrt(jnp.where(missed, 1.0, sub))
                t0 = dec - sq
                t1 = dec + sq
                v0 = ~missed & jnp.isfinite(t0) & (t0 > mind)
                v1 = ~missed & jnp.isfinite(t1) & (t1 > mind)
                ts = jnp.where(
                    v0 & v1, jnp.minimum(t0, t1),
                    jnp.where(v0, t0, jnp.where(v1, t1, inf)),
                )
                oks = (v0 | v1) & (svalid > 0.0)

            # t-bound cull refinement (nearest-hit casts): a cluster whose
            # slab entry lies beyond the ray's best plane/sphere t cannot
            # hold a (t, key)-better triangle. The comparison is in the
            # merge's NUMERIC t space (sphere t is normalized-dir
            # parametric — the reference quirk — and the merge compares
            # the raw numbers, so the bound is consistent by definition).
            # Equality keeps the cluster, preserving tie-breaks. In closed
            # scenes (bunny's box) every bounce ray hits a wall, so
            # clusters beyond it drop out of the visit mask for free — no
            # new vector->scalar syncs, the compare folds into the cull.
            t_bound = None
            if not occl and (has_planes or has_spheres):
                t_bound = jnp.full((1, tile_r), inf, jnp.float32)
                if has_planes:
                    t_bound = jnp.minimum(t_bound, jnp.min(
                        jnp.where(okp, tp, inf), axis=0, keepdims=True))
                if has_spheres:
                    t_bound = jnp.minimum(t_bound, jnp.min(
                        jnp.where(oks, ts, inf), axis=0, keepdims=True))
            if occl and (has_planes or has_spheres):
                # occlusion decided by a plane/sphere: those rays need no
                # triangle visit at all — drop them from the cluster cull
                # (their flag is committed by the merges after the loop
                # regardless, so the output is unchanged)
                pocc = jnp.zeros((1, tile_r), jnp.float32)
                if has_planes:
                    pocc = jnp.maximum(pocc, jnp.max(
                        jnp.where(okp & (tp < ldist), 1.0, 0.0),
                        axis=0, keepdims=True))
                if has_spheres:
                    pocc = jnp.maximum(pocc, jnp.max(
                        jnp.where(oks & (ts < ldist), 1.0, 0.0),
                        axis=0, keepdims=True))
                undecided = pocc < 0.5
                alive = undecided if alive is None else (alive & undecided)

            if (not primary and not reuse_cull
                    and not ("nocull2" in ablate and not occl)
                    and not ("nocullo" in ablate and occl)):
                pack_cull(cull_anyhit(cox, coy, coz, cdx, cdy, cdz,
                                      ldist if occl else None, alive,
                                      tbound=t_bound))

            for mi in range(m):  # static unroll: constants are lane slices
                def visit(mi=mi):
                    col = lambda name: tabs[name][:, mi:mi + 1]  # (C, 1)
                    n0, n1, n2 = col("n0"), col("n1"), col("n2")
                    alpha = cdx * n0 + cdy * n1 + cdz * n2  # (C, R)
                    beta_n = (
                        cdx * col("ub0") + cdy * col("ub1") + cdz * col("ub2")
                        - (wx * col("b0") + wy * col("b1") + wz * col("b2"))
                    )
                    gamma_n = (
                        wx * col("a0") + wy * col("a1") + wz * col("a2")
                        - (cdx * col("ug0") + cdy * col("ug1")
                           + cdz * col("ug2"))
                    )
                    t_n = col("k") - (cox * n0 + coy * n1 + coz * n2)

                    degenerate = alpha == 0.0
                    inv = 1.0 / jnp.where(degenerate, 1.0, alpha)
                    beta = beta_n * inv
                    gamma = gamma_n * inv
                    t = t_n * inv
                    ok = (
                        (~degenerate)
                        & (beta >= 0.0)
                        & (gamma >= 0.0)
                        & (beta + gamma <= 1.0)
                        & jnp.isfinite(t)
                        & (t > mind)
                        & (col("valid") > 0.0)
                    )
                    if occl:
                        occ = jnp.max(
                            jnp.where(ok & (t < ldist), 1.0, 0.0),
                            axis=0, keepdims=True,
                        )
                        bt_s[:] = jnp.maximum(bt_s[:], occ)
                        return
                    t = jnp.where(ok, t, inf)

                    tmin = jnp.min(t, axis=0, keepdims=True)  # (1, R)
                    key = jnp.where(t == tmin, col("order"), _BIGF)
                    kmin = jnp.min(key, axis=0, keepdims=True)
                    kmin = jnp.where(jnp.isfinite(tmin), kmin, _BIGF)

                    best_t = bt_s[:]
                    best_k = bk_s[:]
                    better = (tmin < best_t) | (
                        (tmin == best_t) & (kmin < best_k)
                    )
                    if defer:
                        mst_s[6:7, :] = jnp.where(
                            better, float(mi), mst_s[6:7, :]
                        )
                    else:
                        oneh = ((t == tmin) & (key == kmin)).astype(
                            jnp.float32)
                        for name, j in attr_cols:
                            val = jnp.sum(oneh * col(name), axis=0,
                                          keepdims=True)
                            at_s[j:j + 1, :] = jnp.where(
                                better, val, at_s[j:j + 1, :]
                            )
                    bt_s[:] = jnp.where(better, tmin, best_t)
                    bk_s[:] = jnp.where(better, kmin, best_k)

                if (mi in refresh_at) and 0 < mi < m:
                    if occl:
                        # occlusion refresh: drop rays whose shadow is
                        # already DECIDED by an earlier visit from the
                        # cull — remaining clusters needed by nobody
                        # vanish (output-invariant: decided flags are
                        # committed, bt_s only ever maxes upward)
                        alive2 = bt_s[:] == 0.0
                        if alive is not None:
                            alive2 &= alive
                        pack_cull(cull_anyhit(cox, coy, coz, cdx, cdy,
                                              cdz, ldist, alive2))
                    else:
                        # best-t refresh: re-cull the remaining clusters
                        # against the evolving triangle best t (docstring)
                        tb2 = bt_s[:]
                        if t_bound is not None:
                            tb2 = jnp.minimum(tb2, t_bound)
                        pack_cull(cull_anyhit(cox, coy, coz, cdx, cdy,
                                              cdz, None, alive,
                                              tbound=tb2))
                refreshed = any(0 < p <= mi for p in refresh_at)
                skip_visit = (
                    ("novisit2" in ablate and not primary)
                    or ("novisito" in ablate and occl)
                    or ("novisitn" in ablate and not primary and not occl)
                )
                if skip_visit:
                    pass
                elif primary and not refreshed:
                    word = hits_ref[i * n_words + mi // 32]
                    @pl.when(((word >> (mi % 32)) & 1) != 0)
                    def _():
                        visit()
                else:
                    @pl.when(((bits_s[0] >> mi) & 1) != 0)
                    def _():
                        visit()

            if defer:
                # Post-loop winner-attribute pass over the clusters of the
                # cast's OWN cull word (hits_ref for primaries, bits_s for
                # secondaries): a fresh winner-only word would be ~1.4x
                # tighter but costs another vector->scalar pack — and at
                # the ~1-2-visit unions the t-bound culls produce, the
                # ~1 us pipeline drain of a pack outweighs a masked-out
                # attr body (measured round 3; the drain is also why the
                # kernel packs ONE word per cast, never per cluster).
                # `order` is globally unique, so the key match selects
                # exactly the winning slot; `mine` guards no-hit rays
                # (key _BIGF == padding-slot order 2^30) and clusters
                # that hold no winner.
                if emit_topo:
                    at_s[_A_CODE:_A_CODE + 1, :] = jnp.where(
                        jnp.isfinite(bt_s[:]), bk_s[:], -1.0
                    )
                for mi in range(m):
                    word = (hits_ref[i * n_words + mi // 32]
                            if (primary and not any(
                                0 < p < m for p in refresh_at))
                            else bits_s[0])
                    @pl.when(((word >> (mi % 32 if primary else mi)) & 1)
                             != 0)
                    def _(mi=mi):
                        col = lambda name: tabs[name][:, mi:mi + 1]
                        oneh = (col("order") == bk_s[:]).astype(
                            jnp.float32)  # (C, R)
                        mine = mst_s[6:7, :] == float(mi)
                        for name, j in (
                                ("obj", _A_OBJ), ("snx", _A_NX),
                                ("sny", _A_NY), ("snz", _A_NZ),
                                ("mat", _A_CR)):
                            val = jnp.sum(oneh * col(name), axis=0,
                                          keepdims=True)
                            at_s[j:j + 1, :] = jnp.where(
                                mine, val, at_s[j:j + 1, :]
                            )

            def merge_kind(tab_ref, n, t, ok):
                """Cross-kind merge by (t, scene obj); kinds on sublanes."""
                t = jnp.where(ok, t, inf)
                tmin = jnp.min(t, axis=0, keepdims=True)
                row_obj = tab_ref[:, _A_OBJ:_A_OBJ + 1]  # (n, 1)
                key = jnp.where(t == tmin, row_obj, _BIGF)
                kmin = jnp.min(key, axis=0, keepdims=True)
                kmin = jnp.where(jnp.isfinite(tmin), kmin, _BIGF)
                best_t = bt_s[:]
                best_obj = at(_A_OBJ)
                better = (tmin < best_t) | (
                    (tmin == best_t) & (kmin < best_obj)
                )
                oneh = ((t == tmin) & (key == kmin)).astype(jnp.float32)
                # material params are deferred (mat INDEX in the _A_CR
                # slot until the post-merge lookup)
                if full:
                    pairs = [(j, j) for j in
                             (_A_OBJ, _A_NX, _A_NY, _A_NZ,
                              _A_SPH, _A_CX, _A_CY, _A_CZ)]
                    pairs.append((_ROW_MAT, _A_CR))
                else:
                    pairs = [(_A_OBJ, _A_OBJ), (_ROW_MAT, _A_CR)]
                if emit_topo and (full or not opaque):
                    pairs.append((_ROW_CODE, _A_CODE))
                for src_j, j in pairs:
                    val = jnp.sum(oneh * tab_ref[:, src_j:src_j + 1],
                                  axis=0, keepdims=True)
                    at_s[j:j + 1, :] = jnp.where(
                        better, val, at_s[j:j + 1, :]
                    )
                bt_s[:] = jnp.where(better, tmin, best_t)

            if has_planes:
                if occl:
                    occ = jnp.max(
                        jnp.where(okp & (tp < ldist), 1.0, 0.0),
                        axis=0, keepdims=True,
                    )
                    bt_s[:] = jnp.maximum(bt_s[:], occ)
                else:
                    merge_kind(plane_ref, n_pl, tp, okp)

            if has_spheres:
                if occl:
                    occ = jnp.max(
                        jnp.where(oks & (ts < ldist), 1.0, 0.0),
                        axis=0, keepdims=True,
                    )
                    bt_s[:] = jnp.maximum(bt_s[:], occ)
                else:
                    merge_kind(sphere_ref, n_sp, ts, oks)

            if not occl:
                # deferred material-parameter fetch (see the sublane
                # kernel's twin): ONE one-hot over the (n_mats, 8) table;
                # misses pick material 0, masked by `hit` at consumers
                n_mats = mat_ref.shape[0]
                matv = at(_A_CR)  # (1, R) winner material index
                onehm = (matv == jax.lax.broadcasted_iota(
                    jnp.int32, (n_mats, 1), 0).astype(jnp.float32)
                ).astype(jnp.float32)  # (n_mats, R)
                fetch = (
                    ((0, _A_CR), (1, _A_CG), (2, _A_CB), (3, _A_SPEC),
                     (4, _A_REFL), (5, _A_PHONG), (6, _A_TRANSP))
                    if full else ((6, _A_TRANSP),)
                )
                for row, j in fetch:
                    at_s[j:j + 1, :] = jnp.sum(
                        onehm * mat_ref[:, row:row + 1], axis=0,
                        keepdims=True,
                    )

            return ndx, ndy, ndz

        def shade(o3, d3, nd3, level_first, topo_base=None):
            """Phong + shadows for the current winner (shading.hpp:64-99);
            all per-ray math on (1, R) rows. `topo_base` (static): first
            out_ref row of this node's per-light shadow topology."""
            cox, coy, coz = o3
            cdx, cdy, cdz = d3
            ndx, ndy, ndz = nd3
            bt = bt_s[:]
            hit = jnp.isfinite(bt)
            t_safe = jnp.where(hit, bt, 1.0)
            is_sph = at(_A_SPH) > 0.5
            px = cox + t_safe * jnp.where(is_sph, ndx, cdx)
            py = coy + t_safe * jnp.where(is_sph, ndy, cdy)
            pz = coz + t_safe * jnp.where(is_sph, ndz, cdz)
            sx = px - at(_A_CX)
            sy = py - at(_A_CY)
            sz = pz - at(_A_CZ)
            sl = norm3(sx, sy, sz)
            sl = jnp.where(sl == 0.0, 1.0, sl)
            rnx = jnp.where(is_sph, sx / sl, at(_A_NX))
            rny = jnp.where(is_sph, sy / sl, at(_A_NY))
            rnz = jnp.where(is_sph, sz / sl, at(_A_NZ))

            if level_first:
                out_ref[3:4, :] = bt  # depth (+inf on miss)
                zero = jnp.zeros((1, tile_r), jnp.float32)
                out_ref[4:5, :] = jnp.where(hit, rnx, zero)
                out_ref[5:6, :] = jnp.where(hit, rny, zero)
                out_ref[6:7, :] = jnp.where(hit, rnz, zero)

            gx = jnp.where(hit, rnx, 0.0)
            gy = jnp.where(hit, rny, 0.0)
            gz = jnp.where(hit, rnz, 1.0)
            gl = norm3(gx, gy, gz)
            gl = jnp.where(gl == 0.0, 1.0, gl)
            nnx, nny, nnz = gx / gl, gy / gl, gz / gl

            difr = at(_A_CR)
            difg = at(_A_CG)
            difb = at(_A_CB)
            spec = at(_A_SPEC)
            phong_e = at(_A_PHONG)
            mdx, mdy, mdz = -ndx, -ndy, -ndz

            accr = ambient * difr
            accg = ambient * difg
            accb = ambient * difb

            def light_body(li, acc):
                if opaque:
                    accr, accg, accb = acc
                else:
                    # accumulators live in scratch when the body contains
                    # the march loop: Mosaic cannot legalize an scf.for
                    # with vector carries around a nested loop
                    accr = mst_s[3:4, :]
                    accg = mst_s[4:5, :]
                    accb = mst_s[5:6, :]
                kind = lights_ref[li, 0]
                vx = lights_ref[li, 1]
                vy = lights_ref[li, 2]
                vz = lights_ref[li, 3]
                lcr = lights_ref[li, 4]
                lcg = lights_ref[li, 5]
                lcb = lights_ref[li, 6]
                is_sun = kind == 0.0
                dfx = vx - px
                dfy = vy - py
                dfz = vz - pz
                dist = norm3(dfx, dfy, dfz)
                dsafe = jnp.where(dist == 0.0, 1.0, dist)
                dirx = jnp.where(is_sun, -vx, dfx / dsafe)
                diry = jnp.where(is_sun, -vy, dfy / dsafe)
                dirz = jnp.where(is_sun, -vz, dfz / dsafe)
                distance = jnp.where(is_sun, inf, dist)
                dl = norm3(dirx, diry, dirz)
                light_dist = distance * dl  # shading.hpp:80
                dl = jnp.where(dl == 0.0, 1.0, dl)
                sdx, sdy, sdz = dirx / dl, diry / dl, dirz / dl

                # shadow march (shading.hpp:22-45)
                if opaque:
                    if "noocc" in ablate:
                        sh = jnp.zeros((1, tile_r), jnp.float32)
                    else:
                        # per-light tight cull (a batched union cull over
                        # all lights was measured 20 % SLOWER on bunny
                        # 1080p: the union's extra occlusion visits cost
                        # far more than the n_lights-1 saved
                        # vector->scalar syncs)
                        cast(px, py, pz, sdx, sdy, sdz,
                             jnp.zeros((1, tile_r), jnp.float32) + 1e-3,
                             full=False, primary=False, ldist=light_dist,
                             alive=hit)
                        occ = hit & (bt_s[:] > 0.0)
                        sh = jnp.where(occ, 1.0, 0.0)
                    if topo_base is not None:
                        out_ref[pl.ds(topo_base + li, 1), :] = sh
                else:
                    # march state in scratch rows, scalar-only carry
                    # (see the sublane kernel's march for why)
                    mst_s[0:1, :] = jnp.zeros((1, tile_r), jnp.float32)
                    mst_s[1:2, :] = jnp.zeros((1, tile_r), jnp.float32)
                    mst_s[2:3, :] = jnp.where(hit, 1.0, 0.0)

                    def step_body(si, _):
                        sh = mst_s[0:1, :]
                        last = mst_s[1:2, :]
                        act = mst_s[2:3, :] > 0.5
                        cast(px, py, pz, sdx, sdy, sdz, last + 1e-3,
                             full=False, primary=False, alive=act)
                        if topo_base is not None:
                            out_ref[
                                pl.ds(topo_base + li * per_light + si, 1), :
                            ] = at_s[_A_CODE:_A_CODE + 1, :]
                        st = bt_s[:]
                        stransp = at(_A_TRANSP)
                        okm = act & jnp.isfinite(st) & (st < light_dist)
                        sh = sh + jnp.where(okm, 1.0 - stransp, 0.0)
                        mst_s[0:1, :] = sh
                        mst_s[1:2, :] = jnp.where(okm, st, last)
                        mst_s[2:3, :] = jnp.where(
                            okm & (sh < 1.0), 1.0, 0.0
                        )
                        return 0

                    jax.lax.fori_loop(0, shadow_steps, step_body, 0)
                    sh = mst_s[0:1, :]
                    sh = jnp.where(sh >= 1.0, 1.0, sh)
                lit = sh < 1.0

                # max(0, x) with CUDA fmaxf semantics: NaN -> 0 (a
                # zero-direction sun yields NaN dot products and the
                # reference shades those pixels ambient-only)
                fdd = nnx * sdx + nny * sdy + nnz * sdz
                fd = jnp.where(fdd > 0.0, fdd, 0.0)
                hvx, hvy, hvz = mdx + sdx, mdy + sdy, mdz + sdz
                hl = norm3(hvx, hvy, hvz)
                hl = jnp.where(hl == 0.0, 1.0, hl)
                bdd = (nnx * hvx + nny * hvy + nnz * hvz) / hl
                base = jnp.where(bdd > 0.0, bdd, 0.0)
                backf = base <= 0.0
                fs = jnp.where(
                    backf, 0.0,
                    jnp.exp(phong_e * jnp.log(jnp.where(backf, 1.0, base))),
                )
                wgt = jnp.where(lit, 1.0 - sh, 0.0)
                accr = accr + wgt * (fd * difr + fs * spec * difr) * lcr
                accg = accg + wgt * (fd * difg + fs * spec * difg) * lcg
                accb = accb + wgt * (fd * difb + fs * spec * difb) * lcb
                if opaque:
                    return accr, accg, accb
                mst_s[3:4, :] = accr
                mst_s[4:5, :] = accg
                mst_s[5:6, :] = accb
                return 0

            if "noshade" in ablate:
                pass
            elif opaque:
                accr, accg, accb = jax.lax.fori_loop(
                    0, n_lights, light_body, (accr, accg, accb)
                )
            else:
                mst_s[3:4, :] = accr
                mst_s[4:5, :] = accg
                mst_s[5:6, :] = accb
                jax.lax.fori_loop(0, n_lights, light_body, 0)
                accr = mst_s[3:4, :]
                accg = mst_s[4:5, :]
                accb = mst_s[5:6, :]

            ph = (
                jnp.where(hit, accr, 0.0),
                jnp.where(hit, accg, 0.0),
                jnp.where(hit, accb, 0.0),
            )
            # winner attrs needed by the spawn logic, read BEFORE the
            # shadow casts clobbered at_s? No: shade() runs after its own
            # full cast and the occlusion casts touch only bt_s (opaque)
            # or are re-read per step (march); but the march DOES clobber
            # at_s in the non-opaque path, so capture the spawn columns
            # here from the values loaded above.
            return ph, hit, t_safe, (nnx, nny, nnz)

        # ---- bounce tree: DEPTH-FIRST unroll with tile-dead skipping ----
        # (render/shading.py semantics; same weighted-sum linearization,
        # contributions now accumulate in depth-first instead of level
        # order — a few-ulp fp difference only.)
        #
        # A non-root node is alive for this tile only if some ray carries
        # nonzero weight into it: its exact reflect/transmit prefix hit
        # reflective/transparent geometry at every level. For two-branch
        # trees (2^(b+1)-1 nodes) almost every node is dead for almost
        # every tile; chains die where rays leave the scene. Each non-root
        # node's cast + shadows + whole SUBTREE runs under
        # @pl.when(max weight > 0): one ~1us vector->scalar sync buys
        # skipping the node's casts (5-15us) when dead. pl.when bodies
        # can't return values, so color accumulates into tree_s rows 0-2,
        # and the transparency child's frame is parked in tree_s rows
        # 8(L+1).. across the reflection subtree (keeps register pressure
        # flat in depth).
        ones = jnp.ones((1, tile_r), jnp.float32)
        tree_s[0:3, :] = jnp.zeros((3, tile_r), jnp.float32)

        def do_node(level, o3, d3, w, mind, root):
            if emit_topo:
                _, cast_row, shadow_base = next(topo_iter)

            def body():
                nd3 = cast(*o3, *d3, mind, full=True,
                           primary=(root and prefetch_primary),
                           alive=None if root else (w > 0.0))
                tb = None
                if emit_topo:
                    # winner code BEFORE shade()'s shadow casts clobber at_s
                    out_ref[8 + cast_row:9 + cast_row, :] = at(_A_CODE)
                    tb = 8 + shadow_base
                # capture spawn-relevant winner attrs BEFORE the shadow
                # casts inside shade() overwrite at_s (non-opaque path)
                a_transp = at(_A_TRANSP)
                a_refl = at(_A_REFL)
                ph, hit, t_safe, nn3 = shade(o3, d3, nd3, level_first=root,
                                             topo_base=tb)
                if level == bounces or not (any_refl or any_transp):
                    tree_s[0:1, :] += w * ph[0]
                    tree_s[1:2, :] += w * ph[1]
                    tree_s[2:3, :] += w * ph[2]
                    return
                if any_transp:
                    f = jnp.where(hit & (a_transp >= _EPS), a_transp, 0.0)
                else:
                    f = jnp.zeros((1, tile_r), jnp.float32)
                weff = w * (1.0 - f)
                tree_s[0:1, :] += weff * ph[0]
                tree_s[1:2, :] += weff * ph[1]
                tree_s[2:3, :] += weff * ph[2]
                chx = o3[0] + t_safe * d3[0]
                chy = o3[1] + t_safe * d3[1]
                chz = o3[2] + t_safe * d3[2]
                fmin = jnp.full((1, tile_r), 0.0, jnp.float32) + fudge
                if any_refl and any_transp:
                    # park the transparency child's frame across the
                    # reflection subtree
                    r0 = 8 * (level + 1)
                    tree_s[r0 + 0:r0 + 1, :] = chx
                    tree_s[r0 + 1:r0 + 2, :] = chy
                    tree_s[r0 + 2:r0 + 3, :] = chz
                    tree_s[r0 + 3:r0 + 4, :] = d3[0]
                    tree_s[r0 + 4:r0 + 5, :] = d3[1]
                    tree_s[r0 + 5:r0 + 6, :] = d3[2]
                    tree_s[r0 + 6:r0 + 7, :] = w * f
                if any_refl:
                    r = jnp.where(hit & (a_refl >= _EPS), a_refl, 0.0)
                    nnx, nny, nnz = nn3
                    ndx, ndy, ndz = nd3
                    dot = ndx * nnx + ndy * nny + ndz * nnz
                    rd = (ndx - 2.0 * dot * nnx, ndy - 2.0 * dot * nny,
                          ndz - 2.0 * dot * nnz)
                    do_node(level + 1, (chx, chy, chz), rd, weff * r,
                            fmin, False)
                if any_refl and any_transp:
                    r0 = 8 * (level + 1)
                    to3 = (tree_s[r0 + 0:r0 + 1, :],
                           tree_s[r0 + 1:r0 + 2, :],
                           tree_s[r0 + 2:r0 + 3, :])
                    td3 = (tree_s[r0 + 3:r0 + 4, :],
                           tree_s[r0 + 4:r0 + 5, :],
                           tree_s[r0 + 5:r0 + 6, :])
                    do_node(level + 1, to3, td3,
                            tree_s[r0 + 6:r0 + 7, :], fmin, False)
                elif any_transp:
                    do_node(level + 1, (chx, chy, chz), d3, w * f,
                            fmin, False)

            if root or not node_skip:
                body()
            else:
                @pl.when(jnp.max(w) > 0.0)
                def _():
                    body()

        do_node(0, (ox, oy, oz), (dx, dy, dz), ones, mind0, True)
        out_ref[0:1, :] = tree_s[0:1, :]
        out_ref[1:2, :] = tree_s[1:2, :]
        out_ref[2:3, :] = tree_s[2:3, :]
        out_ref[7:8, :] = jnp.zeros((1, tile_r), jnp.float32)

    return kernel


# --------------------------------------------------------------------------
# host wrapper
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("bounces", "shadow_steps", "any_refl", "any_transp",
                     "n_lights", "interpret", "tile_r", "secondary_cull",
                     "has_planes", "has_spheres", "node_skip", "emit_topo",
                     "defer_attrs", "refresh_at"),
)
def _run_fused(tables, aabb, aabb2, aabbg, mat_tab, plane, sphere,
               lights, rays, hits, scalars,
               bounces, shadow_steps, any_refl, any_transp, n_lights,
               interpret, tile_r=TILE_R, secondary_cull=True,
               has_planes=True, has_spheres=True, node_skip=True,
               emit_topo=False, defer_attrs=True, refresh_at=None):
    m, c = tables["k"].shape
    g = aabb2.shape[1]
    n_g3 = aabbg.shape[1]
    n_mats = mat_tab.shape[1]
    n_pl = plane.shape[1]
    n_sp = sphere.shape[1]
    r_pad = rays.shape[0]
    n_tiles = r_pad // tile_r

    const = lambda shape: pl.BlockSpec(shape, lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i, s: (0, 0),
                                      memory_space=pltpu.SMEM)
    # The unrolled cast chain keeps several (tile_r, C) temporaries live
    # per cast site; the default 16 MiB scoped-VMEM budget is far below
    # the v5e's physical VMEM. Raise it for this kernel.
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # older pallas without the knob
        params = None

    rows_out = 8
    n_nodes = 0
    if emit_topo:
        from cutrace_tpu.ops.replay import topo_layout

        k_rows, nodes_l = topo_layout(bounces, any_refl, any_transp,
                                      n_lights, shadow_steps)
        rows_out = 8 + k_rows
        n_nodes = len(nodes_l)

    if m <= _LANES_MAX_M and tile_r % 128 == 0:
        if refresh_at is None:
            # Default: NO mid-loop best-t refresh. Measured on bunny 1080p
            # b5 (round 3): refresh at (8,) is ~neutral, (4,8,12) is 9 %
            # SLOWER — the cull is a per-tile UNION over 512 divergent
            # rays, so the evolving per-ray best-t almost never empties a
            # cluster for the whole tile, and each refresh pays its slab
            # recompute for nothing. The mechanism stays (refresh_at /
            # CUTRACE_REFRESH_AT) as the documented negative result.
            refresh_at = ()
        # fast path: rays-on-lanes kernel, cluster loop statically unrolled
        kernel = _make_kernel_lanes(
            m, n_pl, n_sp, n_lights, bounces, shadow_steps,
            any_refl, any_transp, tile_r, has_planes, has_spheres,
            node_skip=node_skip, emit_topo=emit_topo,
            prefetch_primary=_prefetch_primary_ok(n_tiles, m),
            defer_attrs=defer_attrs, refresh_at=tuple(refresh_at),
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # packed cull words
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((8, tile_r), lambda i, s: (0, i),
                                   memory_space=pltpu.VMEM)]
            + [const((c, m)) for _ in _TABLE_NAMES]
            + [const((m, _AABB_ROWS)), const((n_mats, 8)),
               const((n_pl, _PS_ROWS)), const((n_sp, _PS_ROWS)),
               smem((max(1, n_lights), 8)), smem((1, 4))],
            out_specs=pl.BlockSpec((rows_out, tile_r), lambda i, s: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, tile_r), jnp.float32),   # best t / occ flag
                pltpu.VMEM((1, tile_r), jnp.float32),   # best order key
                pltpu.VMEM((16, tile_r), jnp.float32),  # winner attrs
                pltpu.VMEM((8, tile_r), jnp.float32),   # light/march state
                # bounce-tree state: rows 0-2 color accumulator, rows
                # 8(L+1).. parked transparency-child frames (DF unroll)
                pltpu.VMEM((8 * (bounces + 1), tile_r), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),            # secondary cull bits
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows_out, r_pad), jnp.float32),
            interpret=interpret,
            compiler_params=params,
        )(hits, rays.T, *[tables[k].T for k in _TABLE_NAMES],
          aabb.T, mat_tab.T, plane.T, sphere.T, lights, scalars)
        return out.T

    # Sublane layout: topo on STATIC lane indices — opaque: 2 columns per
    # node (winner code + packed per-light occlusion flag bits, dynamic
    # light fori); transparent: one column per replay topo row (static-
    # unrolled light/march loops — replay_supported gates the compile-cost
    # budget via _SUBLANE_TOPO_MAX_CASTS).
    if emit_topo:
        cols_out = 8 + (k_rows if any_transp else 2 * n_nodes)
    else:
        cols_out = 8
    hbm = m * c > _VMEM_TABLE_SLOTS
    prefetch_primary = _prefetch_primary_ok(n_tiles, m)
    mxu = _mxu_visits_enabled()
    kernel = _make_kernel(
        m, n_pl, n_sp, n_lights, bounces, shadow_steps,
        any_refl, any_transp, tile_r, secondary_cull,
        has_planes, has_spheres, node_skip=node_skip, emit_topo=emit_topo,
        hbm_tables=hbm, prefetch_primary=prefetch_primary,
        mxu_visits=mxu, mxu_precision=_mxu_precision() if mxu else None,
    )

    hbm_rows = _HBM_TAB_ROWS + (32 if mxu == 1 else 0)
    if hbm:
        # one stacked (M, 32|64, C) HBM-resident table; visited clusters
        # are DMA'd per visit (kernel docstring). MXU mode 1 appends the
        # 32 matmul weight rows after the named rows; mode 2 ships the
        # combined (M, 16, 4C) weight blocks as a second HBM operand.
        tab_in = [pl.BlockSpec(memory_space=pl.ANY)]
        stacked = jnp.zeros((m, hbm_rows, c), jnp.float32)
        stacked = stacked.at[:, : len(_HBM_STREAM_NAMES)].set(
            jnp.stack([tables[k] for k in _HBM_STREAM_NAMES], axis=1)
        )
        if mxu == 1:
            stacked = stacked.at[:, _HBM_TAB_ROWS:].set(
                _mxu_weight_blocks(tables)
            )
        tab_ops = (stacked,)
        if mxu == 2:
            tab_in.append(pl.BlockSpec(memory_space=pl.ANY))
            tab_ops += (_mxu_weight_blocks16(tables),)
    else:
        names = _sublane_table_names(mxu)
        tab_in = [const((m, c)) for _ in names]
        tab_ops = tuple(tables[k] for k in names)
        if mxu == 2:
            tab_in.append(const((16 * m, 4 * c)))
            tab_ops += (
                _mxu_weight_blocks16(tables).reshape(16 * m, 4 * c),)
        elif mxu:
            tab_in.append(const((32 * m, c)))
            tab_ops += (_mxu_weight_blocks(tables).reshape(32 * m, c),)

    scratch = [
        pltpu.VMEM((tile_r, 1), jnp.float32),   # best t
        pltpu.VMEM((tile_r, 1), jnp.int32),     # best order key
        pltpu.VMEM((tile_r, 16), jnp.float32),  # winner attrs
        pltpu.VMEM((tile_r, 8), jnp.float32),   # light/march state
        # bounce-tree state: cols 0-2 color accumulator, cols
        # 8(L+1).. parked transparency-child frames (DF unroll)
        pltpu.VMEM((tile_r, 8 * (bounces + 1)), jnp.float32),
        # secondary cull bits: ceil(m3/32) cluster words (m3 = m
        # padded to the group-exact branch's 128 multiple) + 1 group word
        # + ceil(G3/4) packed 8-bit near-to-far group-rank words
        pltpu.SMEM((4 * (-(-m // 128)) + 1 + (-(-(-(-m // 128)) // 4)),),
                   jnp.int32),
    ]
    if hbm:
        scratch += [
            # 2-slot streamed block (slot 1 idle on the sync path)
            pltpu.VMEM((2 * hbm_rows, c), jnp.float32),
        ] + ([pltpu.VMEM((16, 4 * c), jnp.float32)]  # streamed weights
             if mxu == 2 else []) + [
            pltpu.SemaphoreType.DMA((2,)),  # per-slot DMA semaphores
            pltpu.SMEM((8,), jnp.int32),    # double-buffer state
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # hits (n_tiles, M) words (or a dummy)
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_r, 8), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM)]
        + tab_in
        + [const((_AABB_ROWS, m)), const((_AABB_ROWS, g)),
           const((_AABB_ROWS, n_g3)), const((8, n_mats)),
           const((_PS_ROWS, n_pl)), const((_PS_ROWS, n_sp)),
           smem((max(1, n_lights), 8)), smem((1, 4))],
        out_specs=pl.BlockSpec((tile_r, cols_out), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, cols_out), jnp.float32),
        interpret=interpret,
        compiler_params=params,
    )(hits, rays, *tab_ops,
      aabb, aabb2, aabbg, mat_tab, plane, sphere, lights, scalars)
    return out


def _primary_t_bound(plane, sphere, o, d, fudge, has_planes, has_spheres):
    """Per-ray best plane/sphere hit t ((R,) f32, +inf when none) for the
    XLA-side primary cull: a cluster whose slab entry lies beyond it can
    never win the numeric (t, key) merge (same bound the kernels apply to
    secondary casts in-kernel). Consumes the kernel's own (24, P)/(24, S)
    tables so the math is identical by construction; sphere t keeps the
    reference's normalized-direction parametrization
    (default_schema.hpp:226-251) — the merge compares raw numbers, so the
    bound is consistent with it by definition."""
    inf = jnp.float32(jnp.inf)
    tb = jnp.full((o.shape[0],), inf, jnp.float32)

    def dots(a, b):
        """(R,3) x (3,N) -> (R,N) in EXACT f32 via broadcast-elementwise
        forms: on TPU a default-precision matmul runs bf16 on the MXU,
        and a near-parallel plane ray (denom ~ 0) then yields a garbage-
        small t that wrongly culls every cluster behind it — 746 wrong
        primary winners on mirror.json 96x54, caught by the round-3
        tpu_smoke suite (interpret mode computes matmuls in f64-ish and
        never sees it). HIGHEST-precision matmuls are exact but
        pathological at tiny N (docs/performance.md "learned" #4); the
        broadcast form fuses into cheap VPU code at N <= 8."""
        return jnp.sum(a[:, None, :] * b.T[None, :, :], axis=-1)

    if has_planes:
        pn = plane[_A_NX:_A_NZ + 1, :]  # (3, P)
        kp = plane[_ROW_KP, :]
        pvalid = plane[_ROW_VALID, :]
        denom = dots(d, pn)  # (R, P)
        on = dots(o, pn)
        tp = (kp[None, :] - on) / jnp.where(denom == 0.0, 1.0, denom)
        okp = (
            (denom != 0.0) & jnp.isfinite(tp) & (tp > fudge)
            & (pvalid[None, :] > 0.0)
        )
        tb = jnp.minimum(tb, jnp.min(jnp.where(okp, tp, inf), axis=1))
    if has_spheres:
        nd = d / jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
        sc = sphere[_A_CX:_A_CZ + 1, :]  # (3, S)
        r2 = sphere[_ROW_R2, :]
        svalid = sphere[_ROW_VALID, :]
        dec = dots(nd, sc) - jnp.sum(nd * o, axis=1, keepdims=True)  # (R,S)
        oc = dots(o, sc)
        ec2 = (
            jnp.sum(o * o, axis=1, keepdims=True) - 2.0 * oc
            + jnp.sum(sc * sc, axis=0)[None, :]
        )
        sub = dec * dec - (ec2 - r2[None, :])
        missed = sub <= 0.0
        sq = jnp.sqrt(jnp.where(missed, 1.0, sub))
        t0, t1 = dec - sq, dec + sq
        v0 = ~missed & jnp.isfinite(t0) & (t0 > fudge)
        v1 = ~missed & jnp.isfinite(t1) & (t1 > fudge)
        tss = jnp.where(
            v0 & v1, jnp.minimum(t0, t1),
            jnp.where(v0, t0, jnp.where(v1, t1, inf)),
        )
        oks = (v0 | v1) & (svalid[None, :] > 0.0)
        tb = jnp.minimum(tb, jnp.min(jnp.where(oks, tss, inf), axis=1))
    return tb


def _fused_forward(soa, accel, o, d, fudge, bounces, emit_topo=False):
    """Forward fused render of explicit rays. Returns (color (R,3),
    depth (R,), normal (R,3)); with emit_topo also the (R, K) i32
    topology codes (ops/replay.py layout)."""
    from cutrace_tpu.ops.bvh import slab_entry

    sg = jax.lax.stop_gradient
    o0 = sg(soa.scene_center)
    (tables, aabb, aabb2, aabbg, plane, sphere,
     mat_tab) = _tables(soa, accel, o0)
    lights = _light_table(soa, o0)
    m = tables["k"].shape[0]

    import os as _os

    r = o.shape[0]
    # Adaptive ray-tile size: 512 for lanes-range scenes (bunny 1080p b5
    # measured flat across 512/256/128 — round 2), 128 for sublane (big)
    # scenes, where a 512-ray tile's world footprint crosses many fine
    # clusters and the per-tile visit UNION dominates: 256k bunny 480x270
    # b5 measured 1.30 / 0.90 / 0.75 / 0.87 s at tile 512/256/128/64
    # (round 3). CUTRACE_TILE_R overrides for experiments.
    default_tile = TILE_R if m <= _LANES_MAX_M else 128
    tile_r = int(_os.environ.get("CUTRACE_TILE_R", default_tile))
    r_pad = _ceil_to(r, tile_r)
    pad = r_pad - r

    o = sg(o) - o0
    d = sg(d)
    mind = jnp.full((r, 1), jnp.float32(fudge))

    def pad_to(x, fill):
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )

    # padding rays get min_dist = inf: they can never hit anything
    rays = jnp.concatenate(
        [pad_to(o, 0.0), pad_to(d, 1.0), pad_to(mind, jnp.inf),
         jnp.zeros((r_pad, 1), jnp.float32)],
        axis=1,
    )

    n_tiles = r_pad // tile_r
    if not _prefetch_primary_ok(n_tiles, m):
        # primary cull happens in-kernel (_run_fused compiles the root
        # cast like a secondary): the prefetch words would outgrow SMEM
        # at this cluster x tile count. Dummy prefetch operand.
        hits = jnp.zeros((1,), jnp.int32)
    else:
        bmin = aabb[0:3].T
        bmax = aabb[3:6].T
        # t-bound cull refinement: clusters whose slab entry lies beyond
        # the ray's best plane/sphere hit drop out of the primary mask
        # (same bound the kernels apply to secondary casts; padding rays
        # get +inf = no refinement, keeping their mask unchanged).
        tbound = _primary_t_bound(
            plane, sphere, o, d, jnp.float32(fudge),
            soa.n_planes > 0, soa.n_spheres > 0,
        )
        tbound = pad_to(tbound, jnp.inf)
        if r_pad * m <= (1 << 27):
            lo, hi = slab_entry(bmin, bmax, rays[:, 0:3], rays[:, 3:6])
            ray_hits = (lo <= hi) & (lo <= tbound[:, None])
            tile_hits = ray_hits.reshape(n_tiles, tile_r, m).any(axis=1)
        else:
            # big partitions: the (R, M) slab-test intermediate would be
            # GBs; scan tile batches instead (compute identical, memory
            # bounded)
            batch = max(1, (1 << 24) // (tile_r * m))
            n_b = -(-n_tiles // batch)
            rt = jnp.zeros((n_b * batch, tile_r, 7), jnp.float32)
            rt = rt.at[:n_tiles].set(
                jnp.concatenate([rays[:, 0:6], tbound[:, None]], axis=1)
                .reshape(n_tiles, tile_r, 7)
            )

            def tile_mask(chunk):  # (batch, tile_r, 7) -> (batch, M)
                lo, hi = slab_entry(bmin, bmax,
                                    chunk[..., 0:3].reshape(-1, 3),
                                    chunk[..., 3:6].reshape(-1, 3))
                h = (lo <= hi) & (lo <= chunk[..., 6].reshape(-1)[:, None])
                return h.reshape(-1, tile_r, m).any(axis=1)

            tile_hits = jax.lax.map(
                tile_mask, rt.reshape(n_b, batch, tile_r, 7)
            ).reshape(n_b * batch, m)[:n_tiles]
        # bit-pack per-tile cluster masks into int32 words: the prefetched
        # SMEM operand is (n_tiles, ceil(M/32)) instead of (n_tiles, M) —
        # 1080p with M=128 would otherwise need 2 MiB of the 1 MiB SMEM
        w = -(-m // 32)
        padded = jnp.zeros((n_tiles, w * 32), jnp.uint32)
        padded = padded.at[:, :m].set(tile_hits.astype(jnp.uint32))
        shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
        hits = jax.lax.bitcast_convert_type(
            jnp.sum(padded.reshape(n_tiles, w, 32) << shifts, axis=-1,
                    dtype=jnp.uint32),
            jnp.int32,
        ).reshape(n_tiles * w)

    scalars = jnp.stack(
        [sg(soa.ambient).astype(jnp.float32), jnp.float32(fudge),
         jnp.float32(0), jnp.float32(0)]
    ).reshape(1, 4)

    import os

    # Tile-dead node skipping: on by default exactly when the scene's
    # material stats say chains die on hits (soa.chains_die); the env var
    # is an A/B override for kernel experiments.
    ns_env = os.environ.get("CUTRACE_NODE_SKIP")
    node_skip = soa.chains_die if ns_env is None else ns_env != "0"
    # A/B overrides for the lanes kernel's deferred-attrs / best-t-refresh
    # optimizations (kernel experiments; defaults are the measured winners)
    da_env = os.environ.get("CUTRACE_DEFER_ATTRS")
    defer_attrs = True if da_env is None else da_env != "0"
    ra_env = os.environ.get("CUTRACE_REFRESH_AT")
    refresh_at = (None if ra_env is None else
                  tuple(int(x) for x in ra_env.split(",") if x))
    out = _run_fused(
        tables, aabb, aabb2, aabbg, mat_tab, plane, sphere, lights, rays,
        hits, scalars,
        bounces=bounces, shadow_steps=soa.shadow_steps,
        any_refl=soa.any_reflective, any_transp=soa.any_transparent,
        n_lights=soa.n_lights, interpret=accel.interpret,
        secondary_cull=True, tile_r=tile_r,
        has_planes=soa.n_planes > 0, has_spheres=soa.n_spheres > 0,
        node_skip=node_skip, emit_topo=emit_topo,
        defer_attrs=defer_attrs, refresh_at=refresh_at,
    )[:r]
    if emit_topo:
        if (m <= _LANES_MAX_M and tile_r % 128 == 0) or soa.any_transparent:
            # lanes kernel — and the sublane transparent (topo_static)
            # mode — already emit the replay row layout directly
            raw = out[:, 8:]
        else:
            # sublane opaque: (code, packed occlusion flags) column pairs
            # — unpack the flag bits into per-light rows (opaque scenes:
            # per_light == 1, so the replay layout is nodes x (1 + L))
            from cutrace_tpu.ops.replay import topo_layout

            _, nodes_l = topo_layout(
                bounces, soa.any_reflective, soa.any_transparent,
                soa.n_lights, soa.shadow_steps,
            )
            cols = []
            for k in range(len(nodes_l)):
                code = out[:, 8 + 2 * k]
                flags = out[:, 8 + 2 * k + 1]
                flags = jnp.where(jnp.isfinite(flags), flags, 0.0)
                cols.append(code)
                for li in range(soa.n_lights):
                    cols.append(jnp.floor(flags / (2.0 ** li)) % 2.0)
            raw = jnp.stack(cols, axis=1)
        # Dead-node rows are never written (tile-skip): whatever bits the
        # VMEM block held flow out. Their weights are exactly 0 in the
        # replay, but sanitize to a valid miss code so no NaN/overflow
        # reaches the int conversion.
        codes = jnp.where(jnp.isfinite(raw), raw, -1.0)
        codes = jnp.clip(codes, -1.0, 2.0**24).astype(jnp.int32)
        return out[:, 0:3], out[:, 3], out[:, 4:7], codes
    return out[:, 0:3], out[:, 3], out[:, 4:7]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_render_rays(soa, accel, o, d, fudge, bounces):
    """Fused-kernel render of explicit rays: (color (R,3), depth (R,),
    normal (R,3)).

    Forward runs the single fused Pallas kernel. The custom backward is
    the cast-free topology replay where replay_supported (forward emits
    winner codes, ops/replay.py differentiates gathers + shading math —
    measured 3.7x faster than re-rendering), else it differentiates the
    composable JAX pipeline (render.renderer.render_rays with this accel's
    triangle provider). Both give the exact fixed-topology gradients —
    never a silent zero (the round-1 failure mode this contract forbids)."""
    return _fused_forward(soa, accel, o, d, fudge, bounces)


def replay_supported(soa, accel, bounces: int, n_rays: int = 0) -> bool:
    """Static check: can the backward replay topology codes instead of
    re-rendering? The lanes kernel emits full topology; the sublane kernel
    (big scenes) emits it for OPAQUE scenes only (packed occlusion-flag
    columns); the topo block must fit the kernel's out-block budget and,
    given `n_rays` (static at trace time), the materialized code buffer
    must fit the HBM budget (ops/replay.py)."""
    import os as _os

    from cutrace_tpu.ops.replay import (REPLAY_MAX_CODE_BYTES,
                                        REPLAY_MAX_ROWS, replay_rows)

    code_budget = int(_os.environ.get("CUTRACE_REPLAY_MAX_CODE_BYTES",
                                      REPLAY_MAX_CODE_BYTES))

    if accel is None or accel.kind != "fused":
        return False
    if not fused_supported(soa, accel, bounces):
        return False
    m = accel.order.shape[0]
    lanes = m <= _LANES_MAX_M and TILE_R % 128 == 0
    if not lanes and soa.any_transparent:
        # Transparent sublane emission (topo_static in _make_kernel)
        # needs the light AND march loops statically unrolled (per-step
        # occluder CODES can't bit-pack into one column like opaque
        # flags, and Mosaic cannot dynamically index the lane/column
        # dimension), so program size grows with nodes x (1 + L x S)
        # cast bodies. Beyond this budget compile time explodes and the
        # composable backward is the better trade.
        nodes = _n_wave_nodes(bounces, soa.any_reflective, True)
        if nodes * (1 + soa.n_lights * soa.shadow_steps) > \
                _SUBLANE_TOPO_MAX_CASTS:
            return False
    rows = replay_rows(soa, bounces)
    if rows > REPLAY_MAX_ROWS:
        return False
    return rows * max(n_rays, 1) * 4 <= code_budget


def _chunked_rays(fn, chunk, *arrays_with_fill):
    """Run a per-ray pipeline in ray chunks under lax.map: bounds every
    (rays x nodes) transient — and, under jax.vjp, its transpose — to one
    chunk, while parameter cotangents accumulate across chunks. Each
    argument is (array, pad_fill) with a shared leading ray dim; returns
    fn's (color, depth, normal) for all rays."""
    r0 = arrays_with_fill[0][0].shape[0]
    k = -(-r0 // chunk)
    if k <= 1:
        return fn(*[a for a, _ in arrays_with_fill])
    ch = -(-r0 // k)
    pad = k * ch - r0

    def p(x, fill):
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])

    stacked = tuple(
        p(a, fill).reshape((k, ch) + a.shape[1:])
        for a, fill in arrays_with_fill
    )
    c, dep, nrm = jax.lax.map(lambda xs: fn(*xs), stacked)
    return (c.reshape(k * ch, 3)[:r0], dep.reshape(k * ch)[:r0],
            nrm.reshape(k * ch, 3)[:r0])


def _fused_fwd(soa, accel, o, d, fudge, bounces):
    if replay_supported(soa, accel, bounces, n_rays=o.shape[0]):
        c, dep, nrm, codes = _fused_forward(
            soa, accel, o, d, fudge, bounces, emit_topo=True
        )
        return (c, dep, nrm), (soa, accel, o, d, codes)
    return _fused_forward(soa, accel, o, d, fudge, bounces), (
        soa, accel, o, d, None,
    )


def _fused_bwd(fudge, bounces, res, cot):
    import numpy as np

    soa, accel, o, d, codes = res

    from cutrace_tpu.ops.replay_vjp import replay_vjp, replay_vjp_supported

    if codes is not None and replay_vjp_supported(soa, bounces):
        # The hand-written Pallas replay-VJP kernel — the whole backward
        # in one kernel pass (ops/replay_vjp.py; the XLA replay vjp below
        # measured 778 ms of the 1.18 s bunny 1080p b5 grad step as ~90
        # HBM-bouncing fusions per chunk). Covers opaque chains and
        # transparent two-branch trees within the gate's budgets.
        # Gradient semantics identical (tests/test_replay_vjp.py).
        g_soa, g_o, g_d = replay_vjp(
            soa, o, d, codes, cot, fudge, bounces, accel.interpret
        )
    elif codes is not None:
        # Cast-free fixed-topology backward: differentiate the code-driven
        # replay (gathers + shading math only, ops/replay.py). Gradient
        # semantics match the composable path — it re-derives the same
        # continuous math at the same stop-gradiented winners.
        #
        # Big ray counts run the replay CHUNKED under lax.map: the packed
        # row gather's transpose can lower to a dense one-hot contraction
        # ((rays x primitives) — 100 GB at 1080p unchunked), and mapping
        # bounds the transient to one chunk while the parameter cotangents
        # accumulate across chunks in the map transpose.
        from cutrace_tpu.ops.replay import replay_render_rays

        # Chunk scales with the topo-row count: per-chunk transpose temps
        # grow with rows, and deep two-branch trees (441 rows) measured
        # right at 16384 (the 131072 bunny default would OOM there).
        from cutrace_tpu.ops.replay import replay_rows

        _rows = replay_rows(soa, bounces)
        _REPLAY_CHUNK = int(__import__("os").environ.get(
            "CUTRACE_REPLAY_CHUNK", 131072 if _rows <= 64 else 16384))

        def rep(soa_, o_, d_):
            # the chunk body is rematerialized like the composable one:
            # lax.map's vjp otherwise stacks every chunk's residuals
            # (tolerable at bunny's 30 topo rows, prohibitive at deep
            # two-branch trees' 441), and the replay forward is gathers +
            # elementwise — cheap to recompute
            return _chunked_rays(
                jax.checkpoint(
                    lambda oo, dd, cc: replay_render_rays(
                        soa_, oo, dd, cc, jnp.float32(fudge), bounces)
                ),
                _REPLAY_CHUNK, (o_, 0.0), (d_, 1.0), (codes, -1),
            )

        _, vjp = jax.vjp(rep, soa, o, d)
        g_soa, g_o, g_d = vjp(cot)
    else:
        # Out of replay scope (sublane kernel / deep two-branch tree):
        # differentiate the composable pipeline over the same clusters.
        # CHUNKED + REMATERIALIZED: the two-branch tree's deepest
        # wavefront level batches rays x 2^bounces nodes, and its
        # unchunked vjp OOM'd at compile for sphere_plane 1080p b5
        # (f32[66355200,3] transients, 34 GB > HBM — round 4). Chunking
        # alone is NOT enough — lax.map's vjp stacks every chunk's
        # residuals (measured 160 GB at 1080p b5) — so the chunk body is
        # jax.checkpoint'ed: only (o, d) chunks are saved and the
        # transpose recomputes each chunk's forward in its own window
        # (one extra forward of compute for O(chunk) memory).
        from cutrace_tpu.ops.bvh import candidates_fn
        from cutrace_tpu.render.renderer import render_rays

        # Default chunk scales with the tree: two-branch scenes batch
        # rays x 2^bounces nodes per level and XLA pads the transpose's
        # (N, 3)/(N, 1) temps to 128 lanes (42.7-128x), so the memory per
        # chunk ray is ~2^bounces x 10 KB. 4096 measured 3.5 GB / 46.7
        # s/step for sphere_plane 1080p b5 (64800 OOM'd at 56 GB).
        two_branch = soa.any_reflective and soa.any_transparent
        default_chunk = max(4096, 65536 >> bounces) if two_branch else 65536
        _COMP_CHUNK = int(__import__("os").environ.get(
            "CUTRACE_COMPOSABLE_BWD_CHUNK", default_chunk))

        def composable(soa_, o_, d_):
            return _chunked_rays(
                jax.checkpoint(
                    lambda oo, dd: render_rays(soa_, oo, dd, bounces,
                                               jnp.float32(fudge),
                                               candidates_fn(accel))
                ),
                _COMP_CHUNK, (o_, 0.0), (d_, 1.0),
            )

        _, vjp = jax.vjp(composable, soa, o, d)
        g_soa, g_o, g_d = vjp(cot)
    # integer/bool pytree leaves take float0 cotangents
    g_accel = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), accel
    )
    return g_soa, g_accel, g_o, g_d


fused_render_rays.defvjp(_fused_fwd, _fused_bwd)
