"""Fused whole-pipeline kernel (ops/fused.py) vs the composable renderer.

The composable JAX path (ray_cast + shading.ray_color) is the semantics
oracle; the fused kernel must reproduce its color/depth/normal output to
float tolerance on every bundled scene that is in scope (chain bounce
trees; sphere_plane's two-branch tree at small bounce depth)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutrace_tpu.ops import bvh
from cutrace_tpu.render.renderer import prepare, render
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa


def _load(scenes_dir, name, w, h):
    sc = load_scene(scenes_dir / name)
    sc.camera.width, sc.camera.height = w, h
    return scene_to_soa(sc)


def _compare(base, out, names=("color", "depth", "normal"), atol=1e-4,
             edge_budget=0.05):
    """The kernel re-derives t elementwise (vs the matmul-form composable
    cast), so nearest-hit winners can flip at float-equal knife edges —
    ULP-level deviations that the bounce recursion amplifies into visible
    single-pixel changes ON image discontinuities only (the same deviation
    class the golden-image suite budgets, tests/test_device_renderer.py).
    Gate: ZERO mismatches away from discontinuities of the reference
    image, small budget on them."""
    from test_device_renderer import discontinuity_mask

    for a, b, name in zip(base, out, names):
        a, b = np.asarray(a), np.asarray(b)
        ok = np.isclose(a, b, atol=atol) | (np.isinf(a) & np.isinf(b))
        bad = ~ok.reshape(a.shape[0], a.shape[1], -1).all(-1)
        edges = discontinuity_mask(a)
        off = bad & ~edges
        assert off.sum() == 0, (
            f"{name}: {off.sum()} mismatches OFF discontinuities at "
            f"{np.argwhere(off)[:3].tolist()}"
        )
        on_frac = (bad & edges).sum() / max(edges.sum(), 1)
        assert on_frac <= edge_budget, (
            f"{name}: {on_frac:.3f} of edge pixels mismatch"
        )


@pytest.mark.parametrize(
    "scene,bounces",
    [
        ("triangle.json", 5),     # no branches
        ("bunny.json", 3),        # reflection chain, 4 lights, mesh+planes
        pytest.param("mirror.json", 3,        # strong mirrors, 2 lights
                     marks=pytest.mark.slow),
        pytest.param("sphere_plane.json", 3,  # reflective AND transparent
                     marks=pytest.mark.slow), # (15-node tree), spheres +
                                              # transparency shadow march
    ],
)
def test_fused_matches_composable(scenes_dir, scene, bounces):
    soa = _load(scenes_dir, scene, 48, 27)
    base = render(prepare(soa, accel="none"), bounces=bounces)
    out = render(prepare(soa, accel="fused"), bounces=bounces)
    _compare(base, out, atol=2e-4)


@pytest.mark.slow
def test_fused_out_of_scope_falls_back(scenes_dir):
    """sphere_plane at bounce depth 6 (127-node two-branch tree) exceeds
    the fused kernel's 63-node unroll budget — render() must fall back to
    the composable culling cast and still match brute force. (Depth 5 =
    63 nodes is IN scope since round 2 and covered by the parity suite.)"""
    from cutrace_tpu.ops.fused import fused_supported

    soa = _load(scenes_dir, "sphere_plane.json", 16, 8)
    prepared = prepare(soa, accel="fused")
    assert fused_supported(soa, prepared.accel, 5)
    assert not fused_supported(soa, prepared.accel, 6)
    base = render(prepare(soa, accel="none"), bounces=6)
    out = render(prepared, bounces=6)
    _compare(base, out, atol=1e-4)


@pytest.mark.slow
def test_fused_gradients_via_composable_backward(scenes_dir):
    """jax.grad through a fused render must match brute-force gradients
    (the custom_vjp reroutes the backward through the composable path) —
    never silently zero."""
    from cutrace_tpu.ops.fused import fused_render_rays
    from cutrace_tpu.render.renderer import camera_rays
    from cutrace_tpu.diff.grad import extract_params, with_params

    soa = _load(scenes_dir, "mirror.json", 16, 9)
    accel = bvh.build_accel(soa, 128, kind="fused", interpret=True)
    idx = jnp.arange(16 * 9, dtype=jnp.int32)

    def loss_fused(params):
        s = with_params(soa, params)
        o, d = camera_rays(s, idx % 16, idx // 16)
        color, _, _ = fused_render_rays(s, accel, o, d, 1e-3, 2)
        return jnp.mean(color**2)

    def loss_brute(params):
        from cutrace_tpu.render.renderer import render_rays

        s = with_params(soa, params)
        o, d = camera_rays(s, idx % 16, idx // 16)
        color, _, _ = render_rays(s, o, d, 2, jnp.float32(1e-3))
        return jnp.mean(color**2)

    params = extract_params(soa)
    g_fused = jax.grad(loss_fused)(params)
    g_brute = jax.grad(loss_brute)(params)
    for field in ("tri_p1", "mat_color", "light_color"):
        a = np.asarray(g_brute[field])
        b = np.asarray(g_fused[field])
        assert np.abs(a).sum() > 1e-4, f"brute {field} grad is zero?!"
        assert np.allclose(a, b, rtol=1e-3, atol=1e-5), field


def test_fused_never_stale(scenes_dir):
    """Moving vertices with a fixed fused partition must re-render the
    moved geometry (tables are gathered live in-trace)."""
    soa = _load(scenes_dir, "bunny.json", 32, 18)
    prepared = prepare(soa, accel="fused")
    before = np.asarray(render(prepared, bounces=1)[0])
    shift = jnp.asarray([0.0, 1.5, 0.0], jnp.float32)
    moved = dataclasses.replace(
        soa,
        tri_p1=soa.tri_p1 + shift,
        tri_p2=soa.tri_p2 + shift,
        tri_p3=soa.tri_p3 + shift,
    )
    out = np.asarray(render(dataclasses.replace(prepared, soa=moved),
                            bounces=1)[0])
    ref = np.asarray(render(moved, bounces=1)[0])
    assert not np.allclose(before, out), "fused render is stale"
    _compare([ref], [out], names=("color",), atol=1e-3)


@pytest.mark.parametrize("exact_cap,group_cap", [
    (128, 4096),  # flat exact cull (m=125 <= 128)
    (16, 4096),   # two-level exact group cull (16 < m <= 4096)
    (16, 16),     # conservative interval cull (m > both caps)
])
def test_fused_multiword_cull_paths(scenes_dir, monkeypatch, exact_cap,
                                    group_cap):
    """M > 31 clusters exercises the multi-word secondary cull bitmask in
    all three regimes (flat exact / two-level group exact / conservative
    interval — forced by lowering the caps). All must match the
    composable renderer exactly."""
    from cutrace_tpu.ops import fused

    monkeypatch.setattr(fused, "_EXACT_CULL_MAX_M", exact_cap)
    monkeypatch.setattr(fused, "_EXACT_GROUP_MAX_M", group_cap)
    soa = _load(scenes_dir, "bunny.json", 32, 18)
    accel = bvh.build_accel(soa, 8, kind="fused", interpret=True)
    m = accel.order.shape[0]
    assert m > 31, f"want a multi-word partition, got M={m}"
    from cutrace_tpu.render.renderer import PreparedScene

    base = render(prepare(soa, accel="none"), bounces=1)
    out = render(PreparedScene(soa=soa, accel=accel), bounces=1)
    _compare(base, out, atol=2e-4)


def test_subdivided_mesh_renders_identically(scenes_dir):
    """Midpoint subdivision leaves the surface unchanged, so a 16x-
    subdivided bunny (16k triangles, M=128 clusters -> sublane kernel,
    multi-word cull) must render the same image as the original
    (knife-edge tie-break flips allowed on discontinuities only)."""
    from cutrace_tpu.scene.mesh_io import subdivide
    from cutrace_tpu.scene.loader import load_scene as _ls

    sc = _ls(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 32, 18
    base = render(prepare(scene_to_soa(sc), accel="none"), bounces=1)
    for ob in sc.objects:
        if type(ob).__name__ == "Mesh":
            ob.vertices = subdivide(ob.vertices, 2)
    out = render(prepare(sc, accel="fused"), bounces=1)
    _compare(base, out, atol=2e-4, edge_budget=0.10)


@pytest.mark.slow
def test_fused_no_lights(scenes_dir):
    """A scene with zero lights must render (ambient-only) through the
    fused kernel: the lights SMEM operand shaped (0, 8) crashed the TPU
    compiler (SIGFPE in window-param setup) before the max(1, .) guard."""
    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 32, 18
    sc.lights = []
    soa = scene_to_soa(sc)
    base = render(prepare(soa, accel="none"), bounces=2)
    out = render(prepare(soa, accel="fused"), bounces=2)
    _compare(base, out, atol=2e-4)


def test_prepare_picks_lanes_friendly_cluster_size(scenes_dir):
    """prepare() chooses the smallest cluster size that keeps the
    partition inside the rays-on-lanes kernel's M <= 32 static unroll
    (finer clusters cull more per visit), and C=256 beyond that range
    (the sublane optimum — docs/performance.md round 3)."""
    from cutrace_tpu.ops.fused import _LANES_MAX_M
    from cutrace_tpu.scene.mesh_io import subdivide

    sc = load_scene(scenes_dir / "bunny.json")  # 1000 tris
    p = prepare(scene_to_soa(sc), accel="fused")
    m, c = p.accel.order.shape
    assert c == 64 and m <= _LANES_MAX_M

    for ob in sc.objects:
        if type(ob).__name__ == "Mesh":
            ob.vertices = subdivide(ob.vertices, 2)  # 16k tris
    p = prepare(sc, accel="fused")
    m, c = p.accel.order.shape
    assert c == 256 and m > _LANES_MAX_M


@pytest.mark.slow
def test_hbm_streamed_tables_parity(scenes_dir, monkeypatch):
    """The HBM-streamed sublane variant (cluster tables in one stacked HBM
    array, visited clusters DMA'd per visit) must match the VMEM-resident
    kernel and the composable renderer exactly. Since round 3 it is the
    production default for scenes past the VMEM table budget (measured
    faster than the composable streamed pipeline — docs/performance.md);
    this test forces it on a tiny scene by shrinking the threshold."""
    import jax.numpy as jnp
    import numpy as np

    import cutrace_tpu.ops.fused as F
    from cutrace_tpu.ops import bvh
    from cutrace_tpu.ops.bvh import candidates_fn
    from cutrace_tpu.render.renderer import camera_rays, render_rays
    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.soa import scene_to_soa

    monkeypatch.setattr(F, "_VMEM_TABLE_SLOTS", 64)
    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 20, 12
    soa = scene_to_soa(sc)
    accel = bvh.build_accel(soa, cluster_size=8, kind="fused")
    assert accel.order.shape[0] * accel.order.shape[1] > 64
    b = 2
    idx = jnp.arange(soa.width * soa.height, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % soa.width, idx // soa.width)

    c1, d1, n1 = F._fused_forward(soa, accel, o, d, 1e-3, b)
    c2, d2, n2 = render_rays(soa, o, d, b, jnp.float32(1e-3),
                             candidates_fn(accel))
    assert float(jnp.abs(c1 - c2).max()) < 1e-5
    both_inf = jnp.isinf(d1) & jnp.isinf(d2)
    assert float(jnp.abs(jnp.where(both_inf, 0.0, d1 - d2)).max()) < 1e-4

    # emit_topo + replay compose with the streamed tables
    c3, _, _, codes = F._fused_forward(soa, accel, o, d, 1e-3, b,
                                       emit_topo=True)
    from cutrace_tpu.ops.replay import replay_render_rays

    rc, _, _ = replay_render_rays(soa, o, d, codes, jnp.float32(1e-3), b)
    assert float(jnp.abs(c3 - c1).max()) == 0.0
    assert float(jnp.abs(rc - c3).max()) < 1e-5

    # in-kernel primary cull (prefetch words past the SMEM budget)
    monkeypatch.setattr(F, "_prefetch_primary_ok", lambda n_tiles, m: False)
    c4, _, _ = F._fused_forward(soa, accel, o, d, 1e-3, b)
    assert float(jnp.abs(c4 - c1).max()) == 0.0

    # double-buffered visit streaming (the round-5 default: DMA of each
    # visited block overlapped with the previous block's math) is the
    # same math in the same order, one visit behind — bit-identical to
    # the synchronous path
    monkeypatch.setattr(F, "_prefetch_primary_ok",
                        lambda n_tiles, m: True)
    monkeypatch.setenv("CUTRACE_HBM_DB", "0")
    jax.clear_caches()
    try:
        c5, d5, n5 = F._fused_forward(soa, accel, o, d, 1e-3, b)
    finally:
        monkeypatch.delenv("CUTRACE_HBM_DB")
        jax.clear_caches()
    assert float(jnp.abs(c5 - c1).max()) == 0.0
    both = jnp.isinf(d5) & jnp.isinf(d1)
    assert float(jnp.abs(jnp.where(both, 0.0, d5 - d1)).max()) == 0.0
    assert float(jnp.abs(n5 - n1).max()) == 0.0


def test_fused_supercluster_cull_parity(scenes_dir, monkeypatch):
    """The hierarchical secondary cull (exact per-WORD supercluster slab +
    interval per-cluster refine — the big-M regime, forced small here via
    CUTRACE_SUPER_MIN_M) must match the composable renderer exactly: both
    cull flavors are supersets of the exact visit set, so output is
    invariant. bounces=2 exercises nearest AND occlusion secondary casts
    through the supercluster path."""
    import jax as _jax

    from cutrace_tpu.render.renderer import PreparedScene

    monkeypatch.setenv("CUTRACE_SUPER_MIN_M", "8")
    # the env is read at kernel BUILD (trace) time: drop cached traces so
    # this test (and later ones) compile with their own env
    _jax.clear_caches()
    monkeypatch.setattr(
        "cutrace_tpu.ops.fused._EXACT_CULL_MAX_M", 16)
    monkeypatch.setattr(
        "cutrace_tpu.ops.fused._EXACT_GROUP_MAX_M", 16)
    try:
        soa = _load(scenes_dir, "bunny.json", 32, 18)
        accel = bvh.build_accel(soa, 8, kind="fused", interpret=True)
        m = accel.order.shape[0]
        assert m > 8, f"want the supercluster regime, got M={m}"
        base = render(prepare(soa, accel="none"), bounces=2)
        out = render(PreparedScene(soa=soa, accel=accel), bounces=2)
        # 32x18 is almost all discontinuity pixels; the forced-tiny
        # partition + 128-ray tiles flip a few more knife-edge ties than
        # the default config (same budget as the subdivided-mesh gate)
        _compare(base, out, atol=2e-4, edge_budget=0.10)
    finally:
        _jax.clear_caches()


def test_fused_group_ordering_multi_group_parity(scenes_dir, monkeypatch):
    """The near-to-far ORDERED group visits (round 4, OPT-IN via
    CUTRACE_GROUP_ORDER=1 — measured a net loss at the 256k flagship, see
    the negative-results log) must be output-invariant with >= 2 real
    groups — order changes only which per-ray prunes fire, never the
    (t, key) winner. Forced multi-group here via a tiny cluster size
    (mirror: 924 tris / C=4 -> M=231 -> G3=2 groups); bounces=2 exercises
    nearest AND occlusion secondary casts through the ordered loop, and
    the default static order must match bit-exactly."""
    import jax as _jax

    from cutrace_tpu.ops import fused
    from cutrace_tpu.render.renderer import PreparedScene

    monkeypatch.setattr(fused, "_EXACT_CULL_MAX_M", 16)
    soa = _load(scenes_dir, "mirror.json", 32, 18)
    accel = bvh.build_accel(soa, 4, kind="fused", interpret=True)
    m = accel.order.shape[0]
    assert -(-m // 128) >= 2, f"want >= 2 groups, got M={m}"
    base = render(prepare(soa, accel="none"), bounces=2)
    monkeypatch.setenv("CUTRACE_GROUP_ORDER", "1")
    _jax.clear_caches()
    try:
        out = render(PreparedScene(soa=soa, accel=accel), bounces=2)
        _compare(base, out, atol=2e-4)
    finally:
        monkeypatch.delenv("CUTRACE_GROUP_ORDER")
        _jax.clear_caches()

    # ordered vs the default static order: bit-identical
    out2 = render(PreparedScene(soa=soa, accel=accel), bounces=2)
    for a, b in zip(out, out2):
        a, b = np.asarray(a), np.asarray(b)
        same = (a == b) | (np.isinf(a) & np.isinf(b))
        assert same.all(), f"{(~same).sum()} pixels differ vs static order"
    _jax.clear_caches()


def test_fused_mxu_visits_parity(scenes_dir, monkeypatch):
    """The MXU-form visit math (CUTRACE_MXU_VISITS: the four per-slot cast
    quantities as (tile_r, 8) @ (8, C) matmuls against packed weight
    blocks — fused._mxu_weight_blocks) must reproduce the VPU elementwise
    form in every sublane-kernel regime: VMEM tables, the two-level
    group-exact cull, and the HBM-streamed tables (+ topo emission).
    The dot's accumulation order differs from the elementwise chain (and
    the compiled MXU passes differ again), so parity is the fused-vs-
    composable gate's own budget: last-ulp t reassociation can flip
    knife-edge winners ON discontinuities only — off-edge pixels must
    match to float tolerance exactly like _compare demands."""
    import jax as _jax

    from cutrace_tpu.ops import fused
    from cutrace_tpu.render.renderer import PreparedScene

    def frame(soa, accel, mxu, bounces=2):
        monkeypatch.setenv("CUTRACE_MXU_VISITS", "1" if mxu else "0")
        _jax.clear_caches()
        try:
            return render(PreparedScene(soa=soa, accel=accel),
                          bounces=bounces)
        finally:
            monkeypatch.delenv("CUTRACE_MXU_VISITS")

    def check(base, out, label):
        _compare(base, out, atol=2e-4, edge_budget=0.10)

    # (a) VMEM sublane regime (M=125 > lanes max, exact per-cluster cull)
    soa = _load(scenes_dir, "bunny.json", 24, 12)
    accel = bvh.build_accel(soa, 8, kind="fused", interpret=True)
    assert accel.order.shape[0] > fused._LANES_MAX_M
    check(frame(soa, accel, False), frame(soa, accel, True), "vmem")

    # (b) group-exact cull regime (the 256k production config's path)
    orig_exact_cap = fused._EXACT_CULL_MAX_M
    monkeypatch.setattr(fused, "_EXACT_CULL_MAX_M", 16)
    soa_g = _load(scenes_dir, "mirror.json", 32, 18)
    accel_g = bvh.build_accel(soa_g, 4, kind="fused", interpret=True)
    assert -(-accel_g.order.shape[0] // 128) >= 2
    check(frame(soa_g, accel_g, False), frame(soa_g, accel_g, True),
          "group")
    monkeypatch.setattr(fused, "_EXACT_CULL_MAX_M", orig_exact_cap)

    # (c) HBM-streamed tables + topo emission / replay compose
    monkeypatch.setattr(fused, "_VMEM_TABLE_SLOTS", 64)
    from cutrace_tpu.ops.replay import replay_render_rays
    from cutrace_tpu.render.renderer import camera_rays

    soa_h = _load(scenes_dir, "bunny.json", 20, 12)
    accel_h = bvh.build_accel(soa_h, 8, kind="fused", interpret=True)
    check(frame(soa_h, accel_h, False), frame(soa_h, accel_h, True),
          "hbm")
    monkeypatch.setenv("CUTRACE_MXU_VISITS", "1")
    _jax.clear_caches()
    try:
        idx = jnp.arange(soa_h.width * soa_h.height, dtype=jnp.int32)
        o, d = camera_rays(soa_h, idx % soa_h.width, idx // soa_h.width)
        c3, _, _, codes = fused._fused_forward(
            soa_h, accel_h, o, d, 1e-3, 2, emit_topo=True)
        rc, _, _ = replay_render_rays(soa_h, o, d, codes,
                                      jnp.float32(1e-3), 2)
        assert float(jnp.abs(rc - c3).max()) < 1e-5
    finally:
        monkeypatch.delenv("CUTRACE_MXU_VISITS")
        _jax.clear_caches()
