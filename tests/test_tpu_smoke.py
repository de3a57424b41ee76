"""On-chip smoke suite: the Mosaic-compiled kernels vs the same oracles
the CPU suite uses (VERDICT round-2 item 5).

The 118-test CPU suite runs every Pallas kernel in interpret mode, which
provably misses Mosaic-only failure classes — round 2's "scf.for with
vector carries fails to legalize" bug compiled fine interpreted and died
only on hardware (docs/performance.md). This marker subset re-runs the
core parity gates with the kernels actually compiled by Mosaic on the
real chip:

    CUTRACE_TEST_TPU=1 python -m pytest -m tpu_smoke -q

The round driver's artifact is TPU_SMOKE_r{N}.json (run by the builder
each round next to BENCH). On the CPU harness these tests self-skip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu_smoke,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="needs the real chip (CUTRACE_TEST_TPU=1)",
    ),
]

from cutrace_tpu.diff.grad import extract_params, with_params
from cutrace_tpu.ops.bvh import candidates_fn
from cutrace_tpu.ops.fused import fused_render_rays, replay_supported
from cutrace_tpu.render.renderer import (camera_rays, prepare, render,
                                         render_rays)
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa


def _load(scenes_dir, name, w, h):
    sc = load_scene(scenes_dir / name)
    sc.camera.width, sc.camera.height = w, h
    return scene_to_soa(sc)


@pytest.mark.parametrize(
    "scene,bounces,edge_budget",
    [
        ("triangle.json", 5, 0.05),      # no branches
        ("bunny.json", 5, 0.05),         # opaque chain: occlusion shadows
        # mirror: reflect-0.999 chains amplify any winner flip — this
        # exact case caught the round-2 bf16-matmul primary-t-bound bug
        # (wrong winners on TPU only; see _primary_t_bound's dots())
        ("mirror.json", 3, 0.05),
        ("sphere_plane.json", 3, 0.05),  # reflective AND transparent:
                                         # 15-node two-branch tree +
                                         # in-kernel march (the round-2
                                         # vector-carry Mosaic bug shape)
    ],
)
def test_fused_parity_on_chip(scenes_dir, scene, bounces, edge_budget):
    """Mosaic-compiled fused kernel vs the composable path on the chip —
    the same gate as tests/test_fused.py, minus interpret mode."""
    from test_fused import _compare

    soa = _load(scenes_dir, scene, 96, 54)
    base = render(prepare(soa, accel="none"), bounces=bounces)
    out = render(prepare(soa, accel="fused"), bounces=bounces)
    jax.block_until_ready(out)
    _compare(base, out, atol=2e-4, edge_budget=edge_budget)


def test_replay_grad_parity_on_chip(scenes_dir):
    """jax.grad through the fused render (topology-replay backward,
    Mosaic-compiled emit_topo kernel) == composable gradients on chip."""
    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 64, 36
    prepared = prepare(sc, accel="fused")
    soa, accel = prepared.soa, prepared.accel
    bounces = 2
    assert replay_supported(soa, accel, bounces, n_rays=64 * 36)
    idx = jnp.arange(64 * 36, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % 64, idx // 64)
    params = extract_params(soa)

    tgt, _, _ = fused_render_rays(soa, accel, o, d, 1e-3, bounces)
    tgt = jax.lax.stop_gradient(tgt) * 0.9

    def loss_fused(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % 64, idx // 64)
        c, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, bounces)
        return jnp.mean((c - tgt) ** 2)

    def loss_comp(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % 64, idx // 64)
        c, _, _ = render_rays(s, o2, d2, bounces, jnp.float32(1e-3),
                              candidates_fn(accel))
        return jnp.mean((c - tgt) ** 2)

    gf = jax.jit(jax.grad(loss_fused))(params)
    gc = jax.jit(jax.grad(loss_comp))(params)
    for k in gf:
        a, b = np.asarray(gf[k]), np.asarray(gc[k])
        assert np.isfinite(a).all(), k
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, f"{k}: rel err {err:.3e}"


def test_sharded_render_on_chip(scenes_dir):
    """render_sharded over the (single-chip) device mesh is bit-identical
    to the plain render — the multi-chip code path itself compiled and run
    by the real runtime, not the virtual-device harness."""
    from cutrace_tpu.parallel.sharding import make_mesh, render_sharded

    soa = _load(scenes_dir, "sphere_plane.json", 64, 32)
    mesh = make_mesh(len(jax.devices()), 1)
    base = render(soa, bounces=2)
    out = render_sharded(soa, mesh, bounces=2)
    for a, b in zip(base, out):
        a, b = np.asarray(a), np.asarray(b)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all()


def test_group_regime_parity_on_chip(scenes_dir):
    """The big-M sublane path (two-level group-exact cull, interleaved
    per-word refresh — ops/fused.py group regime, M > _EXACT_CULL_MAX_M)
    Mosaic-compiled on the chip vs the composable oracle. A 256k-triangle
    midpoint-subdivided bunny leaves the rendered surface unchanged, and
    the refresh must be output-invariant: also assert refresh ==
    norefresh bit-identically (CUTRACE_ABLATE is read at kernel build, so
    caches are cleared around the flip)."""
    import os

    from test_fused import _compare
    from cutrace_tpu.scene.mesh_io import subdivide

    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 96, 54
    base = render(prepare(scene_to_soa(sc), accel="none"), bounces=2)
    for ob in sc.objects:
        if type(ob).__name__ == "Mesh":
            ob.vertices = subdivide(ob.vertices, 4)  # 256k tris
    prepared = prepare(sc, accel="fused")
    m = prepared.accel.order.shape[0]
    from cutrace_tpu.ops import fused as _f
    assert m > _f._EXACT_CULL_MAX_M, f"want the group regime, got M={m}"
    out = render(prepared, bounces=2)
    jax.block_until_ready(out)
    _compare(base, out, atol=2e-4, edge_budget=0.10)

    old = os.environ.get("CUTRACE_ABLATE")
    os.environ["CUTRACE_ABLATE"] = "norefresh"
    jax.clear_caches()
    try:
        ref = render(prepared, bounces=2)
        for a, b in zip(out, ref):
            a, b = np.asarray(a), np.asarray(b)
            same = (a == b) | (np.isnan(a) & np.isnan(b))
            assert same.all(), "refresh changed winners"
    finally:
        if old is None:
            os.environ.pop("CUTRACE_ABLATE", None)
        else:
            os.environ["CUTRACE_ABLATE"] = old
        jax.clear_caches()


def test_pallas_vjp_grad_parity_on_chip(scenes_dir):
    """The Mosaic-compiled Pallas replay-VJP kernel (ops/replay_vjp.py,
    the round-4 backward) == the XLA replay backward on chip. Interpret
    mode provably misses Mosaic-only failures (module docstring) and this
    kernel is new this round — the one-hot MXU contractions, SMEM scalar
    reads, and VMEM accumulation all compile differently on hardware."""
    import os

    from cutrace_tpu.ops.replay_vjp import replay_vjp_supported

    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 64, 36
    prepared = prepare(sc, accel="fused")
    soa, accel = prepared.soa, prepared.accel
    bounces = 3
    assert replay_vjp_supported(soa, bounces)
    idx = jnp.arange(64 * 36, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % 64, idx // 64)
    params = extract_params(soa)
    tgt, _, _ = fused_render_rays(soa, accel, o, d, 1e-3, bounces)
    tgt = jax.lax.stop_gradient(tgt) * 0.9

    def loss(p, marker):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % 64, idx // 64)
        c, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, bounces)
        return jnp.mean((c - tgt) ** 2) + 0.0 * marker

    g_kernel = jax.jit(jax.grad(lambda p: loss(p, 1.0)))(params)
    os.environ["CUTRACE_REPLAY_VJP"] = "0"
    jax.clear_caches()
    try:
        g_xla = jax.jit(jax.grad(lambda p: loss(p, 2.0)))(params)
    finally:
        os.environ.pop("CUTRACE_REPLAY_VJP", None)
        jax.clear_caches()
    for k in g_kernel:
        a, b = np.asarray(g_kernel[k]), np.asarray(g_xla[k])
        assert np.isfinite(a).all(), k
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, f"{k}: rel err {err:.3e}"


def test_hbm_streamed_db_parity_on_chip(scenes_dir):
    """The HBM-streamed sublane kernel with DOUBLE-BUFFERED visit DMA
    (round 5: per-visit block copies overlapped with the previous visit's
    math, 24-row packed stream) Mosaic-compiled on chip: semaphore-array
    indexing, dynamic-sublane slot reads and the DMA/math overlap are
    exactly the op classes interpret mode cannot exercise. Gates: (a)
    composable-oracle parity, (b) db == synchronous copy bit-identically.
    The HBM regime is forced by shrinking the VMEM table budget (the same
    knife the CPU test uses) so the compile stays smoke-sized."""
    import os

    from test_fused import _compare
    from cutrace_tpu.ops import fused as _f

    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 64, 36
    soa = scene_to_soa(sc)
    base = render(prepare(soa, accel="none"), bounces=2)

    old_slots = _f._VMEM_TABLE_SLOTS
    _f._VMEM_TABLE_SLOTS = 64
    old = os.environ.get("CUTRACE_HBM_DB")
    try:
        prepared = prepare(soa, accel="fused")
        assert (prepared.accel.order.shape[0]
                * prepared.accel.order.shape[1] > 64)
        out = render(prepared, bounces=2)
        jax.block_until_ready(out)
        _compare(base, out, atol=2e-4, edge_budget=0.10)

        os.environ["CUTRACE_HBM_DB"] = "0"
        jax.clear_caches()
        sync = render(prepared, bounces=2)
        for a, b in zip(out, sync):
            a, b = np.asarray(a), np.asarray(b)
            same = (a == b) | (np.isinf(a) & np.isinf(b))
            assert same.all(), "double-buffered != synchronous copy"
    finally:
        _f._VMEM_TABLE_SLOTS = old_slots
        if old is None:
            os.environ.pop("CUTRACE_HBM_DB", None)
        else:
            os.environ["CUTRACE_HBM_DB"] = old
        jax.clear_caches()


def test_pallas_vjp_transparent_deep_on_chip(scenes_dir):
    """The flagship transparent config's Pallas replay-VJP — sphere_plane
    at bounces 5 (63-node two-branch tree, 441 topo rows, static-unrolled
    march replay) — Mosaic-compiled on chip vs the XLA replay backward.
    This exact config runs as the CPU interpret gate only at bounces 4:
    interpret-mode execution of the 63-node unroll measured > 80 min
    (round 5), while the compiled kernel runs it in milliseconds — depth
    coverage belongs on the chip."""
    import os

    from cutrace_tpu.ops.replay_vjp import replay_vjp_supported

    sc = load_scene(scenes_dir / "sphere_plane.json")
    sc.camera.width, sc.camera.height = 64, 36
    prepared = prepare(sc, accel="fused")
    soa, accel = prepared.soa, prepared.accel
    bounces = 5
    assert soa.any_transparent
    assert replay_vjp_supported(soa, bounces)
    idx = jnp.arange(64 * 36, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % 64, idx // 64)
    params = extract_params(soa)
    tgt, _, _ = fused_render_rays(soa, accel, o, d, 1e-3, bounces)
    tgt = jax.lax.stop_gradient(tgt) * 0.9

    def loss(p, marker):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % 64, idx // 64)
        c, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, bounces)
        return jnp.mean((c - tgt) ** 2) + 0.0 * marker

    g_kernel = jax.jit(jax.grad(lambda p: loss(p, 1.0)))(params)
    os.environ["CUTRACE_REPLAY_VJP"] = "0"
    jax.clear_caches()
    try:
        g_xla = jax.jit(jax.grad(lambda p: loss(p, 2.0)))(params)
    finally:
        os.environ.pop("CUTRACE_REPLAY_VJP", None)
        jax.clear_caches()
    for k in g_kernel:
        a, b = np.asarray(g_kernel[k]), np.asarray(g_xla[k])
        assert np.isfinite(a).all(), k
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, f"{k}: rel err {err:.3e}"
