"""Topology-replay backward (ops/replay.py + ops/fused.py emit_topo).

Gates:
  * the code-driven replay reproduces the fused kernel's forward values
    (same math at the same winners — fp association aside), and
  * jax.grad through fused_render_rays (whose custom_vjp backward is the
    replay when replay_supported) matches the composable pipeline's
    gradients — the same fixed-topology semantics, never silently zero
    (the round-1 failure mode), and
  * out-of-scope configs (deep two-branch trees) still differentiate via
    the composable fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutrace_tpu.diff.grad import extract_params, with_params
from cutrace_tpu.ops.bvh import candidates_fn
from cutrace_tpu.ops.fused import (_fused_forward, fused_render_rays,
                                   replay_supported)
from cutrace_tpu.ops.replay import replay_render_rays, replay_rows
from cutrace_tpu.render.renderer import camera_rays, prepare, render_rays
from cutrace_tpu.scene.loader import load_scene


def _setup(scenes_dir, name, w=24, h=12):
    sc = load_scene(scenes_dir / f"{name}.json")
    sc.camera.width, sc.camera.height = w, h
    prepared = prepare(sc, accel="fused")
    soa = prepared.soa
    idx = jnp.arange(w * h, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % w, idx // w)
    return soa, prepared.accel, o, d, idx


@pytest.mark.parametrize("name,bounces", [
    ("triangle", 1),      # 1 sun, misses dominate
    ("bunny", 2),         # opaque chain: occlusion-flag shadows
    ("mirror", 2),        # chain with dying nodes (reflect-0 materials)
    ("sphere_plane", 2),  # two-branch tree + transparent march replay
])
def test_replay_matches_kernel_forward(scenes_dir, name, bounces):
    soa, accel, o, d, _ = _setup(scenes_dir, name)
    assert replay_supported(soa, accel, bounces)
    c, dep, nrm, codes = _fused_forward(soa, accel, o, d, 1e-3, bounces,
                                        emit_topo=True)
    rc, rdep, rnrm = replay_render_rays(soa, o, d, codes,
                                        jnp.float32(1e-3), bounces)
    assert float(jnp.abs(rc - c).max()) < 1e-5
    both_inf = jnp.isinf(rdep) & jnp.isinf(dep)
    assert float(jnp.abs(jnp.where(both_inf, 0.0, rdep - dep)).max()) < 1e-4
    assert float(jnp.abs(rnrm - nrm).max()) < 1e-5


@pytest.mark.parametrize("name,bounces", [
    ("bunny", 2),
    ("mirror", 2),
    ("sphere_plane", 2),
])
@pytest.mark.slow
def test_replay_backward_matches_composable(scenes_dir, name, bounces):
    """jax.grad through the fused render (replay backward) == jax.grad of
    the composable pipeline, for every differentiable parameter group."""
    soa, accel, o, d, idx = _setup(scenes_dir, name)
    assert replay_supported(soa, accel, bounces)
    params = extract_params(soa)
    w = soa.width

    tgt, _, _ = _fused_forward(soa, accel, o, d, 1e-3, bounces)
    tgt = jax.lax.stop_gradient(tgt) * 0.9

    def loss_fused(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        c, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, bounces)
        return jnp.mean((c - tgt) ** 2)

    def loss_comp(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        c, _, _ = render_rays(s, o2, d2, bounces, jnp.float32(1e-3),
                              candidates_fn(accel))
        return jnp.mean((c - tgt) ** 2)

    gf = jax.grad(loss_fused)(params)
    gc = jax.grad(loss_comp)(params)
    for k in gf:
        a, b = np.asarray(gf[k]), np.asarray(gc[k])
        assert np.isfinite(a).all(), k
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 2e-4, f"{name}/{k}: rel err {err:.3e}"


@pytest.mark.slow
def test_replay_fallback_out_of_scope(scenes_dir, monkeypatch):
    """sphere_plane at bounces=5 needs 441 topo rows: within the row cap
    at training ray counts, but past the code-buffer HBM budget at 1080p.
    With the budget forced to zero, replay is statically declined and the
    composable backward still produces finite, nonzero gradients."""
    import cutrace_tpu.ops.replay as rp

    soa, accel, o, d, idx = _setup(scenes_dir, "sphere_plane", w=16, h=8)
    assert replay_rows(soa, 5) == 441
    assert replay_supported(soa, accel, 5, n_rays=16 * 8)
    # round 4: the 4 GB code budget covers 1080p b5 (3.66 GB, measured
    # 13.3 s/step on chip); 4x the rays overflows it
    assert replay_supported(soa, accel, 5, n_rays=1920 * 1080)
    assert not replay_supported(soa, accel, 5, n_rays=4 * 1920 * 1080)

    monkeypatch.setattr(rp, "REPLAY_MAX_CODE_BYTES", 1)
    assert not replay_supported(soa, accel, 2, n_rays=16 * 8)
    params = extract_params(soa)
    w = soa.width

    def loss(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        c, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, 2)
        return jnp.mean(c ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    assert float(jnp.abs(g["sp_center"]).sum()) > 0.0


@pytest.mark.slow
def test_replay_depth_normal_cotangents(scenes_dir):
    """Gradients through the depth and normal outputs (primary cast) flow
    through the replay backward too."""
    soa, accel, o, d, idx = _setup(scenes_dir, "bunny")
    params = extract_params(soa)
    w = soa.width

    def loss(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        _, dep, nrm = fused_render_rays(s, accel, o2, d2, 1e-3, 1)
        fin = jnp.isfinite(dep)
        return (jnp.sum(jnp.where(fin, dep, 0.0))
                + jnp.sum(nrm ** 2))

    def loss_comp(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        _, dep, nrm = render_rays(s, o2, d2, 1, jnp.float32(1e-3),
                                  candidates_fn(accel))
        fin = jnp.isfinite(dep)
        return (jnp.sum(jnp.where(fin, dep, 0.0))
                + jnp.sum(nrm ** 2))

    gf = jax.grad(loss)(params)
    gc = jax.grad(loss_comp)(params)
    for k in ("tri_p1", "cam_eye", "pl_point"):
        a, b = np.asarray(gf[k]), np.asarray(gc[k])
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 2e-4, k


@pytest.mark.slow
def test_replay_sublane_kernel(scenes_dir):
    """Big-scene (sublane-kernel) topology emission: packed occlusion-flag
    columns unpack to the standard replay layout, and gradients match the
    composable pipeline. Forced by a tiny cluster size (m > _LANES_MAX_M)
    on an opaque scene."""
    from cutrace_tpu.ops import bvh
    from cutrace_tpu.ops.fused import _LANES_MAX_M
    from cutrace_tpu.ops.replay import replay_render_rays
    from cutrace_tpu.scene.soa import scene_to_soa

    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 20, 12
    soa = scene_to_soa(sc)
    accel = bvh.build_accel(soa, cluster_size=8, kind="fused")
    assert accel.order.shape[0] > _LANES_MAX_M
    assert replay_supported(soa, accel, 2)
    b = 2
    idx = jnp.arange(soa.width * soa.height, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % soa.width, idx // soa.width)

    c, dep, nrm, codes = _fused_forward(soa, accel, o, d, 1e-3, b,
                                        emit_topo=True)
    rc, _, _ = replay_render_rays(soa, o, d, codes, jnp.float32(1e-3), b)
    assert float(jnp.abs(rc - c).max()) < 1e-5

    params = extract_params(soa)
    tgt = jax.lax.stop_gradient(c) * 0.9
    w = soa.width

    def loss_f(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        cf, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, b)
        return jnp.mean((cf - tgt) ** 2)

    def loss_c(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        cf, _, _ = render_rays(s, o2, d2, b, jnp.float32(1e-3),
                               candidates_fn(accel))
        return jnp.mean((cf - tgt) ** 2)

    gf = jax.grad(loss_f)(params)
    gc = jax.grad(loss_c)(params)
    for k in gf:
        a, bb = np.asarray(gf[k]), np.asarray(gc[k])
        scale = max(np.abs(bb).max(), 1e-6)
        assert np.abs(a - bb).max() / scale < 2e-4, k


@pytest.mark.slow
def test_replay_sublane_transparent(scenes_dir):
    """Transparent scenes on the sublane kernel emit per-step march
    occluder CODES via statically-unrolled light/march loops (one out
    column per replay topo row — fused.py topo_static): forward replay
    must reproduce the kernel and jax.grad must match the composable
    pipeline, including the differentiable march transparency chain
    (shading.hpp:22-45). Beyond the static-unroll budget it falls back."""
    from cutrace_tpu.ops import bvh
    from cutrace_tpu.ops.fused import _LANES_MAX_M
    from cutrace_tpu.ops.replay import replay_render_rays
    from cutrace_tpu.scene.soa import scene_to_soa

    sc = load_scene(scenes_dir / "sphere_plane.json")
    sc.camera.width, sc.camera.height = 16, 8
    soa = scene_to_soa(sc)
    # no triangles: order shape (1, C); fake a big partition via
    # min_clusters to force the sublane kernel
    accel = bvh.build_accel(soa, cluster_size=8, kind="fused",
                            min_clusters=64)
    assert accel.order.shape[0] > _LANES_MAX_M
    b = 2  # 7 nodes x (1 + 2 lights x 3 steps) = 49 cast bodies: in budget
    assert replay_supported(soa, accel, b)
    # 63 nodes x 7 = 441 cast bodies: over _SUBLANE_TOPO_MAX_CASTS
    assert not replay_supported(soa, accel, 5)

    idx = jnp.arange(soa.width * soa.height, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % soa.width, idx // soa.width)
    c, dep, nrm, codes = _fused_forward(soa, accel, o, d, 1e-3, b,
                                        emit_topo=True)
    rc, _, _ = replay_render_rays(soa, o, d, codes, jnp.float32(1e-3), b)
    assert float(jnp.abs(rc - c).max()) < 1e-5

    params = extract_params(soa)
    tgt = jax.lax.stop_gradient(c) * 0.9
    w = soa.width

    def loss_f(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        cf, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, b)
        return jnp.mean((cf - tgt) ** 2)

    def loss_c(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        cf, _, _ = render_rays(s, o2, d2, b, jnp.float32(1e-3),
                               candidates_fn(accel))
        return jnp.mean((cf - tgt) ** 2)

    gf = jax.grad(loss_f)(params)
    gc = jax.grad(loss_c)(params)
    for k in gf:
        a, bb = np.asarray(gf[k]), np.asarray(gc[k])
        scale = max(np.abs(bb).max(), 1e-6)
        assert np.abs(a - bb).max() / scale < 2e-4, k


@pytest.mark.slow
def test_replay_hbm_streamed_kernel(scenes_dir, monkeypatch):
    """Topology emission + replay backward through the HBM-streamed
    sublane kernel (the round-3 default past the VMEM table budget —
    production path for 1M-triangle scenes). Forced here by shrinking the
    threshold; gradients must match the composable pipeline."""
    import cutrace_tpu.ops.fused as F
    from cutrace_tpu.ops import bvh
    from cutrace_tpu.ops.replay import replay_render_rays
    from cutrace_tpu.scene.soa import scene_to_soa

    monkeypatch.setattr(F, "_VMEM_TABLE_SLOTS", 64)
    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 16, 8
    soa = scene_to_soa(sc)
    accel = bvh.build_accel(soa, cluster_size=8, kind="fused")
    assert accel.order.shape[0] * accel.order.shape[1] > 64
    b = 2
    assert replay_supported(soa, accel, b)
    idx = jnp.arange(soa.width * soa.height, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % soa.width, idx // soa.width)
    c, dep, nrm, codes = _fused_forward(soa, accel, o, d, 1e-3, b,
                                        emit_topo=True)
    rc, _, _ = replay_render_rays(soa, o, d, codes, jnp.float32(1e-3), b)
    assert float(jnp.abs(rc - c).max()) < 1e-5

    params = extract_params(soa)
    tgt = jax.lax.stop_gradient(c) * 0.9

    def loss_f(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % soa.width, idx // soa.width)
        cf, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, b)
        return jnp.mean((cf - tgt) ** 2)

    def loss_c(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % soa.width, idx // soa.width)
        cf, _, _ = render_rays(s, o2, d2, b, jnp.float32(1e-3),
                               candidates_fn(accel))
        return jnp.mean((cf - tgt) ** 2)

    gf = jax.grad(loss_f)(params)
    gc = jax.grad(loss_c)(params)
    for k in ("tri_p1", "mat_color", "light_color"):
        a, bb = np.asarray(gf[k]), np.asarray(gc[k])
        scale = max(np.abs(bb).max(), 1e-6)
        assert np.abs(a - bb).max() / scale < 2e-4, k


def test_replay_chunked_backward(scenes_dir, monkeypatch):
    """The lax.map-chunked XLA replay vjp (the big-ray-count path for
    configs outside the Pallas replay-VJP kernel's scope — the packed row
    gather's transpose needs bounded transients) must produce the same
    gradients as the unchunked replay, including the ragged-tail padding.
    CUTRACE_REPLAY_VJP=0 pins the XLA replay branch (the kernel would
    otherwise intercept bunny and never chunk)."""
    import jax as _jax

    soa, accel, o, d, idx = _setup(scenes_dir, "bunny")  # 288 rays
    params = extract_params(soa)
    w = soa.width

    def loss(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        c, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, 2)
        return jnp.mean(c ** 2)

    monkeypatch.setenv("CUTRACE_REPLAY_VJP", "0")
    _jax.clear_caches()
    try:
        g1 = jax.grad(loss)(params)
        # chunk=64 -> k=5 chunks of 58 rays + 2 padding rays
        monkeypatch.setenv("CUTRACE_REPLAY_CHUNK", "64")
        _jax.clear_caches()
        g2 = jax.grad(loss)(params)
        for k in g1:
            # per-chunk accumulation reorders the fp sums: ~1e-5 rel
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g2[k]),
                rtol=1e-4, atol=1e-7, err_msg=k)
    finally:
        _jax.clear_caches()


def test_composable_chunked_backward(scenes_dir, monkeypatch):
    """The lax.map-chunked COMPOSABLE backward (the out-of-replay-scope
    fallback; unchunked it OOM'd at compile for sphere_plane 1080p b5 —
    f32[66M,3] wavefront transients, round 4) must produce the same
    gradients as the unchunked composable, including ragged-tail padding.
    Forced out of replay scope via a zero code-buffer budget."""
    import jax as _jax

    import cutrace_tpu.ops.replay as rp

    soa, accel, o, d, idx = _setup(scenes_dir, "sphere_plane")  # 288 rays
    monkeypatch.setattr(rp, "REPLAY_MAX_CODE_BYTES", 1)
    assert not replay_supported(soa, accel, 2, n_rays=288)
    params = extract_params(soa)
    w = soa.width

    def loss(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        c, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, 2)
        return jnp.mean(c ** 2)

    g1 = jax.grad(loss)(params)  # 288 <= default chunk: unchunked
    monkeypatch.setenv("CUTRACE_COMPOSABLE_BWD_CHUNK", "64")
    _jax.clear_caches()
    try:
        g2 = jax.grad(loss)(params)
        for k in g1:
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g2[k]),
                rtol=1e-4, atol=1e-7, err_msg=k)
    finally:
        _jax.clear_caches()
