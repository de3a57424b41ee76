"""Acceleration structures: partition build, dense cluster oracle, Pallas
culling kernel (interpreter mode on CPU) — all must be hit-for-hit identical
to the brute-force scene-order cast — plus the round-2 guarantees: vertex
gradients flow through the accelerated path, and a PreparedScene never
renders stale geometry after a parameter update."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutrace_tpu.ops import bvh, intersect as I
from cutrace_tpu.render.renderer import camera_rays, prepare, render
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa


@pytest.fixture(scope="module")
def bunny(request):
    sc = load_scene(request.config.rootpath / "scenes" / "bunny.json")
    sc.camera.width, sc.camera.height = 96, 54
    soa = scene_to_soa(sc)
    idx = jnp.arange(96 * 54, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % 96, idx // 96)
    ref = I.ray_cast(soa, o, d, jnp.float32(1e-3))
    return soa, o, d, ref


def assert_hits_equal(ref, out, atol=0.0):
    for f in dataclasses.fields(ref):
        a = np.asarray(getattr(ref, f.name))
        b = np.asarray(getattr(out, f.name))
        if a.dtype.kind == "f":
            ok = (
                (a == b)
                | (np.isinf(a) & np.isinf(b))
                | (np.isnan(a) & np.isnan(b))
                | (np.abs(a - b) <= atol)
            )
        else:
            ok = a == b
        assert ok.all(), f"{f.name}: {np.argwhere(~ok)[:3]}"


def test_cluster_build_covers_all_triangles(bunny):
    soa, *_ = bunny
    clusters = bvh.build_clusters(soa, 64)
    order = np.asarray(clusters.order)[np.asarray(clusters.valid)]
    assert sorted(order.tolist()) == list(range(soa.tri_p1.shape[0]))
    # AABBs contain their triangles
    for arr in (clusters.p1, clusters.p2, clusters.p3):
        a = np.asarray(arr)
        v = np.asarray(clusters.valid)
        assert (a[v] >= np.asarray(clusters.bmin)[:, None, :].repeat(64, 1)[v] - 1e-4).all()
        assert (a[v] <= np.asarray(clusters.bmax)[:, None, :].repeat(64, 1)[v] + 1e-4).all()


def test_cluster_oracle_identical(bunny):
    """The dense masked cast over the live-gathered clustered buffers is
    hit-for-hit the brute-force scene-order cast."""
    soa, o, d, ref = bunny
    accel = bvh.build_accel(soa, 64, kind="clusters")
    out = I.ray_cast(soa, o, d, jnp.float32(1e-3), bvh.candidates_fn(accel))
    assert_hits_equal(ref, out)


@pytest.mark.parametrize("cluster_size", [64, 128])
def test_pallas_kernel_identical(bunny, cluster_size):
    """The culling kernel (interpret mode on CPU) must agree with brute
    force; t is re-derived outside the kernel so allow 1-ulp-ish jitter."""
    soa, o, d, ref = bunny
    accel = bvh.build_accel(soa, cluster_size, kind="pallas", interpret=True)
    out = I.ray_cast(soa, o, d, jnp.float32(1e-3), bvh.candidates_fn(accel))
    assert (np.asarray(ref.obj) == np.asarray(out.obj)).all()
    a, b = np.asarray(ref.t), np.asarray(out.t)
    assert ((np.abs(a - b) < 1e-4) | (np.isinf(a) & np.isinf(b))).all()


def test_prepared_render_matches_brute(scenes_dir):
    """render(PreparedScene) through each accel path matches brute force."""
    sc = load_scene(scenes_dir / "mirror.json")
    sc.camera.width, sc.camera.height = 32, 18
    soa = scene_to_soa(sc)
    base = render(prepare(soa, accel="none"), bounces=2)
    for accel in ("clusters", "pallas"):
        out = render(prepare(soa, accel=accel), bounces=2)
        for a, b, name in zip(base, out, ("color", "depth", "normal")):
            a, b = np.asarray(a), np.asarray(b)
            ok = np.isclose(a, b, atol=1e-4) | (np.isinf(a) & np.isinf(b))
            assert ok.all(), f"{accel}/{name}"


def test_shadow_rays_through_pallas(scenes_dir):
    """Shadow marches pass per-ray min_dist arrays through the kernel."""
    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 48, 27
    soa = scene_to_soa(sc)
    base = render(prepare(soa, accel="none"), bounces=1)
    out = render(prepare(soa, accel="pallas"), bounces=1)
    a, b = np.asarray(base[0]), np.asarray(out[0])
    assert np.isclose(a, b, atol=1e-3).mean() > 0.999


@pytest.fixture(scope="module")
def mirror_small(request):
    sc = load_scene(request.config.rootpath / "scenes" / "mirror.json")
    sc.camera.width, sc.camera.height = 16, 9
    return scene_to_soa(sc)


@pytest.mark.parametrize("kind", ["clusters", "pallas"])
@pytest.mark.slow
def test_vertex_gradients_through_accel(mirror_small, kind):
    """Round-1 regression (VERDICT.md item 3): with acceleration on,
    d loss/d tri_p1 must match the brute-force gradient — the winner's
    geometry is gathered from the live soa arrays, not a baked table.
    Brute force on mirror.json 16x9 gives |grad|_1 ~ 162, so an
    accidentally-disconnected path (grad == 0) fails loudly."""
    from cutrace_tpu.diff.grad import grad_render_loss

    soa = mirror_small
    target = jnp.zeros((soa.height * soa.width, 3), jnp.float32)
    _, g_ref = grad_render_loss(soa, target, bounces=2)
    accel = bvh.build_accel(soa, 64, kind=kind, interpret=True)
    _, g_acc = grad_render_loss(soa, target, bounces=2, accel=accel)
    for field in ("tri_p1", "tri_p2", "tri_p3", "mat_color", "light_color"):
        a = np.asarray(g_ref[field])
        b = np.asarray(g_acc[field])
        assert np.abs(a).sum() > 1e-3, f"brute {field} grad is zero?!"
        assert np.allclose(a, b, rtol=1e-3, atol=1e-5), (
            f"{field}: brute |g|={np.abs(a).sum():.3f} vs "
            f"accel |g|={np.abs(b).sum():.3f}"
        )


@pytest.mark.parametrize("kind", ["clusters", "pallas"])
def test_prepared_scene_never_stale(scenes_dir, kind):
    """Round-1 regression (VERDICT.md item 3): updating vertex positions on
    a PreparedScene's soa must change the accelerated render — the Accel
    partition holds indices only, geometry is read live."""
    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 32, 18
    soa = scene_to_soa(sc)
    prepared = prepare(soa, accel=kind)
    before = np.asarray(render(prepared, bounces=1)[0])

    shift = jnp.asarray([0.0, 1.5, 0.0], jnp.float32)
    moved = dataclasses.replace(
        soa,
        tri_p1=soa.tri_p1 + shift,
        tri_p2=soa.tri_p2 + shift,
        tri_p3=soa.tri_p3 + shift,
    )
    # same Accel (stale partition), updated geometry
    out = np.asarray(
        render(dataclasses.replace(prepared, soa=moved), bounces=1)[0]
    )
    ref = np.asarray(render(moved, bounces=1)[0])
    assert not np.allclose(before, out), "accelerated render is stale"
    assert np.isclose(out, ref, atol=1e-3).mean() > 0.999


@pytest.mark.slow
def test_pallas_kernel_streamed_chunks(bunny, monkeypatch):
    """Partitions beyond M_CHUNK clusters stream chunk-by-chunk through
    the kernel (lax.map) and combine by (t, order) — winner-for-winner
    identical to the one-sweep path (the big-scene fallback: scenes
    bounded by HBM, not VMEM)."""
    from cutrace_tpu.ops import pallas_cast

    monkeypatch.setattr(pallas_cast, "M_CHUNK", 4)
    # _run_cast is jitted: identical shapes would otherwise hit the cache
    # entry traced with the resident (one-sweep) path
    pallas_cast._run_cast.clear_cache()
    soa, o, d, ref = bunny
    accel = bvh.build_accel(soa, 64, kind="pallas", interpret=True)
    assert accel.order.shape[0] > 4  # actually exercises >1 chunk
    out = I.ray_cast(soa, o, d, jnp.float32(1e-3), bvh.candidates_fn(accel))
    assert (np.asarray(ref.obj) == np.asarray(out.obj)).all()
    a, b = np.asarray(ref.t), np.asarray(out.t)
    assert ((np.abs(a - b) < 1e-4) | (np.isinf(a) & np.isinf(b))).all()

    # vertex gradients flow through the streamed path identically (the
    # kernel only picks winners; geometry is re-gathered from live soa)
    from cutrace_tpu.diff.grad import grad_render_loss

    target = jnp.zeros((soa.height * soa.width, 3), jnp.float32)
    _, g_ref = grad_render_loss(soa, target, bounces=1)
    _, g_acc = grad_render_loss(soa, target, bounces=1, accel=accel)
    a = np.asarray(g_ref["tri_p1"])
    b = np.asarray(g_acc["tri_p1"])
    assert np.abs(a).sum() > 1e-4
    assert np.allclose(a, b, rtol=1e-3, atol=1e-5)
    pallas_cast._run_cast.clear_cache()  # drop the chunked-path traces
