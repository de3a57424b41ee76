"""Acceleration structures: cluster build, flattened oracle, Pallas kernel
(interpreter mode on CPU) — all must be hit-for-hit identical to the
brute-force scene-order cast."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutrace_tpu.ops import bvh, intersect as I
from cutrace_tpu.ops.pallas_cast import pallas_tri_candidates
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


def test_flattened_clusters_identical(bunny):
    soa, o, d, ref = bunny
    clusters = bvh.build_clusters(soa, 64)
    out = I.ray_cast(
        soa, o, d, jnp.float32(1e-3), bvh.flattened_cluster_candidates(clusters)
    )
    assert_hits_equal(ref, out)


@pytest.mark.parametrize("cluster_size", [64, 128])
def test_pallas_kernel_identical(bunny, cluster_size):
    """The culling kernel (interpret mode on CPU) must agree with brute
    force; t is re-derived outside the kernel so allow 1-ulp-ish jitter."""
    soa, o, d, ref = bunny
    clusters = bvh.build_clusters(soa, cluster_size)
    out = I.ray_cast(
        soa, o, d, jnp.float32(1e-3),
        pallas_tri_candidates(clusters, interpret=True),
    )
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
