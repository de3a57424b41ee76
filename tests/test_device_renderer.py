"""Device (JAX) renderer vs the scalar CPU golden renderer.

Gate: pixel values allclose(atol=1e-3) everywhere EXCEPT on image
discontinuities (object silhouettes, shadow boundaries), where the f32
device path and the f64 golden path may legitimately resolve a knife-edge
hit/occlusion decision differently — the CUDA reference itself, being f32,
flips the same pixels relative to the f64 golden. Off-discontinuity
mismatches are hard failures; on-discontinuity mismatches are budgeted.

This encodes BASELINE.md's "allclose <= 1e-3 vs reference" correctness
metric in a form that is robust to fp decision boundaries.
"""

import numpy as np
import pytest

from cutrace_tpu.render import cpuref
from cutrace_tpu.render.renderer import render
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa


def discontinuity_mask(ref_img: np.ndarray, thr: float = 1e-3, dilate: int = 1):
    """Pixels adjacent to a local jump in the reference image."""
    v = ref_img if ref_img.ndim == 2 else np.linalg.norm(ref_img, axis=-1)
    v = np.nan_to_num(v, posinf=1e9, neginf=-1e9)
    g = np.zeros(v.shape, bool)
    dx = np.abs(np.diff(v, axis=1)) > thr
    dy = np.abs(np.diff(v, axis=0)) > thr
    g[:, 1:] |= dx
    g[:, :-1] |= dx
    g[1:, :] |= dy
    g[:-1, :] |= dy
    for _ in range(dilate):
        g2 = g.copy()
        g2[1:, :] |= g[:-1, :]
        g2[:-1, :] |= g[1:, :]
        g2[:, 1:] |= g[:, :-1]
        g2[:, :-1] |= g[:, 1:]
        g = g2
    return g


def assert_image_close(
    dev, ref, name, atol=1e-3, edge_budget=0.05, off_edge_budget=0.0
):
    """`off_edge_budget` > 0 admits a small fraction of mismatches away
    from image discontinuities — needed only for randomized scenes, where
    fp knife-edges can live purely in the *bounce* dimension (e.g. a
    transparency child grazing a near-parallel plane at huge t) and leave
    no local signature in the reference image. Authored-scene tests keep
    the strict zero budget."""
    dev, ref = np.asarray(dev), np.asarray(ref)
    if dev.ndim == 2:
        ok = np.isclose(dev, ref, atol=atol) | (np.isinf(dev) & np.isinf(ref))
        bad = ~ok
    else:
        bad = ~(
            np.isclose(dev, ref, atol=atol) | (np.isinf(dev) & np.isinf(ref))
        ).all(axis=-1)
    edges = discontinuity_mask(ref)
    off_edge = bad & ~edges
    assert off_edge.sum() <= off_edge_budget * bad.size, (
        f"{name}: {off_edge.sum()} mismatches off discontinuities at "
        f"{np.argwhere(off_edge)[:5].tolist()}"
    )
    frac = bad.sum() / bad.size
    assert frac <= edge_budget, (
        f"{name}: {bad.sum()}/{bad.size} edge mismatches ({frac:.1%}) "
        f"exceeds budget {edge_budget:.1%}"
    )


def compare_scene(scene, bounces):
    c_ref, d_ref, n_ref = cpuref.render_cpu(scene, bounces=bounces)
    c, d, n = render(scene, bounces=bounces)
    assert_image_close(c, c_ref, "color")
    assert_image_close(d, d_ref, "depth")
    assert_image_close(n, n_ref, "normal")


def test_triangle_full_res(scenes_dir):
    """triangle.json at its native 20x20, full bounce depth 5 (main.cu:30)."""
    compare_scene(load_scene(scenes_dir / "triangle.json"), bounces=5)


def test_sphere_plane_small(scenes_dir):
    """Transparency 0.6 + shadows + sun & point lights; the bounce tree
    spawns both children (sphere_plane.json has reflect and transparency)."""
    sc = load_scene(scenes_dir / "sphere_plane.json")
    sc.camera.width, sc.camera.height = 64, 36
    compare_scene(sc, bounces=2)


def test_mirror_small(scenes_dir):
    """Mesh triangles (924 tris) + reflect-0.999 mirrors."""
    sc = load_scene(scenes_dir / "mirror.json")
    sc.camera.width, sc.camera.height = 32, 18
    compare_scene(sc, bounces=2)


def test_bunny_primary_rays(scenes_dir):
    """bunny.json (1000-triangle mesh + planes): primary cast only at a tiny
    resolution — validates the flattened-mesh triangle path against the
    golden at mesh scale without a long scalar render."""
    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 32, 18
    compare_scene(sc, bounces=0)


def test_miss_semantics(scenes_dir):
    """Miss pixels: depth=+inf, normal=0, color=0 (kernel.hpp:47-59 with
    ray_cast defaults)."""
    sc = load_scene(scenes_dir / "triangle.json")
    c, d, n = [np.asarray(x) for x in render(sc, bounces=1)]
    miss = ~np.isfinite(d)
    assert miss.any()
    assert (n[miss] == 0).all()
    assert (c[miss] == 0).all()


@pytest.mark.slow
def test_wavefront_matches_recursive(scenes_dir):
    """The production wavefront bounce evaluation must agree with the
    direct transcription of the reference recursion (identical semantics,
    only fp summation order differs — see shading.ray_color)."""
    import jax
    import jax.numpy as jnp

    from cutrace_tpu.render import shading as sh
    from cutrace_tpu.render.renderer import camera_rays

    for name, b in (("sphere_plane.json", 3), ("mirror.json", 2)):
        sc = load_scene(scenes_dir / name)
        sc.camera.width, sc.camera.height = 32, 18
        soa = scene_to_soa(sc)
        idx = jnp.arange(32 * 18, dtype=jnp.int32)
        o, d = camera_rays(soa, idx % 32, idx // 32)
        wave = sh.ray_color(soa, o, d, jnp.float32(1e-3), b)
        rec = sh.ray_color_recursive(soa, o, d, jnp.float32(1e-3), b)
        np.testing.assert_allclose(
            np.asarray(wave), np.asarray(rec), atol=1e-5, err_msg=name
        )


def test_chunked_equals_unchunked(scenes_dir):
    """Chunking is an execution detail — same results up to backend
    rounding wobble. (The CPU backend's matmul packing depends on the
    batch shape, so a pixel's intersection values can differ by 1 ulp
    between chunk sizes, flipping knife-edge silhouette pixels; off
    discontinuities the images must still agree.)"""
    sc = load_scene(scenes_dir / "triangle.json")
    a = render(sc, bounces=1)
    b = render(sc, bounces=1, chunk=64)
    for x, y, name in zip(a, b, ("color", "depth", "normal")):
        assert_image_close(x, y, f"chunk/{name}", atol=1e-5)


def test_degenerate_sun_matches_reference_semantics():
    """A sun with direction (0,0,0): the reference normalizes the zero
    vector to NaN, fmaxf(0, NaN) drops the diffuse/specular terms to 0,
    and the pixel shades ambient-only (shading.hpp:80-88,
    default_schema.hpp:280-283). Device path and cpuref must both
    reproduce that — finite, ambient-only output, no NaN leakage."""
    from cutrace_tpu.scene.loader import load_from

    spec = {
        "camera": {"eye": [0, 0, -3], "look": [0, 0, 0],
                   "width": 8, "height": 8},
        "materials": [{"type": "solid", "color": [0.8, 0.2, 0.2]}],
        "lights": [{"type": "sun", "direction": [0, 0, 0]}],
        "objects": [{"type": "triangle", "p1": [-1, -1, 0],
                     "p2": [1, -1, 0], "p3": [0, 1, 0], "material": 0}],
    }
    res = load_from(spec)
    assert res.ok
    sc = res.scene
    c, d, n = [np.asarray(x) for x in render(scene_to_soa(sc), bounces=2)]
    cr, _, _ = cpuref.render_cpu(sc, bounces=2)
    assert np.isfinite(c).all()
    np.testing.assert_allclose(c, np.asarray(cr), atol=1e-5)
    # hit pixels are exactly ambient * diffuse
    hit = np.isfinite(d)
    assert hit.any()
    np.testing.assert_allclose(
        c[hit], np.broadcast_to([0.08, 0.02, 0.02], c[hit].shape),
        atol=1e-5,
    )
