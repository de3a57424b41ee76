"""Hand-checked golden values for the scalar CPU reference renderer.

triangle.json geometry worked out by hand:
  camera: eye (0,0,-5), look (0,0,0) -> forward (0,0,1), right = fwd x up =
  (-1,0,0) (image x mirrors world x), true up (0,1,0). 20x20, ambient 0.01.
  The triangle spans z=0; the center ray (pixel 10,10) hits (0,0,0) at t=5.
  Reference normal convention gives (0,0,1) (pointing *away* from camera —
  the un-flipped normal quirk). The sun shines along (1,1,1), so the
  direction to the light has negative z -> n.l < 0 and n.h < 0 -> only the
  ambient term survives: color = 0.01 * (0.7, 0.2, 0.7).
"""

import math

import numpy as np
import pytest

from cutrace_tpu.render import cpuref
from cutrace_tpu.scene.loader import load_scene


def test_triangle_center_pixel(scenes_dir):
    scene = load_scene(str(scenes_dir / "triangle.json"))
    colors, depths, normals = cpuref.render_pixels(scene, [(10, 10), (0, 0)])

    # center ray hits the triangle plane at t = 5
    assert depths[0] == pytest.approx(5.0, abs=1e-9)
    np.testing.assert_allclose(normals[0], [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(colors[0], [0.007, 0.002, 0.007], atol=1e-9)

    # corner ray exits past the triangle: no hit
    assert math.isinf(depths[1])
    np.testing.assert_allclose(normals[1], [0, 0, 0])
    np.testing.assert_allclose(colors[1], [0, 0, 0])


def test_triangle_full_image(scenes_dir):
    scene = load_scene(str(scenes_dir / "triangle.json"))
    color, depth, normal = cpuref.render_cpu(scene)
    assert color.shape == (20, 20, 3) and depth.shape == (20, 20)
    hit = np.isfinite(depth)
    # the triangle covers a plausible fraction of the 20x20 image
    assert 20 < hit.sum() < 120
    # every hit pixel has the ambient-only color and the constant normal
    np.testing.assert_allclose(color[hit], np.broadcast_to([0.007, 0.002, 0.007], color[hit].shape), atol=1e-9)
    np.testing.assert_allclose(normal[hit], np.broadcast_to([0.0, 0.0, 1.0], normal[hit].shape), atol=1e-12)
    np.testing.assert_allclose(color[~hit], 0.0)
    # all hits land on the z=0 plane from eye z=-5: t = 5 / dir_z >= 5
    assert depth[hit].min() == pytest.approx(5.0, abs=1e-6)
    assert depth[hit].max() < 5.2


def test_camera_basis_mirrors_x(scenes_dir):
    scene = load_scene(str(scenes_dir / "triangle.json"))
    forward, right, up = scene.camera.basis()
    np.testing.assert_allclose(forward, [0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(right, [-1, 0, 0], atol=1e-7)
    np.testing.assert_allclose(up, [0, 1, 0], atol=1e-7)


def test_sphere_plane_pixels(scenes_dir):
    """Structural checks on a scene with shadows, reflection, transparency."""
    scene = load_scene(str(scenes_dir / "sphere_plane.json"))
    # eye (0,1,-5) looking at (0,1,0): the center ray hits the opaque
    # sphere centered at (0,1,0) with r=0.5 dead-on at t = 5 - 0.5 = 4.5
    # (the transparent r=1.1 sphere at the origin is behind it on this ray).
    w, h = scene.camera.width, scene.camera.height
    colors, depths, normals = cpuref.render_pixels(
        scene, [(w // 2, h // 2), (w // 2, h - 1)]
    )
    assert depths[0] == pytest.approx(4.5, abs=1e-6)
    np.testing.assert_allclose(normals[0], [0, 0, -1], atol=1e-6)
    # bottom center: looking down -> the floor plane at y=-0.5
    assert np.isfinite(depths[1])
    np.testing.assert_allclose(normals[1], [0, 1, 0], atol=1e-9)
    # colors are lit above pure ambient and below clip
    assert colors[0].max() > 0.01 and colors[0].max() < 3.0


def test_mesh_intersect_uses_hit_xy_for_uv():
    """Mesh tex coords are overwritten with (hit.x, hit.y)
    (default_schema.hpp:138-139)."""
    tris = [((-1.0, -1.0, 0.0), (1.0, -1.0, 0.0), (0.0, 1.0, 0.0))]
    r = cpuref.intersect_mesh(
        tris, (-1, -1, 0), (1, 1, 0), (0.25, 0.1, -3.0), (0.0, 0.0, 1.0), 1e-3
    )
    assert r is not None
    t, hit, normal, uv = r
    assert uv == pytest.approx((0.25, 0.1))


def test_shadow_intensity_transparent_occluders(scenes_dir):
    """A transparent occluder contributes (1 - transparency)
    (shading.hpp:32-42)."""
    from cutrace_tpu.scene import types as T

    scene = T.Scene(
        objects=[
            T.Sphere([0, 0, 2], 0.5, 0),  # transparent 0.6
            T.Sphere([0, 0, 4], 0.5, 1),  # opaque
        ],
        materials=[
            T.SolidMaterial([1, 1, 1], transparency=0.6),
            T.SolidMaterial([1, 1, 1]),
        ],
    ).reindex()
    prims = cpuref._prep(scene)
    # march straight through both spheres
    inten = cpuref.shadow_intensity(
        prims, scene.materials, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0), cpuref.INF
    )
    # first sphere contributes 0.4 twice (enter+exit), then opaque caps at 1
    assert inten == pytest.approx(1.0)
    inten2 = cpuref.shadow_intensity(
        prims, scene.materials, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0), 3.0
    )
    assert inten2 == pytest.approx(0.8)  # only the transparent sphere, 2 hits
