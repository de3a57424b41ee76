"""Randomized parity fuzzing: device renderer vs the float64 golden on
procedurally generated scenes covering the full feature matrix (all
primitive kinds, reflective + transparent materials, sun + point lights).

Seeds are fixed — failures are reproducible. The comparison gate is the
same knife-edge-tolerant one as test_device_renderer: any off-discontinuity
mismatch is a hard failure.
"""

import numpy as np
import pytest

from cutrace_tpu.render import cpuref
from cutrace_tpu.render.renderer import render
from cutrace_tpu.scene import types as T
from tests.test_device_renderer import assert_image_close


def random_scene(rng: np.random.Generator, n_objects: int = 8) -> T.Scene:
    scene = T.Scene()
    n_mats = int(rng.integers(2, 5))
    for _ in range(n_mats):
        scene.materials.append(
            T.SolidMaterial(
                color=rng.random(3),
                specular=float(rng.random()),
                reflect=float(rng.choice([0.0, 0.3, 0.9])),
                phong=float(rng.choice([4.0, 32.0, 200.0])),
                transparency=float(rng.choice([0.0, 0.0, 0.5])),
            )
        )
    for _ in range(n_objects):
        kind = rng.integers(0, 3)
        mat = int(rng.integers(0, n_mats))
        if kind == 0:
            pts = rng.normal(0, 1.2, (3, 3))
            scene.objects.append(T.Triangle(pts[0], pts[1], pts[2], mat))
        elif kind == 1:
            scene.objects.append(
                T.Sphere(rng.normal(0, 1.5, 3), 0.2 + rng.random(), mat)
            )
        else:
            n = rng.normal(0, 1, 3)
            n /= np.linalg.norm(n)
            scene.objects.append(
                T.Plane(rng.normal(0, 2.0, 3) - [0, 3, 0], n, mat)
            )
    scene.lights.append(T.Sun(rng.normal(0, 1, 3), rng.random(3)))
    if rng.random() < 0.7:
        scene.lights.append(
            T.PointLight(rng.normal(0, 4, 3) + [0, 5, 0], rng.random(3))
        )
    scene.camera = T.Camera(
        eye=(0, 0.5, -6), look=(0, 0, 0), width=40, height=24, ambient=0.05
    )
    scene.reindex()
    return scene


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_scene_parity(seed):
    rng = np.random.default_rng(seed)
    scene = random_scene(rng)
    bounces = 2
    c_ref, d_ref, n_ref = cpuref.render_cpu(scene, bounces=bounces)
    c, d, n = render(scene, bounces=bounces)
    # Random scenes have more knife edges than authored ones: give edges
    # more budget, and allow <=1% off-edge pixels for fp knife-edges that
    # live purely in the bounce dimension (see assert_image_close).
    kw = dict(edge_budget=0.12, off_edge_budget=0.01)
    assert_image_close(c, c_ref, f"seed{seed}/color", **kw)
    assert_image_close(d, d_ref, f"seed{seed}/depth", **kw)
    assert_image_close(n, n_ref, f"seed{seed}/normal", **kw)


@pytest.mark.parametrize("seed", [5, 6])
def test_random_scene_grads_finite(seed):
    """Random scenes (incl. degenerate-ish geometry) must never produce
    non-finite parameter gradients."""
    import jax.numpy as jnp

    from cutrace_tpu.diff import grad_render_loss
    from cutrace_tpu.scene.soa import scene_to_soa

    rng = np.random.default_rng(seed)
    scene = random_scene(rng)
    soa = scene_to_soa(scene)
    target = jnp.zeros((soa.width * soa.height, 3), jnp.float32)
    loss, grads = grad_render_loss(soa, target, bounces=2)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), f"seed {seed}: {k}"


@pytest.mark.parametrize("seed", [7, 8])
def test_random_scene_fused_matches_composable(seed):
    """The fused whole-pipeline kernel (interpret) must agree with the
    composable renderer on random scenes — mixed primitive kinds,
    reflective + transparent materials (two-branch trees), sun + point
    lights, in one kernel."""
    from cutrace_tpu.render.renderer import prepare
    from cutrace_tpu.scene.soa import scene_to_soa

    rng = np.random.default_rng(seed)
    scene = random_scene(rng)
    bounces = 2
    soa = scene_to_soa(scene)
    base = render(prepare(soa, accel="none"), bounces=bounces)
    out = render(prepare(soa, accel="fused"), bounces=bounces)
    kw = dict(edge_budget=0.12, off_edge_budget=0.01)
    for a, b, name in zip(base, out, ("color", "depth", "normal")):
        assert_image_close(b, np.asarray(a), f"seed{seed}/fused/{name}",
                           **kw)
