"""Gradient correctness: finite-difference checks + NaN-freedom.

BASELINE.md gradient gate: pixel gradients match finite differences w.r.t.
vertices, materials, and light intensities (fixed topology). All math is
f32, so central differences with a moderate step and loose-ish rtol are the
right comparison; pixels are chosen away from visibility boundaries (the
discrete side of rendering has zero gradient by design, see diff/grad.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutrace_tpu.diff import (
    extract_params,
    grad_render_loss,
    render_loss,
)
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa


def fd_check(soa, target, field, index, bounces, eps, rtol, atol=1e-6):
    """Central finite difference on params[field][index] vs autodiff."""
    params = extract_params(soa)
    loss_fn = jax.jit(
        render_loss, static_argnames=("bounces",)
    )

    def loss_at(v):
        p = dict(params)
        p[field] = p[field].at[index].set(v)
        return float(loss_fn(p, soa, target, bounces))

    v0 = float(params[field][index])
    h = eps * max(1.0, abs(v0))
    fd = (loss_at(v0 + h) - loss_at(v0 - h)) / (2 * h)

    _, grads = grad_render_loss(soa, target, bounces)
    ad = float(grads[field][index])
    assert np.isfinite(ad), f"{field}[{index}]: autodiff grad not finite"
    assert np.isclose(ad, fd, rtol=rtol, atol=atol), (
        f"{field}[{index}]: autodiff {ad:.6g} vs fd {fd:.6g}"
    )


def _target_for(soa, bounces):
    """A fixed non-trivial target so the loss has nonzero gradient."""
    from cutrace_tpu.diff.grad import render_image_flat

    color, _, _ = render_image_flat(soa, bounces, 1e-3)
    return 0.5 * color + 0.1


@pytest.fixture(scope="module")
def tri_soa(request):
    sc = load_scene(request.config.rootpath / "scenes" / "triangle.json")
    sc.camera.width, sc.camera.height = 12, 12
    return scene_to_soa(sc)


@pytest.fixture(scope="module")
def sp_soa(request):
    sc = load_scene(request.config.rootpath / "scenes" / "sphere_plane.json")
    sc.camera.width, sc.camera.height = 16, 9
    return scene_to_soa(sc)


def test_material_color_grad(tri_soa):
    fd_check(tri_soa, _target_for(tri_soa, 1), "mat_color", (0, 1), 1, 2e-2, 5e-2)


def test_light_color_grad(tri_soa):
    fd_check(tri_soa, _target_for(tri_soa, 1), "light_color", (0, 0), 1, 2e-2, 5e-2)


def test_vertex_grad(tri_soa):
    """Gradient w.r.t. a triangle vertex coordinate (moves shading normals
    and hit distances; topology masked)."""
    fd_check(tri_soa, _target_for(tri_soa, 1), "tri_p1", (0, 0), 1, 2e-2, 1e-1)


@pytest.mark.slow
def test_sphere_grads(sp_soa):
    t = _target_for(sp_soa, 1)
    fd_check(sp_soa, t, "sp_center", (0, 1), 1, 2e-2, 1e-1)
    fd_check(sp_soa, t, "sp_radius", (0,), 1, 2e-2, 1e-1)


def test_ambient_and_specular_grads(sp_soa):
    t = _target_for(sp_soa, 1)
    fd_check(sp_soa, t, "ambient", (), 1, 2e-2, 5e-2)
    fd_check(sp_soa, t, "mat_specular", (2,), 1, 2e-2, 1e-1)


def test_phong_exponent_grad_finite(sp_soa):
    """Regression: d(base**exp)/d(exp) at base==0 is 0^exp*log(0) = NaN for
    any backfacing light unless the pow is double-where guarded
    (render/shading.py). The exponent gradient must be finite."""
    _, grads = grad_render_loss(sp_soa, _target_for(sp_soa, 1), 1)
    assert np.isfinite(np.asarray(grads["mat_phong"])).all()


@pytest.mark.slow
def test_tangent_sphere_grad_finite(sp_soa):
    """Regression: bounce rays originating on a sphere surface produce
    discriminant == 0 lanes; sqrt'(0) = inf poisoned the backward pass
    until exact-tangent hits were excluded (ops/intersect.py cast_spheres).
    Perturbed geometry + bounces=2 reproduces the original blowup."""
    from cutrace_tpu.diff.grad import render_image_flat

    target, _, _ = render_image_flat(sp_soa, 2, 1e-3)
    params = extract_params(sp_soa)
    params["pl_normal"] = params["pl_normal"] + jnp.asarray(
        [[-0.05, 0.0078, 0.05]], jnp.float32
    )
    loss, grads = jax.value_and_grad(render_loss)(params, sp_soa, target, 2)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad in {k}"


@pytest.mark.parametrize("scene_name", ["mirror.json", "bunny_small.json"])
@pytest.mark.slow
def test_fd_baseline_scenes(scenes_dir, scene_name):
    """BASELINE.md names mirror.json and bunny_small.json as the
    finite-difference gate workloads: central differences vs autodiff for
    a vertex coordinate, a material color channel, and a light intensity
    channel on each (fixed topology, f32)."""
    sc = load_scene(scenes_dir / scene_name)
    sc.camera.width, sc.camera.height = 24, 14
    soa = scene_to_soa(sc)
    target = _target_for(soa, 1)
    checks = [
        ("tri_p1", (0, 1)),
        ("mat_color", (0, 0)),  # bunny_small has exactly one material
        ("light_color", (0, 2)),
    ]
    for field, index in checks:
        fd_check(soa, target, field, index, bounces=1, eps=2e-3,
                 rtol=5e-2, atol=5e-6)


@pytest.mark.parametrize("scene_name,bounces", [
    ("triangle.json", 2),
    ("sphere_plane.json", 2),
    ("mirror.json", 2),
])
def test_grads_finite_everywhere(scenes_dir, scene_name, bounces):
    """No NaN/Inf in ANY parameter gradient, on scenes covering meshes,
    mirrors (reflect 0.999), transparency, z-parallel plane normals."""
    sc = load_scene(scenes_dir / scene_name)
    sc.camera.width, sc.camera.height = 16, 9
    soa = scene_to_soa(sc)
    target = jnp.zeros((16 * 9, 3), jnp.float32)
    loss, grads = grad_render_loss(soa, target, bounces)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad in {k}"
        # at least some parameters should actually receive gradient
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in grads.values())
    assert total > 0.0
