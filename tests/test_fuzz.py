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
@pytest.mark.slow
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


@pytest.mark.parametrize("seed", [11, 12, 13])
@pytest.mark.slow
def test_random_scene_replay_grads_match_composable(seed):
    """jax.grad through the fused render (topology-replay backward where
    replay_supported) matches the composable pipeline's gradients on
    random scenes — all primitive kinds, two-branch trees, degenerate
    geometry included."""
    import jax
    import jax.numpy as jnp

    from cutrace_tpu.diff.grad import extract_params, with_params
    from cutrace_tpu.ops.bvh import candidates_fn
    from cutrace_tpu.ops.fused import fused_render_rays, replay_supported
    from cutrace_tpu.render.renderer import camera_rays, prepare, render_rays
    from cutrace_tpu.scene.soa import scene_to_soa

    rng = np.random.default_rng(seed)
    scene = random_scene(rng)
    scene.camera.width, scene.camera.height = 20, 12
    bounces = 2
    prepared = prepare(scene_to_soa(scene), accel="fused")
    soa, accel = prepared.soa, prepared.accel
    assert replay_supported(soa, accel, bounces), seed
    w = soa.width
    idx = jnp.arange(w * soa.height, dtype=jnp.int32)
    params = extract_params(soa)

    o, d = camera_rays(soa, idx % w, idx // w)
    tgt, _, _ = render_rays(soa, o, d, bounces, jnp.float32(1e-3),
                            candidates_fn(accel))
    tgt = jax.lax.stop_gradient(tgt) * 0.8

    # Knife-edge discipline: at tied/edge pixels the kernel and the
    # composable scan may pick DIFFERENT winners (the forward parity
    # tests budget for this), and fixed-topology gradients then differ
    # legitimately. Compare gradients only over pixels whose forward
    # values agree (same winners almost surely).
    cf0, _, _ = fused_render_rays(soa, accel, o, d, 1e-3, bounces)
    stable = jnp.all(jnp.abs(cf0 - tgt / 0.8) < 1e-5, axis=-1)
    stable = jax.lax.stop_gradient(stable)[:, None]
    assert float(stable.mean()) > 0.8, f"seed{seed}: too few stable pixels"

    def loss_fused(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        c, _, _ = fused_render_rays(s, accel, o2, d2, 1e-3, bounces)
        return jnp.mean(jnp.where(stable, (c - tgt) ** 2, 0.0))

    def loss_comp(p):
        s = with_params(soa, p)
        o2, d2 = camera_rays(s, idx % w, idx // w)
        c, _, _ = render_rays(s, o2, d2, bounces, jnp.float32(1e-3),
                              candidates_fn(accel))
        return jnp.mean(jnp.where(stable, (c - tgt) ** 2, 0.0))

    gf = jax.grad(loss_fused)(params)
    gc = jax.grad(loss_comp)(params)
    for k in gf:
        a, b = np.asarray(gf[k]), np.asarray(gc[k])
        assert np.isfinite(a).all(), f"seed{seed}/{k} non-finite"
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, f"seed{seed}/{k}: rel err {err:.3e}"
