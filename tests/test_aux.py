"""Auxiliary subsystems: timing/metrics, checkpoint/resume."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from cutrace_tpu.render.renderer import prepare
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa
from cutrace_tpu.utils import RenderTimings, timed_render
from cutrace_tpu.utils.profiling import casts_per_pixel


def test_timed_render(scenes_dir):
    sc = load_scene(scenes_dir / "triangle.json")
    (color, depth, normal), t = timed_render(prepare(sc), bounces=2)
    assert color.shape == (20, 20, 3)
    assert t.render_ms > 0 and t.total_ms >= t.render_ms
    assert t.width == 20 and t.casts_per_pixel == 2  # 1 node, 1 light, 1 step
    assert "Render time was" in str(t)


def test_casts_per_pixel(scenes_dir):
    # bunny: reflective only -> chain of bounces+1 nodes; 4 lights, 1 step
    soa = scene_to_soa(load_scene(scenes_dir / "bunny.json"))
    assert casts_per_pixel(soa, 5) == 6 * (1 + 4 * 1)
    # sphere_plane: both branches -> full binary tree; 2 lights, 3 steps
    soa = scene_to_soa(load_scene(scenes_dir / "sphere_plane.json"))
    assert soa.shadow_steps == 3  # ceil(1/(1-0.6))
    assert casts_per_pixel(soa, 2) == 7 * (1 + 2 * 3)


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from cutrace_tpu.diff import checkpoint as ckpt

    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.float32(2.5)}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    ckpt.save_checkpoint(str(tmp_path / "ck"), params, state, 7)
    assert ckpt.latest_step(str(tmp_path / "ck")) == 7
    restored = ckpt.restore_checkpoint(str(tmp_path / "ck"), params, state)
    assert restored is not None
    rp, rs, step = restored
    assert step == 7
    np.testing.assert_array_equal(np.asarray(rp["a"]), np.asarray(params["a"]))
    # opt state round-trips structurally
    for a, b in zip(jax.tree.leaves(rs), jax.tree.leaves(state)):
        assert np.asarray(a).shape == np.asarray(b).shape


import jax  # noqa: E402  (used above in tree comparison)


def test_fit_resume(scenes_dir, tmp_path):
    """fit() with a checkpoint dir resumes instead of restarting."""
    from cutrace_tpu.diff.grad import render_image_flat
    from cutrace_tpu.parallel import make_mesh
    from cutrace_tpu.parallel.train import fit

    sc = load_scene(scenes_dir / "triangle.json")
    sc.camera.width, sc.camera.height = 12, 12
    soa = scene_to_soa(sc)
    target, _, _ = render_image_flat(soa, 1, 1e-3)
    corrupt = dataclasses.replace(soa, mat_color=jnp.full_like(soa.mat_color, 0.5))
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    kw = dict(steps=6, lr=5e-2, bounces=1, param_filter=("mat_color",),
              checkpoint_dir=str(tmp_path / "fitck"), checkpoint_every=3)
    _, losses1 = fit(corrupt, target, mesh, **kw)
    assert len(losses1) == 6
    # resume: all 6 steps already done -> no more steps executed
    _, losses2 = fit(corrupt, target, mesh, **kw)
    assert len(losses2) == 0


def test_shadow_march_cap_deviation(scenes_dir):
    """The shadow-march step cap's documented deviation (scene/soa.py
    warning): for transparency >= 1 - 1/steps the capped march may
    under-accumulate shadow opacity vs the reference's unbounded march
    (shading.hpp:22-45). Gate: the warning fires, and the deviation is
    EXACTLY the analytic shortfall (steps_capped vs steps_exact occluder
    contributions), never more.

    Geometry: camera at origin looking +z at a tilted ground plane; 6
    transparent (t=0.9) spheres stacked along the shadow ray to a point
    light. Each sphere's entry AND exit surface counts as one occluder
    step (the reference's march advances past the last hit by 1e-3 and
    re-finds the same sphere's far root) -> 12 available occluder hits of
    opacity 0.1 each; the exact march saturates sh=1.0 after 10 steps."""
    import warnings

    import pytest

    from cutrace_tpu.render.renderer import render
    from cutrace_tpu.scene import types as T

    def build():
        sc = T.Scene(
            objects=[T.Plane([0, 0, 5], [0, 1, -1], 0)]
            + [T.Sphere([0, 1 + 0.5 * k, 5], 0.2, 1) for k in range(6)],
            lights=[T.PointLight([0, 5, 5], [1, 1, 1])],
            materials=[
                T.SolidMaterial([1, 1, 1], specular=0.0),
                T.SolidMaterial([1, 1, 1], transparency=0.9),
            ],
            camera=T.Camera(width=2, height=2),
        )
        return sc.reindex()

    # capped: 4 steps < exact 10 -> warning + under-accumulation
    with pytest.warns(UserWarning, match="capped at 4"):
        soa4 = scene_to_soa(build(), shadow_steps=4)
    # exact: 12 steps >= 10 needed -> no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        soa12 = scene_to_soa(build(), shadow_steps=12)
    assert soa4.shadow_steps == 4 and soa12.shadow_steps == 10

    c4 = np.asarray(render(soa4, bounces=1)[0])[1, 1]
    c12 = np.asarray(render(soa12, bounces=1)[0])[1, 1]

    ambient = 0.1
    fd = 1.0 / np.sqrt(2.0)  # dot(unit plane normal, shadow dir)
    # exact march saturates: sh = 1.0 -> ambient only
    np.testing.assert_allclose(c12, ambient, atol=1e-3)
    # capped march: sh = 4 * (1 - 0.9) = 0.4 -> brighter by (1-sh) * fd
    np.testing.assert_allclose(c4, ambient + 0.6 * fd, atol=1e-3)
    # the deviation is one-sided (capped can only under-shadow) and
    # bounded by 1 - steps*(1-t_max) worth of light
    assert (c4 - c12 >= -1e-6).all()
    assert (c4 - c12 <= 1.0 - 4 * (1.0 - 0.9) + 1e-6).all()
