"""Gradients of the renderer w.r.t. scene parameters.

The discrete decisions in the pipeline (which primitive is hit, shadow
occluder sets, bounce spawn masks) go through integer argmins and boolean
masks — JAX gives them zero gradient automatically, which is exactly the
fixed-topology differentiation BASELINE.md asks for ("gradients w.r.t.
continuous params at fixed topology"): gradients flow through the surface
math (intersection t, normals, shading) but not through visibility changes.

`extract_params`/`with_params` split the SceneArrays pytree into its
continuous, differentiable leaves and everything else, so jax.grad can be
taken w.r.t. a plain dict of arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from cutrace_tpu.render.renderer import render_rays, camera_rays
from cutrace_tpu.scene.soa import SceneArrays

# Continuous scene parameters. Integer index buffers, validity masks and
# static metadata stay fixed (changing them is a topology change).
DIFFERENTIABLE_FIELDS = (
    "tri_p1",
    "tri_p2",
    "tri_p3",
    "pl_point",
    "pl_normal",
    "sp_center",
    "sp_radius",
    "mat_color",
    "mat_specular",
    "mat_reflect",
    "mat_phong",
    "mat_transparency",
    "light_vec",
    "light_color",
    "cam_eye",
    "cam_forward",
    "cam_right",
    "cam_up",
    "ambient",
)


def extract_params(
    soa: SceneArrays, camera: str = "raw"
) -> Dict[str, jax.Array]:
    """The differentiable leaves of a scene, as a flat dict.

    camera="raw" keeps the authored basis vectors as independent
    parameters (parity with the schema; fine for everything except
    optimizing the camera itself). camera="look_at" replaces
    cam_forward/right/up with the orthonormal-by-construction look-at
    parameterization (diff/camera.py) — use this when the camera is being
    optimized (VERDICT r3: raw basis steps skew the projection)."""
    params = {f: getattr(soa, f) for f in DIFFERENTIABLE_FIELDS}
    if camera == "look_at":
        from cutrace_tpu.diff.camera import camera_to_look_at

        for f in ("cam_forward", "cam_right", "cam_up"):
            del params[f]
        params.update(camera_to_look_at(soa))
    elif camera != "raw":
        raise ValueError(f"camera must be 'raw' or 'look_at': {camera!r}")
    return params


def with_params(soa: SceneArrays, params: Dict[str, jax.Array]) -> SceneArrays:
    """A scene with its differentiable leaves replaced. Accepts either
    camera parameterization (raw basis fields, or the look-at dict keys
    from extract_params(camera="look_at"))."""
    cam_keys = ("cam_eye", "cam_target", "cam_up_hint", "cam_scales")
    if any(k in params for k in cam_keys[1:]):
        from cutrace_tpu.diff.camera import apply_look_at

        missing = [k for k in cam_keys if k not in params]
        if missing:
            raise ValueError(
                "look-at camera params are all-or-nothing: got "
                f"{sorted(k for k in cam_keys if k in params)}, missing "
                f"{missing} (use extract_params(camera='look_at'))"
            )
        soa = apply_look_at(soa, {k: params[k] for k in cam_keys})
        params = {k: v for k, v in params.items() if k not in cam_keys}
    return dataclasses.replace(soa, **params)


def render_image_flat(soa: SceneArrays, bounces: int, fudge, accel=None):
    """Render all pixels in one batch (no chunking) — used by loss/grad
    paths where XLA should see a single differentiable program. `accel`
    (an ops.bvh.Accel) accelerates the triangle query; it is differentiable
    and stale-proof by construction (geometry gathered live, ops/bvh.py)."""
    from cutrace_tpu.ops.bvh import candidates_fn

    n = soa.width * soa.height
    idx = jnp.arange(n, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % soa.width, idx // soa.width)
    color, depth, normal = render_rays(
        soa, o, d, bounces, fudge, candidates_fn(accel)
    )
    return color, depth, normal


def render_loss(
    params: Dict[str, jax.Array],
    soa: SceneArrays,
    target: jax.Array,
    bounces: int = 2,
    fudge: float = 1e-3,
    accel=None,
) -> jax.Array:
    """Mean squared error between the rendered color image and `target`
    ((H*W, 3) or (H, W, 3))."""
    color, _, _ = render_image_flat(
        with_params(soa, params), bounces, fudge, accel
    )
    return jnp.mean((color - target.reshape(-1, 3)) ** 2)


def grad_render_loss(soa, target, bounces: int = 2, fudge: float = 1e-3,
                     accel=None):
    """(loss, grads-dict) w.r.t. all differentiable scene parameters."""
    params = extract_params(soa)
    return jax.value_and_grad(render_loss)(
        params, soa, target, bounces, fudge, accel
    )
