"""Inverse rendering example: recover material colors from a target image.

Demonstrates the capability stack the CUDA reference lacks entirely:
differentiable rendering + distributed optimization + checkpoint/resume.

    PYTHONPATH=. python examples/inverse_rendering.py            # uses all local devices
    PYTHONPATH=. python examples/inverse_rendering.py --cpu      # 8-device virtual mesh
"""

import argparse
import dataclasses
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent

import cutrace_tpu  # noqa: F401  (PYTHONPATH=. from the repo root, or pip install -e .)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=str(REPO / "scenes/sphere_plane.json"))
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=36)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cutrace_tpu.diff.grad import render_image_flat
    from cutrace_tpu.parallel import make_mesh
    from cutrace_tpu.parallel.train import fit
    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.soa import scene_to_soa

    scene = load_scene(args.scene)
    scene.camera.width, scene.camera.height = args.width, args.height
    soa = scene_to_soa(scene)

    # ground truth image from the true scene
    target, _, _ = render_image_flat(soa, 2, 1e-3)
    true_colors = np.asarray(soa.mat_color)

    # corrupt every material, then recover from the image alone
    corrupt = dataclasses.replace(
        soa, mat_color=jnp.full_like(soa.mat_color, 0.5)
    )

    n = jax.device_count()
    n_prims = 2 if n % 2 == 0 and n > 1 else 1
    mesh = make_mesh(n // n_prims, n_prims)
    print(f"mesh: {n // n_prims} tile shards x {n_prims} primitive shards")

    params, losses = fit(
        corrupt, target, mesh,
        steps=args.steps, lr=5e-2, bounces=2,
        param_filter=("mat_color",), verbose=True,
        checkpoint_dir=args.checkpoint_dir,
    )
    print(f"\nloss: {losses[0]:.6f} -> {losses[-1]:.2e}")
    print("recovered material colors:")
    print(np.asarray(params["mat_color"]).round(3))
    print("true material colors:")
    print(true_colors.round(3))

    # ---- camera recovery (look-at reparameterization) ----------------
    # Optimizing the raw basis vectors would skew the projection; the
    # look-at view (diff/camera.py) keeps every gradient step a valid
    # orthonormal camera. Perturb the eye, recover it from the image.
    from cutrace_tpu.diff.camera import apply_look_at, camera_to_look_at

    true_cam = camera_to_look_at(soa)
    shaken = apply_look_at(
        soa, dict(true_cam,
                  cam_eye=true_cam["cam_eye"] + jnp.asarray([0.08, -0.05, 0.06])),
    )
    target_b1, _, _ = render_image_flat(soa, 1, 1e-3)  # matched model
    cam_params, cam_losses = fit(
        shaken, target_b1, mesh, steps=250, lr=4e-3, bounces=1,
        param_filter=("cam_eye",), camera="look_at",
    )
    err = np.abs(np.asarray(cam_params["cam_eye"])
                 - np.asarray(true_cam["cam_eye"]))
    print(f"\ncamera: loss {cam_losses[0]:.6f} -> {cam_losses[-1]:.2e}, "
          f"eye error {err.round(4)}")


if __name__ == "__main__":
    main()
