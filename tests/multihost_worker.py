"""Worker for tests/test_multihost.py: one jax.distributed process.

Run as  python tests/multihost_worker.py <process_id> <num_processes> <port>
Each process owns 2 virtual CPU devices (xla_force_host_platform_device_count),
so 2 processes form a 4-device global mesh. The worker initializes the
distributed runtime via cutrace_tpu.parallel.multihost, renders its shard of
sphere_plane.json through the tile-sharded path, gathers the full frame, and
writes it to an .npy (process 0 only) for the test to compare against a
single-process render.

This is the true multi-process analog of the reference's single-device
render (SURVEY.md §2 distributed rows): same scene on every host, image
tiles sharded over the global mesh, deterministic gather.
"""

import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cutrace_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.soa import scene_to_soa

    sc = load_scene(str(REPO / "scenes" / "sphere_plane.json"))
    sc.camera.width, sc.camera.height = 64, 36
    soa = scene_to_soa(sc)

    mesh = multihost.global_mesh()
    color, depth, normal = multihost.render_multihost(soa, mesh, bounces=2)
    full = multihost.gather_image(color)
    assert full.shape == (36, 64, 3), full.shape

    # fused-kernel path across processes: per-device block-order shards,
    # assembled via the explicit multihost gather inside render_sharded
    # (round 4 — the production multi-chip kernel config, multi-process)
    from cutrace_tpu.parallel import render_sharded
    from cutrace_tpu.render.renderer import prepare

    prepared = prepare(soa, accel="fused")
    color_f, _, _ = render_sharded(prepared, mesh, bounces=2)
    import numpy as np

    color_f = np.asarray(color_f)
    assert color_f.shape == (36, 64, 3), color_f.shape

    if pid == 0:
        np.save(out_path, full)
        np.save(out_path.replace(".npy", "_fused.npy"), color_f)
    # all processes must stay alive until the collectives finish
    jax.effects_barrier()


if __name__ == "__main__":
    main()
