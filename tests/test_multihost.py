"""True multi-process jax.distributed test (VERDICT r1 item 7).

Launches 2 OS processes, each with 2 virtual CPU devices, that initialize
jax.distributed against a local coordinator, render sphere_plane.json over
the 4-device global mesh via cutrace_tpu.parallel.multihost, and gather the
full frame. The gathered multi-process image must be bit-identical to a
single-process render of the same scene — the determinism contract
multihost.py documents.
"""

import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_render_matches_single(tmp_path):
    port = _free_port()
    out = tmp_path / "multi.npy"
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             str(pid), "2", str(port), str(out)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    multi = np.load(out)

    # Single-process oracle: render_sharded on a 1-device mesh (the
    # determinism contract is sharded-vs-sharded bit-identity; the plain
    # chunked renderer may legitimately flip knife-edge winners, see
    # tests/test_parallel.py).
    import jax

    from cutrace_tpu.parallel import make_mesh, render_sharded
    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.soa import scene_to_soa

    sc = load_scene(str(REPO / "scenes" / "sphere_plane.json"))
    sc.camera.width, sc.camera.height = 64, 36
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    single = np.asarray(render_sharded(scene_to_soa(sc), mesh, bounces=2)[0])

    np.testing.assert_array_equal(multi, single)

    # fused-kernel path: the 2-process render (explicit multihost-gather
    # assembly) must be bit-identical to a SINGLE-process render over the
    # same 4-device mesh SHAPE — the same partitioned program, so fp must
    # agree exactly. (A different mesh/padding shape legitimately flips
    # knife-edge winners: the plain renderer's ray-gen compiles into a
    # different fusion context and differs by ulps on silhouettes —
    # measured 68/6912 px on this scene.)
    from cutrace_tpu.render.renderer import prepare

    multi_fused = np.load(str(out).replace(".npy", "_fused.npy"))
    prepared = prepare(scene_to_soa(sc), accel="fused")
    mesh4 = make_mesh(4, 1, devices=jax.devices()[:4])
    single_fused = np.asarray(
        render_sharded(prepared, mesh4, bounces=2)[0]
    )
    np.testing.assert_array_equal(multi_fused, single_fused)
