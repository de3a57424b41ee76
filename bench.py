"""Benchmark: bunny.json at 1920x1080, bounce depth 5, on the default
backend (one TPU chip under the driver).

Prints TWO JSON lines: first the BACKWARD metric (full value_and_grad step
through the fused forward + topology-replay backward, w.r.t. all 19
differentiable parameter groups — BASELINE.md "forward + backward kernels
at speed-of-light"), then the headline FORWARD metric (LAST line — the
driver's parsed record). The forward line also embeds the backward numbers
as extra keys.

Forward metric: million ray casts per second. A "ray cast" is one
nearest-hit scene query (ray_cast.hpp:29-55): per pixel the unrolled bounce
tree performs `nodes * (1 + n_lights * shadow_steps)` casts (primary +
shadow marches per tree node) — 30 casts/pixel for bunny (6-node reflection
chain, 4 lights, opaque scene), 62.2M casts per 1080p frame.

vs_baseline compares against the reference renderer's own headline: the
CUDA reference publishes no numbers (BASELINE.md), so the baseline constant
below is this framework's first recorded TPU measurement (round 1); later
rounds must not regress it.
"""

import json
import os
import time

import jax

# Persistent compile cache: the 1080p bounce-5 program is large, and the
# driver re-runs this benchmark every round.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("CUTRACE_CACHE", os.path.expanduser("~/.cache/cutrace_tpu")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# No-regression floor. RATCHET RULE: floor = 0.94 x the best
# driver-recorded BENCH_r*.json value (the 0.94 band is the dev tunnel's
# measured wall-clock weather: a cached binary spanned 130.8-137.3 over
# one day; min-of-N + the result-cache discipline does not remove it).
# vs_baseline < 1.0 therefore means a real regression, not weather.
# Update only upward, every round, from the new best:
#   round 4 best = 150.1 Mcasts/s (BENCH_r04.json) -> floor 141.1.
BASELINE_MCASTS_PER_S = 141.1

WIDTH, HEIGHT, BOUNCES = 1920, 1080, 5


def main():
    from cutrace_tpu.render.renderer import prepare, render
    from cutrace_tpu.scene.loader import load_scene

    from cutrace_tpu.utils.profiling import casts_per_pixel

    sc = load_scene("scenes/bunny.json")
    sc.camera.width, sc.camera.height = WIDTH, HEIGHT
    prepared = prepare(sc, accel="auto")

    # casts per pixel from the compiled tree structure (see module docstring)
    total_casts = WIDTH * HEIGHT * casts_per_pixel(prepared.soa, BOUNCES)

    import dataclasses

    import numpy as np

    out = render(prepared, bounces=BOUNCES)
    np.asarray(out[1][0, :8])  # compile + warm up (fetch forces completion)

    # Measurement discipline (docs/performance.md): the dev tunnel serves
    # repeated identical (executable, args) executions from a result cache
    # and its block_until_ready can return before execution — so every
    # iteration perturbs a traced input (distinct execution) and timing
    # ends at a small device_get (forces completion, ~RTT of transfer).
    times = []
    for k in range(5):
        soa_k = dataclasses.replace(
            prepared.soa, ambient=prepared.soa.ambient + 1e-9 * (k + 1)
        )
        prep_k = dataclasses.replace(prepared, soa=soa_k)
        t0 = time.perf_counter()
        out = render(prep_k, bounces=BOUNCES)
        np.asarray(out[1][0, :8])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mcasts = total_casts / dt / 1e6

    # Transparent-scene backward (BASELINE.md configs name transparency
    # explicitly): sphere_plane at its authored 1080p, bounces 5 — a
    # 63-node two-branch tree, 441 topo rows. Takes the Pallas replay-VJP
    # kernel (0.974 s/step, BENCH_r04); the cast-free XLA replay (13.3 s)
    # and the chunked+remat composable vjp (46.7 s) are the fallback
    # tiers if replay_vjp_supported ever declines the config.
    # Guarded in a subprocess: a pathological compile must degrade to a
    # recorded timeout line, never kill the bunny artifact below.
    print(json.dumps(_transparent_grad_line()))

    grad = bench_backward(prepared, total_casts)
    print(json.dumps(grad))
    print(
        json.dumps(
            {
                "metric": "bunny_1080p_ray_casts",
                "value": round(mcasts, 3),
                "unit": "Mcasts/s",
                "vs_baseline": round(mcasts / BASELINE_MCASTS_PER_S, 3),
                "grad_step_s": grad["value"],
                "grad_mcasts_per_s": grad["mcasts_per_s"],
                "grad_backward": grad["backward"],
            }
        )
    )


def _transparent_grad_line(timeout_s=3300):
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, __file__, "sphere_plane_grad"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                row = json.loads(line)
                if row.get("metric") == "sphere_plane_1080p_grad_step":
                    return row
            except (json.JSONDecodeError, AttributeError):
                continue
        return {"metric": "sphere_plane_1080p_grad_step",
                "status": f"failed rc={r.returncode}",
                "tail": (r.stderr or "")[-300:]}
    except subprocess.TimeoutExpired:
        return {"metric": "sphere_plane_1080p_grad_step",
                "status": f"timeout>{timeout_s}s",
                "backward": "composable"}


def sphere_plane_grad_main():
    """Subprocess entry: just the transparent-backward metric."""
    from cutrace_tpu.render.renderer import prepare
    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.utils.profiling import casts_per_pixel

    sc = load_scene("scenes/sphere_plane.json")
    sc.camera.width, sc.camera.height = WIDTH, HEIGHT
    prepared = prepare(sc, accel="fused")
    total = WIDTH * HEIGHT * casts_per_pixel(prepared.soa, BOUNCES)
    print(json.dumps(bench_backward(
        prepared, total, metric="sphere_plane_1080p_grad_step")))


def bench_backward(prepared, total_casts, metric="bunny_1080p_grad_step"):
    """Full value_and_grad step at the flagship size: fused forward (with
    topology emission) + the fastest supported backward w.r.t. all
    differentiable parameter groups — the Pallas replay-VJP kernel for
    opaque scenes (ops/replay_vjp.py), the XLA topology replay
    (ops/replay.py) otherwise, the composable re-render past replay scope.
    The "backward" key records which one actually ran."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from cutrace_tpu.diff.grad import extract_params, with_params
    from cutrace_tpu.ops.fused import (TILE_R, fused_render_rays,
                                       replay_supported)
    from cutrace_tpu.render.renderer import _block_order, camera_rays

    soa, accel = prepared.soa, prepared.accel
    n = WIDTH * HEIGHT
    n_pad = -(-n // TILE_R) * TILE_R
    order, _ = _block_order(WIDTH, HEIGHT, n_pad)
    idx = jnp.asarray(order)
    replay = bool(replay_supported(soa, accel, BOUNCES, n_rays=n_pad))
    from cutrace_tpu.ops.replay_vjp import replay_vjp_supported

    backward = (
        "pallas_vjp" if replay and replay_vjp_supported(soa, BOUNCES)
        else ("replay" if replay else "composable")
    )

    import jax

    tgt, _, _ = fused_render_rays(
        soa, accel,
        *camera_rays(soa, idx % WIDTH, idx // WIDTH), 1e-3, BOUNCES,
    )
    tgt = jax.lax.stop_gradient(tgt) * 0.9

    def loss(params, soa_):
        s = with_params(soa_, params)
        o, d = camera_rays(s, idx % WIDTH, idx // WIDTH)
        c, _, _ = fused_render_rays(s, accel, o, d, 1e-3, BOUNCES)
        return jnp.mean((c - tgt) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    params = extract_params(soa)
    out = step(params, soa)
    np.asarray(out[0])  # compile + warm (fetch forces completion)

    times = []
    for k in range(3):
        # perturb a traced PARAM between iterations (result-cache
        # discipline, docs/performance.md "Measurement discipline")
        p_k = dict(params, ambient=params["ambient"] + 1e-9 * (k + 1))
        t0 = time.perf_counter()
        loss_v, grads = step(p_k, soa)
        np.asarray(loss_v)
        np.asarray(grads["mat_color"])[:1]
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "metric": metric,
        "value": round(dt, 3),
        "unit": "s/step",
        "mcasts_per_s": round(total_casts / dt / 1e6, 3),
        "backward": backward,
    }


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) > 1 and _sys.argv[1] == "sphere_plane_grad":
        sphere_plane_grad_main()
    else:
        main()
