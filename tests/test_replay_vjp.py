"""Parity gates for the Pallas replay-VJP kernel (ops/replay_vjp.py): its
hand-derived adjoints must match jax.vjp of the XLA replay
(ops/replay.py) — same math, same guards, association-level fp noise only.

Runs in interpret mode on CPU (conftest); the on-chip compiled run is in
tests/test_tpu_smoke.py."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutrace_tpu.ops.fused import TILE_R, _fused_forward, fused_render_rays
from cutrace_tpu.ops.replay import replay_render_rays
from cutrace_tpu.ops.replay_vjp import replay_vjp, replay_vjp_supported
from cutrace_tpu.render.renderer import camera_rays, prepare
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa


def _prep(scenes_dir_or_path, name=None, w=64, h=32):
    if name is None:
        sc = load_scene(scenes_dir_or_path)
    else:
        sc = load_scene(scenes_dir_or_path / name)
    sc.camera.width, sc.camera.height = w, h
    return prepare(scene_to_soa(sc), accel="fused")


def _codes_and_rays(prepared, bounces, fudge=1e-3):
    soa = prepared.soa
    n = soa.width * soa.height
    idx = jnp.arange(n, dtype=jnp.int32)
    o, d = camera_rays(soa, idx % soa.width, idx // soa.width)
    _, _, _, codes = _fused_forward(
        soa, prepared.accel, o, d, fudge, bounces, emit_topo=True
    )
    return o, d, codes


def _compare(prepared, bounces, seed=0, rtol=2e-3):
    """Kernel grads vs jax.vjp(replay_render_rays) on random cotangents."""
    soa = prepared.soa
    assert replay_vjp_supported(soa, bounces)
    fudge = 1e-3
    o, d, codes = _codes_and_rays(prepared, bounces, fudge)
    r = o.shape[0]
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    cot = (jax.random.normal(k0, (r, 3), jnp.float32),
           jax.random.normal(k1, (r,), jnp.float32),
           jax.random.normal(k2, (r, 3), jnp.float32))
    # depth cotangent only where finite depth (the loss never reads the
    # +inf miss pixels; an fp-inf cotangent path is out of scope for both
    # backends): zero it on misses like a masked depth loss would.
    _, dep, _ = replay_render_rays(soa, o, d, codes,
                                   jnp.float32(fudge), bounces)
    cot = (cot[0], jnp.where(jnp.isfinite(dep), cot[1], 0.0), cot[2])

    _, vjp = jax.vjp(
        lambda s, oo, dd: replay_render_rays(
            s, oo, dd, codes, jnp.float32(fudge), bounces),
        soa, o, d,
    )
    ref_soa, ref_o, ref_d = vjp(cot)
    got_soa, got_o, got_d = replay_vjp(
        soa, o, d, codes, cot, fudge, bounces, interpret=True
    )

    def check(name, a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-12)
        ok = np.isclose(a, b, rtol=rtol, atol=rtol * scale)
        assert ok.all(), (
            f"{name}: {(~ok).sum()}/{a.size} mismatch, "
            f"max |diff| {np.abs(a - b).max():.3e} at scale {scale:.3e}"
        )

    from cutrace_tpu.diff.grad import DIFFERENTIABLE_FIELDS

    for f in DIFFERENTIABLE_FIELDS:
        if f.startswith("cam_"):
            continue  # camera grads flow via (o, d), not soa leaves
        check(f, getattr(ref_soa, f), getattr(got_soa, f))
    check("o", ref_o, got_o)
    check("d", ref_d, got_d)


def test_kernel_vjp_parity_bunny(scenes_dir):
    """Triangles + planes + 4 point lights + reflection chain."""
    _compare(_prep(scenes_dir, "bunny.json", 32, 16), bounces=2)


def test_kernel_vjp_parity_triangle(scenes_dir):
    """Single node (no reflective material), sun light."""
    _compare(_prep(scenes_dir, "triangle.json", 24, 24), bounces=2)


@pytest.mark.slow
def test_kernel_vjp_parity_mirror(scenes_dir):
    """Near-unit reflectance chain (reflect 0.999), 2 point lights."""
    _compare(_prep(scenes_dir, "mirror.json", 32, 16), bounces=2)


def test_kernel_vjp_parity_transparent(scenes_dir):
    """Two-branch bounce tree (refl + transp children) + the
    differentiable shadow-march replay: 7 nodes, 2 lights x 3 march
    steps (sphere_plane at b2)."""
    _compare(_prep(scenes_dir, "sphere_plane.json", 32, 16), bounces=2)


def test_dead_node_garbage_codes_finite(scenes_dir):
    """The fused kernel's @pl.when subtree skip + alive-masked casts
    leave DEAD nodes' code slots unwritten on chip — the host clips the
    garbage into valid-looking codes, so a dead lane can claim a "hit"
    on the zero-area padded triangle (observed on the v5e: primary miss,
    refl-child code 0 -> unguarded normalize(0) NaN poisoning tri/light/
    camera grads via 0 * NaN). Both backwards must stay finite AND
    value/grad-identical under such garbage, since dead weight == 0."""
    prepared = _prep(scenes_dir, "sphere_plane.json", 32, 16)
    soa = prepared.soa
    fudge = 1e-3
    o, d, codes = _codes_and_rays(prepared, 2, fudge)
    codes = np.asarray(codes).copy()
    # poison: every primary-miss lane claims its refl child (cast row 7
    # at b2: node rows = 1 + 2 lights x 3 steps) hit primitive 0 — the
    # degenerate padded triangle — and marched through it 3x on light 1
    miss = codes[:, 0] < 0
    assert miss.any()
    # every dead node (rows per node = 1 + 2 lights x 3 steps = 7 at b2)
    # claims a hit on primitive 0 — including node + transp-child pairs,
    # whose degenerate chains manufactured the on-chip NaN lanes
    for cast_row in (7, 14, 21, 28, 35, 42):
        codes[miss, cast_row] = 0
    codes[miss, 11:14] = 0
    codes = jnp.asarray(codes)
    # ... and one ray EXACTLY antiparallel to the sun: sdir and nd then
    # evaluate to the bit-identical normalize, hv = -nd + sdir == 0, and
    # sqrt's autodiff at 0 is inf — inf * (concrete zero cotangent) = NaN
    # unless the guard sits inside the sqrt (replay _phong_lights
    # _safe_len). This needs no garbage codes at all.
    lane = int(np.nonzero(np.asarray(miss))[0][0])
    d = jnp.asarray(np.asarray(d).copy())
    d = d.at[lane].set(-soa.light_vec[0])

    args = (soa, o, d, codes, jnp.float32(fudge), 2)
    c, dep, nrm = replay_render_rays(*args)
    assert np.isfinite(np.asarray(c)).all()

    _, vjp = jax.vjp(
        lambda s, oo, dd: replay_render_rays(
            s, oo, dd, codes, jnp.float32(fudge), 2), soa, o, d)
    r = o.shape[0]
    cot = (jnp.ones((r, 3), jnp.float32),
           jnp.where(jnp.isfinite(dep), 1.0, 0.0),
           jnp.ones((r, 3), jnp.float32))
    ref_soa, ref_o, ref_d = vjp(cot)
    got_soa, got_o, got_d = replay_vjp(
        soa, o, d, codes, cot, fudge, 2, interpret=True)
    for name, a, b in [("tri_p1", ref_soa.tri_p1, got_soa.tri_p1),
                       ("light_vec", ref_soa.light_vec, got_soa.light_vec),
                       ("o", ref_o, got_o), ("d", ref_d, got_d)]:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.isfinite(a).all(), f"{name}: replay vjp not finite"
        assert np.isfinite(b).all(), f"{name}: kernel vjp not finite"
        scale = max(np.abs(a).max(), 1e-12)
        assert np.allclose(a, b, rtol=2e-3, atol=2e-3 * scale), name


# NOTE (round 5): the authored-depth transparent config (sphere_plane
# b5: 63-node two-branch tree, 441 topo rows) is gated COMPILED on chip
# (tests/test_tpu_smoke.py::test_pallas_vjp_transparent_deep_on_chip).
# It was gated here in interpret mode through round 4
# (test_kernel_vjp_parity_transparent_deep), but interpret execution of
# the static unroll scales superlinearly with tree depth and measured
# > 83 minutes at b5 on this harness (b3 above runs in ~3 min, b4
# extrapolates to ~40) — while the compiled kernel runs the same program
# in milliseconds. Structural coverage (two-branch recursion + unrolled
# march replay) is held by the b3 interpret gate; depth coverage belongs
# on the chip.


@pytest.fixture
def opaque_spheres(tmp_path):
    """Opaque scene with spheres (sphere_plane is transparent and out of
    kernel scope): covers the sphere t / normal / radius adjoints."""
    scene = {
        "camera": {"eye": [0, 1, -5], "up": [0, 1, 0], "look": [0, 1, 0],
                   "width": 32, "height": 16, "ambient": 0.05},
        "materials": [
            {"type": "solid", "color": [1.0, 0.7, 0.2], "specular": 0.8,
             "reflect": 0.3, "phong": 50},
            {"type": "solid", "color": [0.2, 0.3, 0.8], "specular": 0.1,
             "reflect": 0.5, "phong": 20},
        ],
        "lights": [
            {"type": "sun", "direction": [-1, -1, 1],
             "color": [0.8, 0.8, 0.8]},
            {"type": "point", "point": [-10, 20, 10],
             "color": [0.8, 0.8, 0.8]},
        ],
        "objects": [
            {"type": "sphere", "material": 0, "center": [0, 1, 0],
             "radius": 0.8},
            {"type": "sphere", "material": 0, "center": [1.4, 0.3, 0.5],
             "radius": 0.5},
            {"type": "plane", "material": 1, "point": [0, -0.5, 0],
             "normal": [0, 1, 0]},
        ],
    }
    p = tmp_path / "opaque_spheres.json"
    p.write_text(json.dumps(scene))
    return p


@pytest.mark.slow
def test_kernel_vjp_parity_spheres(opaque_spheres):
    _compare(_prep(opaque_spheres), bounces=2)


def test_zero_light_scene_grad(tmp_path):
    """Scenes with no lights (loader-supported: ambient-only shading) must
    produce finite gradients through the default Pallas replay-VJP branch
    — regression for the (0, 8) vs SoA-padded (1, 8) light-cotangent
    shape mismatch (ADVICE r4)."""
    from cutrace_tpu.diff.grad import extract_params, with_params

    scene = {
        "camera": {"eye": [0, 1, -5], "up": [0, 1, 0], "look": [0, 1, 0],
                   "width": 16, "height": 8, "ambient": 0.4},
        "materials": [
            {"type": "solid", "color": [1.0, 0.7, 0.2], "specular": 0.8,
             "reflect": 0.3, "phong": 50},
        ],
        "lights": [],
        "objects": [
            {"type": "sphere", "material": 0, "center": [0, 1, 0],
             "radius": 0.8},
            {"type": "plane", "material": 0, "point": [0, -0.5, 0],
             "normal": [0, 1, 0]},
        ],
    }
    p = tmp_path / "no_lights.json"
    p.write_text(json.dumps(scene))
    prepared = _prep(p)
    soa, accel = prepared.soa, prepared.accel
    assert soa.n_lights == 0
    n = soa.width * soa.height
    idx = jnp.arange(n, dtype=jnp.int32)

    def loss(params):
        s = with_params(soa, params)
        o, d = camera_rays(s, idx % s.width, idx // s.width)
        c, _, _ = fused_render_rays(s, accel, o, d, 1e-3, 2)
        return jnp.mean(c)

    g = jax.grad(loss)(extract_params(soa))
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    # the sphere color drives the ambient term: its grad must be nonzero
    assert np.abs(np.asarray(g["mat_color"])).max() > 0


@pytest.mark.slow
def test_end_to_end_grad_step_uses_kernel(scenes_dir, monkeypatch):
    """Full value_and_grad through fused_render_rays: the kernel branch
    (default) must give the same gradients as the XLA replay branch
    (CUTRACE_REPLAY_VJP=0), through the custom_vjp integration incl. ray
    padding and the camera chain."""
    from cutrace_tpu.diff.grad import extract_params, with_params

    prepared = _prep(scenes_dir, "bunny.json", 32, 16)
    soa, accel = prepared.soa, prepared.accel
    n = soa.width * soa.height
    idx = jnp.arange(n, dtype=jnp.int32)

    def loss(params):
        s = with_params(soa, params)
        o, d = camera_rays(s, idx % s.width, idx // s.width)
        c, dep, nrm = fused_render_rays(s, accel, o, d, 1e-3, 2)
        return (jnp.mean(c) + jnp.mean(jnp.where(jnp.isfinite(dep), dep, 0))
                + jnp.mean(nrm))

    params = extract_params(soa)
    monkeypatch.setenv("CUTRACE_REPLAY_VJP", "0")
    ref = jax.grad(lambda p: loss(p) * 1.0)(params)
    monkeypatch.delenv("CUTRACE_REPLAY_VJP")
    got = jax.grad(lambda p: loss(p) + 0.0)(params)

    for k in params:
        a, b = np.asarray(ref[k], np.float64), np.asarray(got[k], np.float64)
        scale = max(np.abs(a).max(), 1e-12)
        ok = np.isclose(a, b, rtol=2e-3, atol=2e-3 * scale)
        assert ok.all(), (
            f"grad[{k}]: max |diff| {np.abs(a - b).max():.3e} "
            f"(scale {scale:.3e})"
        )
