"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest
forces JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8).

Gates (SURVEY.md §7, BASELINE.md): multi-device results must be
deterministic and match single-device output — here they are checked
bit-identical, which holds by construction (per-pair arithmetic is
identical under tile/primitive sharding; combines use fixed lexicographic
reduction order, no atomics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutrace_tpu.diff.grad import render_image_flat
from cutrace_tpu.parallel import make_mesh, render_sharded
from cutrace_tpu.parallel.train import fit
from cutrace_tpu.render.renderer import render
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa


@pytest.fixture(scope="module")
def sp_soa(request):
    sc = load_scene(request.config.rootpath / "scenes" / "sphere_plane.json")
    sc.camera.width, sc.camera.height = 32, 16
    return scene_to_soa(sc)


def _identical(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return bool(((a == b) | (np.isinf(a) & np.isinf(b))).all())


@pytest.mark.parametrize("tiles,prims", [(8, 1), (4, 2), (2, 4)])
def test_sharded_render_bit_identical(sp_soa, tiles, prims):
    ref = render(sp_soa, bounces=2)
    out = render_sharded(sp_soa, make_mesh(tiles, prims), bounces=2)
    for a, b, name in zip(ref, out, ("color", "depth", "normal")):
        assert _identical(a, b), f"{name} differs on mesh ({tiles},{prims})"


def test_sharded_render_mesh_scene(scenes_dir):
    """Primitive sharding across a mesh-heavy scene (mirror: 924 tris)."""
    sc = load_scene(scenes_dir / "mirror.json")
    sc.camera.width, sc.camera.height = 32, 16
    soa = scene_to_soa(sc)
    ref = render(soa, bounces=2)
    out = render_sharded(soa, make_mesh(2, 4), bounces=2)
    for a, b in zip(ref, out):
        assert _identical(a, b)


@pytest.mark.slow
def test_distributed_fit_recovers_materials(sp_soa):
    """End-to-end distributed inverse rendering on a 4x2 mesh: corrupt all
    material colors, recover them from the target image (grad psum over
    tiles + all_gather-combined primitive shards in the forward)."""
    target, _, _ = render_image_flat(sp_soa, 2, 1e-3)
    corrupt = dataclasses.replace(
        sp_soa, mat_color=jnp.full_like(sp_soa.mat_color, 0.5)
    )
    params, losses = fit(
        corrupt, target, make_mesh(4, 2), steps=120, lr=5e-2,
        bounces=2, param_filter=("mat_color",),
    )
    assert losses[-1] < 1e-5, f"fit did not converge: {losses[-1]}"
    assert np.allclose(
        np.asarray(params["mat_color"]), np.asarray(sp_soa.mat_color),
        atol=2e-2,
    )


@pytest.mark.slow
def test_dryrun_entrypoints():
    """The driver's dryrun contract (__graft_entry__.py)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert all(bool(np.isfinite(np.asarray(x)).any()) for x in out)


def test_sharded_render_with_accel(scenes_dir):
    """PreparedScene acceleration flows through the tile-sharded path
    (interpret-mode kernel on the CPU mesh) AND composes with primitive
    sharding: each device culls its own triangle shard, then the
    all_gather (t, order) combine picks the global winner. Knife-edge note:
    the kernel re-derives t elementwise vs the brute matmul form, so exact
    equality is not guaranteed — checked against the same atol as the
    single-device accel parity tests (tests/test_bvh.py), all pixels."""
    from cutrace_tpu.render.renderer import prepare

    sc = load_scene(scenes_dir / "mirror.json")
    sc.camera.width, sc.camera.height = 32, 16
    soa = scene_to_soa(sc)
    ref = render(soa, bounces=2)
    prepared = prepare(soa, accel="pallas")
    for tiles, prims in ((8, 1), (4, 2)):
        out = render_sharded(prepared, make_mesh(tiles, prims), bounces=2)
        for a, b, name in zip(ref, out, ("color", "depth", "normal")):
            a, b = np.asarray(a), np.asarray(b)
            ok = np.isclose(a, b, atol=1e-4) | (np.isinf(a) & np.isinf(b))
            assert ok.all(), f"({tiles},{prims})/{name}"


@pytest.mark.slow
def test_distributed_fit_with_accel(scenes_dir):
    """VERDICT.md item 4: fit() with acceleration on a prim-sharded mesh —
    vertex gradients flow through the per-shard culled cast."""
    from cutrace_tpu.diff.grad import extract_params

    sc = load_scene(scenes_dir / "mirror.json")
    sc.camera.width, sc.camera.height = 16, 8
    soa = scene_to_soa(sc)
    target, _, _ = render_image_flat(soa, 1, 1e-3)
    corrupt = dataclasses.replace(
        soa, mat_color=jnp.clip(soa.mat_color * 0.6 + 0.1, 0.0, 1.0)
    )
    params, losses = fit(
        corrupt, target, make_mesh(4, 2), steps=60, lr=5e-2,
        bounces=1, param_filter=("mat_color",), accel="clusters",
    )
    assert losses[-1] < losses[0] * 0.05, f"fit did not converge: {losses}"


@pytest.mark.slow
def test_sharded_render_fused_kernel(scenes_dir):
    """A fused-kind PreparedScene on a tiles-only mesh runs the fused
    whole-pipeline kernel per shard (block-coherent pixel order + inverse
    permutation): the multi-chip path at single-chip kernel speed. Output
    must match the single-device render to the fused parity tolerance."""
    from cutrace_tpu.render.renderer import prepare

    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 32, 18
    soa = scene_to_soa(sc)
    ref = render(soa, bounces=2)
    prepared = prepare(soa, accel="fused")
    out = render_sharded(prepared, make_mesh(8, 1), bounces=2)
    import sys
    sys.path.insert(0, str(scenes_dir.parent / "tests"))
    from test_device_renderer import discontinuity_mask

    for a, b, name in zip(ref, out, ("color", "depth", "normal")):
        a, b = np.asarray(a), np.asarray(b)
        ok = np.isclose(a, b, atol=2e-4) | (np.isinf(a) & np.isinf(b))
        bad = ~ok.reshape(a.shape[0], a.shape[1], -1).all(-1)
        off = bad & ~discontinuity_mask(a)
        assert off.sum() == 0, f"{name}: {off.sum()} mismatches off edges"


@pytest.mark.slow
def test_distributed_fit_fused_forward(scenes_dir):
    """fit() with a fused-kind accel on a tiles-only mesh: the forward
    pass runs the fused kernel, the custom_vjp backward differentiates
    the composable pipeline — training must converge exactly like the
    composable forward."""
    sc = load_scene(scenes_dir / "mirror.json")
    sc.camera.width, sc.camera.height = 16, 8
    soa = scene_to_soa(sc)
    target, _, _ = render_image_flat(soa, 1, 1e-3)
    corrupt = dataclasses.replace(
        soa, mat_color=jnp.clip(soa.mat_color * 0.6 + 0.1, 0.0, 1.0)
    )
    params, losses = fit(
        corrupt, target, make_mesh(8, 1), steps=40, lr=5e-2,
        bounces=1, param_filter=("mat_color",), accel="fused",
    )
    assert losses[-1] < losses[0] * 0.1, f"fit did not converge: {losses}"
