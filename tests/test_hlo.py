"""Compiled-HLO evidence for the scaling story (SURVEY.md §2 parallelism
table; BASELINE.md >=90% scaling gate).

This environment has ONE physical chip, so multi-chip scaling cannot be
wall-clock-measured (SCALING_r*.json documents why the virtual-device
numbers measure host-core contention, not ICI). The strongest artifact the
environment CAN produce is the compiled program itself:

  * the sharded FORWARD (pixels over TILE_AXIS, scene replicated) must
    contain ZERO collective ops — communication-free by construction, so
    per-chip work is invariant in N and scaling is bounded only by launch
    overheads; and
  * the train-step program must contain ONLY all-reduce collectives (the
    scene-parameter-gradient psum inserted by shard_map's transpose of
    replicated inputs, plus the scalar loss mean), every one of them
    parameter-sized — no per-pixel data ever crosses chips.

Reference anchor: the reference is single-GPU (kernel.hpp:86-130); these
programs are its multi-chip replacement per SURVEY.md §2's table.
"""

import re

import jax
import jax.numpy as jnp
import optax
import pytest

from cutrace_tpu.diff.grad import extract_params
from cutrace_tpu.parallel.sharding import (_render_sharded_jit, make_mesh,
                                           shard_scene)
from cutrace_tpu.parallel.train import make_train_step
from cutrace_tpu.scene.loader import load_scene
from cutrace_tpu.scene.soa import scene_to_soa

_COLLECTIVES = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute"
    r"|reduce-scatter|collective-broadcast|ragged-all-to-all)\b"
)


def _setup(scenes_dir, name="sphere_plane.json", w=64, h=32):
    sc = load_scene(scenes_dir / name)
    sc.camera.width, sc.camera.height = w, h
    soa = scene_to_soa(sc)
    mesh = make_mesh(len(jax.devices()), 1)
    return shard_scene(soa, mesh), mesh


def test_sharded_forward_hlo_has_zero_collectives(scenes_dir):
    """The compiled tiles-sharded forward moves no bytes between devices."""
    soa, mesh = _setup(scenes_dir)
    txt = _render_sharded_jit.lower(soa, mesh, 1e-3, 2, None).compile()
    txt = txt.as_text()
    found = sorted(set(_COLLECTIVES.findall(txt)))
    assert found == [], f"forward HLO contains collectives: {found}"


def test_sharded_forward_hlo_accel_zero_collectives(scenes_dir):
    """Same gate through the accelerated (clusters) path: the replicated
    Accel must not introduce communication either."""
    from cutrace_tpu.ops.bvh import build_accel

    sc = load_scene(scenes_dir / "bunny.json")
    sc.camera.width, sc.camera.height = 64, 32
    soa = scene_to_soa(sc)
    mesh = make_mesh(len(jax.devices()), 1)
    soa = shard_scene(soa, mesh)
    accel = build_accel(soa, kind="clusters")
    txt = _render_sharded_jit.lower(soa, mesh, 1e-3, 2, accel).compile()
    txt = txt.as_text()
    found = sorted(set(_COLLECTIVES.findall(txt)))
    assert found == [], f"accel forward HLO contains collectives: {found}"


def test_train_step_hlo_psum_only_and_param_sized(scenes_dir):
    """The compiled train step's only collective kind is all-reduce (the
    parameter-gradient psum + scalar loss mean), and every all-reduced
    tensor is parameter-sized — per-pixel data never crosses the mesh."""
    soa, mesh = _setup(scenes_dir)
    params = extract_params(soa)
    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = make_train_step(mesh, opt, bounces=2)
    tgt = jnp.zeros((soa.width * soa.height, 3), jnp.float32)
    txt = step.lower(params, state, soa, tgt).compile().as_text()

    kinds = set(_COLLECTIVES.findall(txt))
    assert kinds <= {"all-reduce"}, f"unexpected collectives: {kinds}"
    assert "all-reduce" in kinds, "expected the parameter-gradient psum"

    n_params = sum(int(jnp.size(v)) for v in params.values())
    n_pixels = soa.width * soa.height
    assert n_params < n_pixels  # the gate below is meaningful
    for line in txt.splitlines():
        if re.search(r" all-reduce(-start)?\(", line):
            lhs = line.split(" all-reduce", 1)[0]
            counts = [
                int(jnp.prod(jnp.asarray([int(x) for x in dims.split(",")])))
                if dims else 1
                for dims in re.findall(r"f32\[([0-9,]*)\]", lhs)
            ]
            assert counts, f"unparsed all-reduce line: {line[:120]}"
            assert sum(counts) <= n_params + 1, (
                f"all-reduce moves {sum(counts)} elements "
                f"(> {n_params} scene params): {line[:120]}"
            )
