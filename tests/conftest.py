"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(jax.sharding.Mesh + shard_map) are exercised without TPU hardware, per
SURVEY.md §4. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment preloads an 'axon' TPU platform plugin that wins over the
# JAX_PLATFORMS env var; the config knob reliably forces CPU.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCENES = REPO / "scenes"


@pytest.fixture
def scenes_dir():
    return SCENES
