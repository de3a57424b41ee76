"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(jax.sharding.Mesh + shard_map) are exercised without TPU hardware, per
SURVEY.md §4. Must run before jax is imported anywhere.

Exception: `CUTRACE_TEST_TPU=1` leaves the default backend alone so the
`tpu_smoke` marker subset runs on the real chip (interpret-mode Pallas
provably misses Mosaic-only failures — docs/performance.md round-2
vector-carry bug). Usage:

    CUTRACE_TEST_TPU=1 python -m pytest -m tpu_smoke -q
"""

import os

ON_TPU = os.environ.get("CUTRACE_TEST_TPU") == "1"

if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not ON_TPU:
    # The environment preloads an 'axon' TPU platform plugin that wins over
    # the JAX_PLATFORMS env var; the config knob reliably forces CPU.
    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache for the CPU harness too: the deep-replay
    # parity gates compile multi-minute XLA CPU programs; repeat suite
    # runs hit the cache even across jax.clear_caches() (content-
    # addressed on the jaxpr, so cache state cannot change outcomes).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("CUTRACE_TEST_CACHE",
                       os.path.expanduser("~/.cache/cutrace_tpu_cputests")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
else:
    # the tpu_smoke programs are large; persist their compiles like bench.py
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("CUTRACE_CACHE",
                       os.path.expanduser("~/.cache/cutrace_tpu")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCENES = REPO / "scenes"


@pytest.fixture
def scenes_dir():
    return SCENES
