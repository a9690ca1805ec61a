"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The sandbox presets JAX_PLATFORMS=axon and imports jax from sitecustomize,
so env vars alone cannot redirect the backend — we must override via
jax.config after import.  XLA_FLAGS still applies because the CPU client is
only created lazily at first use (which happens inside the tests).

Real-TPU execution is exercised by bench.py / __graft_entry__.py; the test
suite validates numerics and multi-chip sharding on host CPU (the reference
has no distributed machinery at all — SURVEY.md §5.8).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the heavy scan/pairing programs compile once and
# are reused across test processes/rounds.  MATHLIB_TEST_CACHE overrides the
# location (e.g. a throwaway dir to measure cold-cache behavior).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MATHLIB_TEST_CACHE", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xA11CE)


CURVE_NAMES = ["BLS12_381", "BN254", "BLS12_377", "FP256BN"]


@pytest.fixture(params=CURVE_NAMES)
def spec(request):
    from mathlib_tpu.curves.params import get_spec

    return get_spec(request.param)
