"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; the test
suite validates numerics and multi-chip sharding on host CPU (the reference
has no distributed machinery at all — SURVEY.md §5.8)."""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
