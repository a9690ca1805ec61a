"""Batched Gt exponentiation with per-lane variable exponents (the
device analogue of Gt.Exp, math.go:620-624)."""

import random

import jax
import numpy as np
import pytest

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.host.fields import get_tower
from mathlib_tpu.ops.field import get_fp_ctx, int_to_limbs
from mathlib_tpu.ops.tower import get_tower_ctx


@pytest.mark.slow  # 255-step f12 square-multiply scan compile
def test_f12_pow_scalars():
    spec = get_spec("BLS12_381")
    tw = get_tower_ctx(spec)
    ht = get_tower(spec)
    fr = get_fp_ctx(spec.r)
    rng = random.Random(4)
    x = (
        tuple((rng.randrange(spec.p), rng.randrange(spec.p)) for _ in range(3)),
        tuple((rng.randrange(spec.p), rng.randrange(spec.p)) for _ in range(3)),
    )
    ks = [rng.randrange(spec.r) for _ in range(2)] + [1]
    a = np.repeat(tw.f12_encode(x), len(ks), axis=-1)
    S = np.stack([int_to_limbs(k, fr.L) for k in ks], axis=-1)
    out = tw.f12_decode(jax.jit(tw.f12_pow_scalars)(a, S))
    for i, k in enumerate(ks):
        assert out[i] == ht.f12_pow(x, k)
