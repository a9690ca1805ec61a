"""Device G2 group law vs the exact host engine.

The G2 path rides the same complete RCB formulas as G1 instantiated over
Fp2 (ops/g2.py); this suite mirrors the G1 coverage at small batches.
Regression anchor: G2Ctx.select once broadcast with one axis too many,
which made every select-based scan (scalar_mul, cofactor ladders) crash —
caught only when the device hash-to-G2 pipeline first used it.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.host.engine import get_engine
from mathlib_tpu.ops.g2 import get_g2_ctx

SPEC = get_spec("BLS12_381")


@pytest.fixture(scope="module")
def g2():
    return get_g2_ctx(SPEC)


@pytest.fixture(scope="module")
def eng():
    return get_engine(SPEC)


def test_g2_add_double_edges(g2, eng):
    P = eng.g2.mul(eng.gen_g2, 5)
    Q = eng.g2.mul(eng.gen_g2, 9)
    pts = [P, Q, None, P]
    qts = [Q, Q, Q, eng.g2.neg(P)]  # generic, doubling, inf, inverse
    out = g2.decode_points(
        jax.jit(g2.add)(g2.encode_points(pts), g2.encode_points(qts))
    )
    want = [eng.g2.add(a, b) for a, b in zip(pts, qts)]
    assert out == want
    out2 = g2.decode_points(jax.jit(g2.double)(g2.encode_points(pts)))
    assert out2 == [eng.g2.add(a, a) if a else None for a in pts]


def test_g2_scalar_mul(g2, eng):
    rng = random.Random(3)
    ks = [1, 2, rng.randrange(SPEC.r), SPEC.r - 1, 0]
    P = eng.g2.mul(eng.gen_g2, 7)
    out = g2.decode_points(
        jax.jit(g2.scalar_mul)(
            g2.encode_point(P), jnp.asarray(g2.encode_scalars(ks))
        )
    )
    want = [eng.g2.mul(P, k) for k in ks]
    assert out == want


def test_g2_select_rank(g2, eng):
    """select keeps the point rank (regression for the extra None axis)."""
    P = g2.encode_points([eng.gen_g2, eng.g2.mul(eng.gen_g2, 2)])
    mask = np.array([True, False])
    out = jax.jit(g2.select)(jnp.asarray(mask), jnp.asarray(P), jnp.asarray(P))
    assert out.shape == P.shape
