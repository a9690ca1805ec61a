"""Differential tests: device limb arithmetic vs exact host ints.

Oracle model per SURVEY.md §4.5: the host engine plays the role the second
real backend plays in the reference's Test381Compat (math_test.go:879-911).

Layout: elements are (..., L, B) with limbs on the sublane axis and the
batch B on lanes.
"""

import random

import jax
import numpy as np
import pytest

from mathlib_tpu.ops.field import FpCtx, bits_of, get_fp_ctx, int_to_limbs, limbs_to_int


def _rand_elems(p, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(p) for _ in range(n)]


@pytest.fixture
def ctx(spec):
    return get_fp_ctx(spec.p, spec.name)


def test_limb_roundtrip(ctx):
    xs = _rand_elems(ctx.p, 8, seed=1)
    for x in xs:
        assert limbs_to_int(int_to_limbs(x, ctx.L)) == x
        assert ctx.decode1(ctx.encode(x)) == x


def test_encode_batched(ctx):
    xs = _rand_elems(ctx.p, 6, seed=2)
    arr = ctx.encode(xs)
    assert arr.shape == (ctx.L, 6)
    assert list(ctx.decode(arr)) == xs


def test_add_sub_neg(ctx):
    p = ctx.p
    xs = _rand_elems(p, 16, seed=3)
    ys = _rand_elems(p, 16, seed=4)
    a, b = ctx.encode(xs), ctx.encode(ys)
    add = ctx.decode(jax.jit(ctx.add)(a, b))
    sub = ctx.decode(jax.jit(ctx.sub)(a, b))
    neg = ctx.decode(jax.jit(ctx.neg)(a))
    for i in range(16):
        assert add[i] == (xs[i] + ys[i]) % p
        assert sub[i] == (xs[i] - ys[i]) % p
        assert neg[i] == (-xs[i]) % p


def test_mont_mul(ctx):
    p = ctx.p
    xs = _rand_elems(p, 16, seed=5) + [0, 1, p - 1]
    ys = _rand_elems(p, 16, seed=6) + [0, p - 1, p - 1]
    a, b = ctx.encode(xs), ctx.encode(ys)
    out = ctx.decode(jax.jit(ctx.mont_mul)(a, b))
    for i in range(len(xs)):
        assert out[i] == xs[i] * ys[i] % p, f"mul mismatch at {i}"


def test_mul_int(ctx):
    p = ctx.p
    xs = _rand_elems(p, 4, seed=7)
    a = ctx.encode(xs)
    for n in [0, 1, 2, 3, 5, 9, p - 1, p - 5]:
        out = ctx.decode(jax.jit(lambda v: ctx.mul_int(v, n))(a))
        for i in range(4):
            assert out[i] == xs[i] * n % p


def test_inv(ctx):
    p = ctx.p
    xs = _rand_elems(p, 4, seed=8) + [1, p - 1]
    a = ctx.encode(xs)
    out = ctx.decode(jax.jit(ctx.inv)(a))
    for i in range(len(xs)):
        assert out[i] == pow(xs[i], p - 2, p)
    # 0 -> 0
    assert ctx.decode(jax.jit(ctx.inv)(ctx.encode([0])))[0] == 0


def test_pow_bits(ctx):
    p = ctx.p
    x = _rand_elems(p, 1, seed=9)[0]
    e = 0xDEADBEEFCAFE1234
    out = ctx.decode(jax.jit(lambda a: ctx.pow_bits(a, bits_of(e)))(ctx.encode([x])))
    assert out[0] == pow(x, e, p)


def test_sqrt(ctx):
    p = ctx.p
    if p % 4 != 3:
        pytest.skip("p % 4 != 3 — sqrt handled on host")
    xs = [x * x % p for x in _rand_elems(p, 4, seed=10)]
    out = ctx.decode(jax.jit(ctx.sqrt)(ctx.encode(xs)))
    for i, x in enumerate(xs):
        assert out[i] * out[i] % p == x


def test_predicates(ctx):
    a = ctx.encode([0, 1, 5])
    z = np.asarray(jax.jit(ctx.is_zero)(a))
    assert list(z) == [True, False, False]
    e = np.asarray(jax.jit(ctx.eq)(a, a))
    assert all(e)
    # relaxed-form zero: the value p (reachable via add) must read as zero
    b = ctx.encode([ctx.p - 1, 1, 4])
    s = jax.jit(ctx.add)(a, b)  # p-1, 2, 9
    z2 = np.asarray(jax.jit(ctx.is_zero)(jax.jit(ctx.add)(s, ctx.encode([1, 0, 0]))))
    assert bool(z2[0]) is True


def test_canon(ctx):
    """canon maps any relaxed value to canonical limbs < p."""
    a = ctx.encode([ctx.p - 1, 3])
    s = jax.jit(ctx.add)(a, ctx.encode([1, 0]))  # values {p or 0, 3}
    c = np.asarray(jax.jit(ctx.canon)(s))
    assert limbs_to_int(c[:, 0]) in (0,)  # canonical zero
    assert ctx.decode(c)[1] == 3


def test_mont_mul_broadcast(ctx):
    """Broadcasting over the lane axis must work (one scalar times many)."""
    p = ctx.p
    xs = _rand_elems(p, 5, seed=11)
    y = _rand_elems(p, 1, seed=12)[0]
    out = ctx.decode(jax.jit(ctx.mont_mul)(ctx.encode(xs), ctx.encode(y)))
    for i in range(5):
        assert out[i] == xs[i] * y % p
