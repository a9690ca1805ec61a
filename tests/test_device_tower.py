"""Device tower fields vs the exact host tower (differential oracle)."""

import random

import jax
import numpy as np
import pytest

from mathlib_tpu.host.fields import get_tower
from mathlib_tpu.ops.tower import get_tower_ctx
from mathlib_tpu.ops.field import bits_of


@pytest.fixture
def tw(spec):
    return get_tower_ctx(spec)


@pytest.fixture
def ht(spec):
    return get_tower(spec)


def _rand_f2(p, rng):
    return (rng.randrange(p), rng.randrange(p))


def _rand_f6(p, rng):
    return tuple(_rand_f2(p, rng) for _ in range(3))


def _rand_f12(p, rng):
    return (_rand_f6(p, rng), _rand_f6(p, rng))


def _enc2(tw, elems):
    return np.stack([tw.f2_encode(e) for e in elems], axis=-1).reshape(
        2, tw.fp.L, len(elems)
    )


def test_f2_ops(tw, ht, spec):
    rng = random.Random(1)
    n = 4
    xs = [_rand_f2(spec.p, rng) for _ in range(n)]
    ys = [_rand_f2(spec.p, rng) for _ in range(n)]
    a = np.concatenate([tw.f2_encode(x) for x in xs], axis=-1)
    b = np.concatenate([tw.f2_encode(y) for y in ys], axis=-1)
    mul = tw.f2_decode(jax.jit(tw.f2_mul)(a, b))
    add = tw.f2_decode(jax.jit(tw.f2_add)(a, b))
    inv = tw.f2_decode(jax.jit(tw.f2_inv)(a))
    xi = tw.f2_decode(jax.jit(tw.f2_mul_xi)(a))
    conj = tw.f2_decode(jax.jit(tw.f2_conj)(a))
    for i in range(n):
        assert mul[i] == ht.f2_mul(xs[i], ys[i])
        assert add[i] == ht.f2_add(xs[i], ys[i])
        assert inv[i] == ht.f2_inv(xs[i])
        assert xi[i] == ht.f2_mul_xi(xs[i])
        assert conj[i] == ht.f2_conj(xs[i])


def test_f6_mul_inv(tw, ht, spec):
    rng = random.Random(2)
    x, y = _rand_f6(spec.p, rng), _rand_f6(spec.p, rng)
    a, b = tw.f6_encode(x), tw.f6_encode(y)
    out = jax.jit(tw.f6_mul)(a, b)
    got = [tuple(tw.f2_decode(np.asarray(out)[j])[0] for j in range(3))]
    assert got[0] == ht.f6_mul(x, y)
    inv = jax.jit(tw.f6_inv)(a)
    gi = tuple(tw.f2_decode(np.asarray(inv)[j])[0] for j in range(3))
    assert gi == ht.f6_inv(x)


def test_f12_mul_sqr_inv_conj(tw, ht, spec):
    rng = random.Random(3)
    x, y = _rand_f12(spec.p, rng), _rand_f12(spec.p, rng)
    a, b = tw.f12_encode(x), tw.f12_encode(y)
    assert tw.f12_decode(jax.jit(tw.f12_mul)(a, b))[0] == ht.f12_mul(x, y)
    assert tw.f12_decode(jax.jit(tw.f12_sqr)(a))[0] == ht.f12_sqr(x)
    assert tw.f12_decode(jax.jit(tw.f12_inv)(a))[0] == ht.f12_inv(x)
    assert tw.f12_decode(jax.jit(tw.f12_conj)(a))[0] == ht.f12_conj(x)


def test_f12_frob(tw, ht, spec):
    rng = random.Random(4)
    x = _rand_f12(spec.p, rng)
    a = tw.f12_encode(x)
    for n in (1, 2, 3):
        got = tw.f12_decode(jax.jit(lambda v, n=n: tw.f12_frob(v, n))(a))[0]
        assert got == ht.f12_frob(x, n), f"frobenius {n} mismatch"


def test_f12_pow(tw, ht, spec):
    rng = random.Random(5)
    x = _rand_f12(spec.p, rng)
    e = 0xABCDEF0123456789
    got = tw.f12_decode(
        jax.jit(lambda v: tw.f12_pow_bits(v, bits_of(e)))(tw.f12_encode(x))
    )[0]
    assert got == ht.f12_pow(x, e)


@pytest.mark.slow  # XLA:CPU compile of the final-exp scan chain is minutes/curve
def test_f12_final_exp(tw, ht, spec):
    rng = random.Random(6)
    x = _rand_f12(spec.p, rng)
    got = tw.f12_decode(jax.jit(tw.f12_final_exp)(tw.f12_encode(x)))[0]
    assert got == ht.f12_final_exp(x)


def test_f12_is_one(tw, ht):
    one = tw.f12_encode(ht.F12_ONE)
    z = tw.f12_encode(ht.F12_ZERO)
    both = np.concatenate([one, z], axis=-1)
    out = np.asarray(jax.jit(tw.f12_is_one)(both))
    assert list(out) == [True, False]
