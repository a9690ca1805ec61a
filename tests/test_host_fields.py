"""Host tower-field algebra tests (exact Python-int engine)."""

import random

from mathlib_tpu.host.fields import get_tower


def _rand_f2(rng, p):
    return (rng.randrange(p), rng.randrange(p))


def _rand_f6(rng, p):
    return tuple(_rand_f2(rng, p) for _ in range(3))


def _rand_f12(rng, p):
    return (_rand_f6(rng, p), _rand_f6(rng, p))


def test_f2_field_axioms(spec, rng):
    t = get_tower(spec)
    p = spec.p
    for _ in range(10):
        a, b, c = (_rand_f2(rng, p) for _ in range(3))
        assert t.f2_mul(a, t.f2_add(b, c)) == t.f2_add(t.f2_mul(a, b), t.f2_mul(a, c))
        assert t.f2_mul(a, b) == t.f2_mul(b, a)
        if not t.f2_is_zero(a):
            assert t.f2_mul(a, t.f2_inv(a)) == (1, 0)
    # u^2 == beta
    u = (0, 1)
    assert t.f2_mul(u, u) == (spec.beta % p, 0)


def test_f2_sqrt(spec, rng):
    t = get_tower(spec)
    p = spec.p
    for _ in range(5):
        a = _rand_f2(rng, p)
        sq = t.f2_mul(a, a)
        s = t.f2_sqrt(sq)
        assert s is not None
        assert t.f2_mul(s, s) == sq


def test_f6_f12_axioms(spec, rng):
    t = get_tower(spec)
    p = spec.p
    for _ in range(5):
        a6, b6 = _rand_f6(rng, p), _rand_f6(rng, p)
        assert t.f6_mul(a6, b6) == t.f6_mul(b6, a6)
        assert t.f6_mul(a6, t.f6_inv(a6)) == t.F6_ONE
        # v^3 == xi
        v = ((0, 0), (1, 0), (0, 0))
        v3 = t.f6_mul(t.f6_mul(v, v), v)
        assert v3 == ((spec.xi[0] % p, spec.xi[1] % p), (0, 0), (0, 0))

        a12, b12 = _rand_f12(rng, p), _rand_f12(rng, p)
        assert t.f12_mul(a12, b12) == t.f12_mul(b12, a12)
        assert t.f12_mul(a12, t.f12_inv(a12)) == t.F12_ONE
        # associativity spot check
        c12 = _rand_f12(rng, p)
        assert t.f12_mul(t.f12_mul(a12, b12), c12) == t.f12_mul(
            a12, t.f12_mul(b12, c12)
        )


def test_frobenius_matches_pow(spec, rng):
    """f12_frob must equal x -> x^p (the defining property)."""
    t = get_tower(spec)
    a = _rand_f12(rng, spec.p)
    assert t.f12_frob(a, 1) == t.f12_pow(a, spec.p)


def test_frobenius_order(spec, rng):
    t = get_tower(spec)
    a = _rand_f12(rng, spec.p)
    b = a
    for _ in range(12):
        b = t.f12_frob(b, 1)
    assert b == a
    # frob^6 == conjugation
    assert t.f12_frob(a, 6) == t.f12_conj(a)


def test_final_exp_in_cyclotomic_subgroup(spec, rng):
    t = get_tower(spec)
    a = _rand_f12(rng, spec.p)
    f = t.f12_final_exp(a)
    assert t.f12_pow(f, spec.r) == t.F12_ONE
    # conjugate == inverse on the subgroup
    assert t.f12_mul(f, t.f12_conj(f)) == t.F12_ONE


def test_final_exp_equals_plain_pow(spec, rng):
    """The Frobenius-decomposed multi-exp must equal the single big pow."""
    t = get_tower(spec)
    a = _rand_f12(rng, spec.p)
    assert t.f12_final_exp(a) == t.f12_pow(a, spec.final_exp)
