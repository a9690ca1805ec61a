"""Device G1 group law vs the exact host engine (differential oracle).

Points are (3, L, N): coordinates, limbs (sublanes), batch (lanes).
"""

import random

import jax
import numpy as np
import pytest

from mathlib_tpu.host.engine import get_engine
from mathlib_tpu.ops.g1 import get_g1_ctx


@pytest.fixture
def g1(spec):
    return get_g1_ctx(spec)


@pytest.fixture
def eng(spec):
    return get_engine(spec)


def _rand_points(eng, n, seed=0):
    rng = random.Random(seed)
    return [eng.g1.mul(eng.gen_g1, rng.randrange(1, eng.spec.r)) for _ in range(n)]


def test_point_roundtrip(g1, eng):
    pts = _rand_points(eng, 3, seed=1) + [None]
    arr = g1.encode_points(pts)
    assert arr.shape == (3, g1.fp.L, 4)
    assert g1.decode_points(arr) == pts


def test_double(g1, eng):
    pts = _rand_points(eng, 4, seed=2) + [None]
    out = g1.decode_points(jax.jit(g1.double)(g1.encode_points(pts)))
    for P, R in zip(pts, out):
        assert R == eng.g1.double(P)


def test_add_generic_and_edges(g1, eng):
    pts = _rand_points(eng, 3, seed=3)
    P, Q, W = pts
    cases = [
        (P, Q),          # generic
        (P, P),          # doubling case (complete formulas, no branch)
        (P, eng.g1.neg(P)),  # P + (-P) = inf
        (None, Q),       # inf + Q
        (P, None),       # P + inf
        (None, None),    # inf + inf
        (W, Q),
    ]
    a = g1.encode_points([c[0] for c in cases])
    b = g1.encode_points([c[1] for c in cases])
    out = g1.decode_points(jax.jit(g1.add)(a, b))
    for (x, y), R in zip(cases, out):
        assert R == eng.g1.add(x, y)


def test_scalar_mul(g1, eng):
    rng = random.Random(4)
    pts = _rand_points(eng, 3, seed=5) + [None]
    ks = [rng.randrange(eng.spec.r) for _ in range(3)] + [7]
    out = g1.decode_points(
        jax.jit(g1.scalar_mul)(g1.encode_points(pts), g1.encode_scalars(ks))
    )
    for P, k, R in zip(pts, ks, out):
        assert R == eng.g1.mul(P, k) if P is not None else R is None


def test_scalar_mul_edge_scalars(g1, eng):
    P = _rand_points(eng, 1, seed=6)[0]
    ks = [0, 1, 2, eng.spec.r - 1]
    pts = [P] * len(ks)
    out = g1.decode_points(
        jax.jit(g1.scalar_mul)(g1.encode_points(pts), g1.encode_scalars(ks))
    )
    for k, R in zip(ks, out):
        assert R == eng.g1.mul(P, k)


def test_scalar_mul_broadcast_single_point(g1, eng):
    """One point (3, L, 1) against many scalars broadcasts over lanes."""
    P = _rand_points(eng, 1, seed=12)[0]
    ks = [3, 19, 1077]
    out = g1.decode_points(
        jax.jit(g1.scalar_mul)(g1.encode_point(P), g1.encode_scalars(ks))
    )
    for k, R in zip(ks, out):
        assert R == eng.g1.mul(P, k)


def test_mul2(g1, eng):
    rng = random.Random(7)
    P, Q = _rand_points(eng, 2, seed=8)
    e, f = rng.randrange(eng.spec.r), rng.randrange(eng.spec.r)
    out = g1.decode_points(
        jax.jit(g1.mul2)(
            g1.encode_point(P),
            g1.encode_scalars([e]),
            g1.encode_point(Q),
            g1.encode_scalars([f]),
        )
    )[0]
    assert out == eng.g1.mul2(P, e, Q, f)


def test_eq_neg_sub(g1, eng):
    P, Q = _rand_points(eng, 2, seed=9)
    arrP, arrQ = g1.encode_points([P, P]), g1.encode_points([P, Q])
    eqs = np.asarray(jax.jit(g1.eq)(arrP, arrQ))
    assert list(eqs) == [True, False]
    # sub: P - Q == P + (-Q)
    out = g1.decode_points(
        jax.jit(g1.sub)(g1.encode_point(P), g1.encode_point(Q))
    )
    assert out[0] == eng.g1.add(P, eng.g1.neg(Q))


def test_to_affine(g1, eng):
    pts = _rand_points(eng, 2, seed=10) + [None]
    arr = jax.jit(g1.double)(g1.encode_points(pts))  # non-trivial Z
    x, y = jax.jit(g1.to_affine)(arr)
    xs, ys = g1.fp.decode(np.asarray(x)), g1.fp.decode(np.asarray(y))
    for i, P in enumerate(pts):
        expect = eng.g1.double(P)
        if expect is None:
            assert (xs[i], ys[i]) == (0, 0)
        else:
            assert (xs[i], ys[i]) == expect


def test_sum_reduce(g1, eng):
    pts = _rand_points(eng, 7, seed=11) + [None]
    out = g1.decode_point(jax.jit(g1.sum_reduce)(g1.encode_points(pts)))
    expect = None
    for P in pts:
        expect = eng.g1.add(expect, P)
    assert out == expect
