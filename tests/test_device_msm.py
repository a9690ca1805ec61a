"""Pippenger MSM vs the host-engine naive fold (math_test.go:323-346)."""

import random

import jax
import jax.numpy as jnp
import pytest

from mathlib_tpu.host.engine import get_engine
from mathlib_tpu.ops.g1 import get_g1_ctx
from mathlib_tpu.ops.msm import msm, msm_naive


@pytest.fixture(params=["BLS12_381", "BN254"])
def curve(request):
    from mathlib_tpu.curves.params import get_spec

    return get_spec(request.param)


def _setup(curve, n, seed=0):
    eng = get_engine(curve)
    g1 = get_g1_ctx(curve)
    rng = random.Random(seed)
    pts = [eng.g1.mul(eng.gen_g1, rng.randrange(1, curve.r)) for _ in range(n)]
    ks = [rng.randrange(curve.r) for _ in range(n)]
    return eng, g1, pts, ks


def test_msm_matches_host(curve):
    """Generic MSM with edge inputs: duplicate points (forces doubling in
    bucket sums), zero scalars, and infinity, at an odd size."""
    eng, g1, pts, ks = _setup(curve, 13, seed=1)
    pts = pts + [pts[0], pts[1], None]
    ks = ks + [ks[0], 0, 5]
    out = g1.decode_point(
        jax.jit(lambda p, s: msm(g1, p, s, c=4))(
            g1.encode_points(pts), g1.encode_scalars(ks)
        )
    )
    expect = eng.g1.msm([p for p in pts if p is not None], ks[:-1])
    assert out == expect


@pytest.mark.slow  # c=8 bucket-table compile on CPU is minutes
def test_msm_chunked_segments_c8():
    """n > 64 exercises the recursive chunked segment scan, with heavy
    digit duplication so bucket segments span chunk boundaries."""
    from mathlib_tpu.curves.params import get_spec

    curve = get_spec("BLS12_381")
    eng, g1, _, _ = _setup(curve, 0)
    rng = random.Random(7)
    base = [eng.g1.mul(eng.gen_g1, rng.randrange(1, curve.r)) for _ in range(8)]
    n = 70
    pts = [base[rng.randrange(8)] for _ in range(n)]
    ks = [rng.randrange(curve.r) for _ in range(n)]
    for i in range(0, n, 2):
        ks[i] = rng.randrange(16)  # collide digits -> long segments
    out = g1.decode_point(
        jax.jit(lambda p, s: msm(g1, p, s, c=8))(
            g1.encode_points(pts), g1.encode_scalars(ks)
        )
    )
    assert out == eng.g1.msm(pts, ks)


def test_msm_signed_digits_matches_host(curve):
    """Signed (balanced-digit) mode with the same edge inputs."""
    eng, g1, pts, ks = _setup(curve, 13, seed=2)
    pts = pts + [pts[0], pts[1], None]
    ks = ks + [ks[0], 0, 7]
    out = g1.decode_point(
        jax.jit(lambda p, s: msm(g1, p, s, c=4, signed=True))(
            g1.encode_points(pts), g1.encode_scalars(ks)
        )
    )
    expect = eng.g1.msm([p for p in pts if p is not None], ks[:-1])
    assert out == expect


def test_msm_capture_modes_cross_chunk():
    """Dense vs scatter segment capture must agree with the host oracle,
    including cross-chunk segment carries (K=4 chunks at n=16 with heavy
    digit collisions so segments span chunk boundaries)."""
    from mathlib_tpu.curves.params import get_spec

    curve = get_spec("BLS12_381")
    eng, g1, _, _ = _setup(curve, 0)
    rng = random.Random(11)
    base = [eng.g1.mul(eng.gen_g1, rng.randrange(1, curve.r)) for _ in range(4)]
    n = 16
    pts = [base[rng.randrange(4)] for _ in range(n)]
    ks = [rng.randrange(8) for _ in range(n)]  # tiny digits -> long segments
    ks[3] = rng.randrange(curve.r)
    expect = eng.g1.msm(pts, ks)
    enc_p, enc_s = g1.encode_points(pts), g1.encode_scalars(ks)
    for cap in ("dense", "scatter"):
        out = g1.decode_point(
            jax.jit(lambda p, s, _cap=cap: msm(g1, p, s, c=4, K=4, capture=_cap))(
                enc_p, enc_s
            )
        )
        assert out == expect, cap


def test_msm_dense_split_halves(monkeypatch):
    """When the dense-capture buffer would exceed the budget, the bucket
    table is computed in pointwise-added halves; force the path with a
    tiny budget and pin against the host oracle."""
    import mathlib_tpu.ops.msm as M
    from mathlib_tpu.curves.params import get_spec

    curve = get_spec("BLS12_381")
    eng, g1, pts, ks = _setup(curve, 16, seed=3)
    # budget between the N=16 and N=8 buffer sizes -> exactly one split
    nwin = M.n_windows(get_g1_ctx(curve), 4)
    monkeypatch.setattr(
        M, "_DENSE_CAPTURE_LIMIT", 12 * nwin * 3 * g1.fp.L * 4
    )
    out = g1.decode_point(
        jax.jit(lambda p, s: msm(g1, p, s, c=4, K=4))(
            g1.encode_points(pts), g1.encode_scalars(ks)
        )
    )
    assert out == eng.g1.msm(pts, ks)


def test_msm_naive_oracle():
    from mathlib_tpu.curves.params import get_spec

    curve = get_spec("BLS12_381")
    eng, g1, pts, ks = _setup(curve, 5, seed=4)
    out = g1.decode_point(
        jax.jit(lambda p, s: msm_naive(g1, p, s))(
            g1.encode_points(pts), g1.encode_scalars(ks)
        )
    )
    assert out == eng.g1.msm(pts, ks)


def test_glv_split_exact():
    """Device Barrett divmod split: k == k2*lam + k1 exactly, both < 2^128,
    for edge and random scalars (BLS12-381)."""
    import numpy as np

    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.ops.g1 import get_g1_ctx
    from mathlib_tpu.ops.msm import get_glv_ctx

    spec = get_spec("BLS12_381")
    g1 = get_g1_ctx(spec)
    gl = get_glv_ctx(g1)
    r, lam = spec.r, gl.lam
    import random as _r

    rng = _r.Random(99)
    ks = [0, 1, 2, lam - 1, lam, lam + 1, r - 1, r - 2, lam * lam % r] + [
        rng.randrange(r) for _ in range(23)
    ]
    scs = g1.encode_scalars(ks)
    k1, k2 = jax.jit(gl.split)(jnp.asarray(scs))
    k1 = np.asarray(k1)
    k2 = np.asarray(k2)
    for i, k in enumerate(ks):
        v1 = sum(int(k1[j, i]) << (16 * j) for j in range(k1.shape[0]))
        v2 = sum(int(k2[j, i]) << (16 * j) for j in range(k2.shape[0]))
        assert v1 + v2 * lam == k, f"split mismatch at {i}"
        assert v1 < lam and v2 < (1 << 128)


def test_msm_glv_matches_naive():
    """GLV MSM == naive oracle (math_test.go:323-346), incl. infinity
    inputs and edge scalars."""
    import numpy as np

    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.host.engine import get_engine
    from mathlib_tpu.ops.g1 import get_g1_ctx
    from mathlib_tpu.ops.msm import msm, msm_naive

    spec = get_spec("BLS12_381")
    g1 = get_g1_ctx(spec)
    eng = get_engine(spec)
    import random as _r

    rng = _r.Random(5)
    n = 64
    pts = [eng.g1.mul(eng.gen_g1, rng.randrange(2, spec.r)) for _ in range(n - 1)]
    pts.append(None)  # infinity input with a nonzero scalar
    ks = [0, 1, spec.r - 1] + [rng.randrange(spec.r) for _ in range(n - 3)]
    P = jnp.asarray(g1.encode_points(pts))
    S = jnp.asarray(g1.encode_scalars(ks))
    got = g1.decode_point(np.asarray(jax.jit(
        lambda p, s: msm(g1, p, s, c=4, glv=True))(P, S)))
    want = g1.decode_point(np.asarray(jax.jit(
        lambda p, s: msm_naive(g1, p, s))(P, S)))
    assert got == want


def test_msm_totals_host_horner_matches_full():
    """The host-Horner split (msm_totals + horner_host, the bench.py
    production path since round 5) == the all-device msm == the naive
    oracle, including an infinity input and edge scalars."""
    import numpy as np

    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.host.engine import get_engine
    from mathlib_tpu.ops.g1 import get_g1_ctx
    from mathlib_tpu.ops.msm import horner_host, msm, msm_naive, msm_totals

    spec = get_spec("BLS12_381")
    g1 = get_g1_ctx(spec)
    eng = get_engine(spec)
    import random as _r

    rng = _r.Random(9)
    n = 64
    pts = [eng.g1.mul(eng.gen_g1, rng.randrange(2, spec.r)) for _ in range(n - 1)]
    pts.append(None)
    ks = [0, 1, spec.r - 1] + [rng.randrange(spec.r) for _ in range(n - 3)]
    P = jnp.asarray(g1.encode_points(pts))
    S = jnp.asarray(g1.encode_scalars(ks))
    want = g1.decode_point(
        np.asarray(jax.jit(lambda p, s: msm_naive(g1, p, s))(P, S))
    )
    for glv in (False, True):
        tot = jax.jit(
            lambda p, s, g=glv: msm_totals(g1, p, s, c=4, glv=g)
        )(P, S)
        got = horner_host(g1, np.asarray(tot), 4)
        assert got == want, ("host horner", glv)
