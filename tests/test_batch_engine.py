"""BatchEngine end-to-end flows (BLS sign/verify, pairing product)."""

import random

import pytest

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.batch import get_batch_engine


@pytest.fixture(scope="module")
def be():
    return get_batch_engine(get_spec("BLS12_381"))


def test_msm_and_scalar_mul(be):
    eng = be.host
    rng = random.Random(1)
    pts = [eng.g1.mul(eng.gen_g1, rng.randrange(1, be.spec.r)) for _ in range(6)]
    ks = [rng.randrange(be.spec.r) for _ in range(6)]
    assert be.g1_msm(pts, ks, c=4) == eng.g1.msm(pts, ks)
    got = be.g1_scalar_mul(pts[:2], ks[:2])
    assert got == [eng.g1.mul(pts[i], ks[i]) for i in range(2)]


@pytest.mark.slow  # pairing compile
def test_pairing_batch_and_product(be):
    eng = be.host
    rng = random.Random(2)
    a = rng.randrange(2, be.spec.r)
    P = eng.g1.mul(eng.gen_g1, a)
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, be.spec.r))
    out = be.pairing_batch([P], [Q])
    assert out[0] == eng.pairing(P, Q)
    # e(P,Q) * e(-P,Q) == 1
    assert be.pairing_product_is_one([P, eng.g1.neg(P)], [Q, Q]) is True
    assert be.pairing_product_is_one([P, P], [Q, Q]) is False


@pytest.mark.slow  # pairing compile (verify) on CPU
def test_bls_sign_verify(be):
    sk = 0x2A2B2C
    pk = be.host.g2.mul(be.host.gen_g2, sk)
    msgs = [b"msg-1", b"msg-2", b"msg-3"]
    sigs = be.bls_sign_batch(sk, msgs, dst=b"TEST-DST")
    assert be.bls_verify_batch(pk, sigs, msgs, dst=b"TEST-DST") is True
    bad = sigs[:2] + [be.host.g1.mul(be.host.gen_g1, 5)]
    assert be.bls_verify_batch(pk, bad, msgs, dst=b"TEST-DST") is False
