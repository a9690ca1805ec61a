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


def test_host_finish_product_glue(be):
    """The hostfexp product-check tail (BatchEngine._host_finish_product):
    device-layout (2, 3, 2, L, 1) unreduced product -> host final exp +
    unity.  The kernel producing that layout is covered by
    test_pairing_pallas.py::test_pairing_prod_kernel_body; this pins the
    decode + host-engine glue on both a unity and a non-unity product."""
    import numpy as np

    eng = be.host
    rng = random.Random(7)
    P = eng.g1.mul(eng.gen_g1, rng.randrange(2, be.spec.r))
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, be.spec.r))
    f1 = eng.miller_loop([(P, Q)])
    f2 = eng.miller_loop([(eng.g1.neg(P), Q)])
    from mathlib_tpu.host.fields import get_tower as get_host_tower

    ht = get_host_tower(be.spec)
    unity_prod = ht.f12_mul(f1, f2)
    enc = be.tw.f12_encode(unity_prod)  # (2, 3, 2, L, 1)
    assert enc.shape[-1] == 1
    assert be._host_finish_product(np.asarray(enc)) is True
    bad_prod = ht.f12_mul(f1, f1)
    enc = be.tw.f12_encode(bad_prod)
    assert be._host_finish_product(np.asarray(enc)) is False


@pytest.mark.slow  # pairing compile
def test_pairing_products_grouped(be):
    """Grouped product checks (pairing_products_are_one): per-group
    verdicts match single-check results.  On CPU (no Mosaic) this
    drives the fallback path; the fused grouped kernel is validated on
    the real chip by tools/profile_grouped_pairing.py before timing."""
    eng = be.host
    rng = random.Random(7)
    P = eng.g1.mul(eng.gen_g1, rng.randrange(2, be.spec.r))
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, be.spec.r))
    nP = eng.g1.neg(P)
    g1s = [P, nP, P, P, nP, P, P, nP]
    g2s = [Q] * 8
    got = be.pairing_products_are_one(g1s, g2s, 2)
    assert got == [True, False, True, True]
    # non-power-of-two group size takes the per-check fallback
    got3 = be.pairing_products_are_one(
        [P, nP, P] + [P, P, P], [Q] * 6, 3
    )
    assert got3[0] is False and got3[1] is False


@pytest.mark.slow  # pairing compile
def test_pairing_product_async(be):
    """pairing_product_is_one_async resolves to the synchronous answer."""
    eng = be.host
    rng = random.Random(8)
    P = eng.g1.mul(eng.gen_g1, rng.randrange(2, be.spec.r))
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, be.spec.r))
    r1 = be.pairing_product_is_one_async([P, eng.g1.neg(P)], [Q, Q])
    r2 = be.pairing_product_is_one_async([P, P], [Q, Q])
    assert r1() is True and r2() is False
