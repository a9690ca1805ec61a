"""Host pairing engine tests: group laws, bilinearity, reference pins.

Mirrors the property suites of the reference (math_test.go:272-470) at the
engine level; the API-level port lives in test_api_mathlib.py."""

from mathlib_tpu.host.engine import get_engine


def test_generators_pinned(spec):
    """G1 generators and group orders pinned by math_test.go:250-270."""
    e = get_engine(spec)
    assert e.g1.is_on_curve(spec.g1_gen)
    assert e.g2.is_on_curve(spec.g2_gen)
    assert e.g1.mul(spec.g1_gen, spec.r) is None
    assert e.g2.mul(spec.g2_gen, spec.r) is None


def test_g1_group_law(spec, rng):
    e = get_engine(spec)
    G = spec.g1_gen
    g35 = e.g1.mul(G, 35)
    g23 = e.g1.mul(G, 23)
    g58 = e.g1.mul(G, 58)
    assert e.g1.add(g35, g23) == g58  # math_test.go:282-288
    assert e.g1.sub(g58, g23) == g35
    assert e.g1.mul2(G, 35, G, 23) == g58
    assert e.g1.add(g35, e.g1.neg(g35)) is None


def test_g2_group_law(spec, rng):
    e = get_engine(spec)
    G = spec.g2_gen
    assert e.g2.add(e.g2.mul(G, 35), e.g2.mul(G, 23)) == e.g2.mul(G, 58)
    a = rng.randrange(1, spec.r)
    b = rng.randrange(1, spec.r)
    assert e.g2.mul(e.g2.mul(G, a), b) == e.g2.mul(G, a * b % spec.r)


def test_bilinearity(spec, rng):
    e = get_engine(spec)
    a = rng.randrange(1, spec.r)
    b = rng.randrange(1, spec.r)
    Pa = e.g1.mul(spec.g1_gen, a)
    Qb = e.g2.mul(spec.g2_gen, b)
    gt = e.gen_gt()
    assert e.pairing(Pa, Qb) == e.gt_exp(gt, a * b % spec.r)
    # both slots (math_test.go:423-434)
    assert e.pairing(Pa, spec.g2_gen) == e.pairing(spec.g1_gen, e.g2.mul(spec.g2_gen, a))


def test_gt_properties(spec):
    e = get_engine(spec)
    gt = e.gen_gt()
    assert not e.gt_is_one(gt)
    assert e.gt_is_one(e.gt_exp(gt, spec.r))
    assert e.gt_is_one(e.gt_mul(gt, e.gt_inv(gt)))


def test_pairing2_product(spec, rng):
    """Pairing2(p,q,r,s) == e(p,q)*e(r,s) (math_test.go:444-455)."""
    e = get_engine(spec)
    r1, r2, r3, r4 = (rng.randrange(1, spec.r) for _ in range(4))
    p = e.g2.mul(spec.g2_gen, r1)
    q = e.g1.mul(spec.g1_gen, r2)
    rr = e.g2.mul(spec.g2_gen, r3)
    s = e.g1.mul(spec.g1_gen, r4)
    tt1 = e.final_exp(e.miller_loop([(q, p), (s, rr)]))
    tt2 = e.gt_mul(e.pairing(q, p), e.pairing(s, rr))
    assert tt1 == tt2


def test_pairing_with_infinity(spec):
    e = get_engine(spec)
    assert e.gt_is_one(e.pairing(None, spec.g2_gen))
    assert e.gt_is_one(e.pairing(spec.g1_gen, None))
