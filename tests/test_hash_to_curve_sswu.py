"""SSWU hash-to-curve with the derived 11-isogeny (BLS12-381 G1).

The isogeny data in curves/isogeny_data.py was derived from first
principles (tools/derive_isogeny.py) and reproduces the RFC 9380
BLS12381G1_XMD:SHA-256_SSWU_RO_ ciphersuite exactly — pinned here by the
published test vectors (RFC 9380 J.9.1), which double as the byte-equality
contract against the reference backends' HashToG1
(kilic/bls12-381.go:410-434, math_test.go:879-911).
"""

import pytest

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.host.engine import get_engine
from mathlib_tpu.host.hash_to_curve import get_hasher

DST = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"

# RFC 9380 J.9.1 (BLS12381G1_XMD:SHA-256_SSWU_RO_) expected P.x for msg=""
VEC_EMPTY_X = 0x052926ADD2207B76CA4FA57A8734416C8DC95E24501772C814278700EED6D1E4E8CF62D9C09DB0FAC349612B759E79A1


@pytest.fixture(scope="module")
def setup():
    spec = get_spec("BLS12_381")
    return spec, get_engine(spec), get_hasher(spec)


def test_rfc_vector_empty_msg(setup):
    spec, eng, h = setup
    P = h.hash_to_g1(b"", DST)
    assert P[0] == VEC_EMPTY_X, hex(P[0])


def test_sswu_on_curve_in_subgroup(setup):
    spec, eng, h = setup
    for i in range(4):
        P = h.hash_to_g1(b"msg-%d" % i, b"SOME-DST")
        assert eng.g1.is_on_curve(P)
        assert eng.g1.mul(P, spec.r) is None
    assert h.hash_to_g1(b"m", b"d") == h.hash_to_g1(b"m", b"d")
    assert h.hash_to_g1(b"m", b"d") != h.hash_to_g1(b"m", b"d2")


def test_bbs_variant(setup):
    """The BBS+ big-endian-sign variant (kilic/custom.go:134-237) rides the
    same derived isogeny with Blake2b expansion + BE sign convention."""
    spec, eng, h = setup
    P = h.hash_to_g1_bbs(b"bbs-message", b"")
    assert eng.g1.is_on_curve(P)
    assert eng.g1.mul(P, spec.r) is None
    assert h.hash_to_g1_bbs(b"bbs-message", b"") == P
    assert h.hash_to_g1_bbs(b"other", b"") != P


def test_rfc_compatibility_flags(setup):
    spec, eng, h = setup
    assert h.is_rfc_compatible("g1") is True
    assert h.is_rfc_compatible("g2") is True


def test_g2_sswu(setup):
    """G2 SSWU rides the derived 3-isogeny (A' = 240u, B' = 1012(1+u) —
    the RFC 9380 8.8.2 constants) with the ciphersuite h_eff; exact J.10.1
    vector parity is pinned in test_hash_vectors.py."""
    spec, eng, h = setup
    for i in range(3):
        Q = h.hash_to_g2(b"g2-%d" % i, b"G2-DST")
        assert eng.g2.is_on_curve(Q)
        assert eng.g2.mul(Q, spec.r) is None
    assert h.hash_to_g2(b"a", b"d") == h.hash_to_g2(b"a", b"d")
    assert h.hash_to_g2(b"a", b"d") != h.hash_to_g2(b"b", b"d")


def test_bls12_377_g1_sswu_via_2_isogeny():
    """BLS12-377 G1 rides the derived 2-isogeny (E': y^2 = x^3 - 15x + 22
    before rescale; tools/derive_isogeny_377.py) instead of the SVDW
    fallback; gnark seam: driver/gurvy/bls12-377.go:386-420."""
    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.host.engine import get_engine
    from mathlib_tpu.host.hash_to_curve import get_hasher

    spec = get_spec("BLS12_377")
    eng, h = get_engine(spec), get_hasher(spec)
    assert h.is_rfc_compatible("g1") is True
    for i in range(3):
        P = h.hash_to_g1(b"m%d" % i, b"BLS12377G1-DST")
        assert eng.g1.is_on_curve(P)
        assert eng.g1.mul(P, spec.r) is None
    assert h.hash_to_g1(b"a", b"d") == h.hash_to_g1(b"a", b"d")


def test_budroni_pintore_equals_h_eff_on_381():
    """The psi-based BLS12 G2 cofactor clearing (eprint 2017/419 §4.1 —
    what gnark's ClearCofactor implements) must agree with the RFC 9380
    8.8.2 effective cofactor on arbitrary twist points, pinning the psi
    convention."""
    import random

    from mathlib_tpu.curves import isogeny_data as iso
    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.host.engine import get_engine
    from mathlib_tpu.host.hash_to_curve import get_hasher

    spec = get_spec("BLS12_381")
    eng, h = get_engine(spec), get_hasher(spec)
    t, rng = eng.tw, random.Random(5)
    while True:
        x = (rng.randrange(spec.p), rng.randrange(spec.p))
        y = t.f2_sqrt(t.f2_add(t.f2_mul(t.f2_mul(x, x), x), spec.b2))
        if y is not None:
            break
    Q = (x, y)
    xp = spec.x
    bp = eng.g2.add(
        h._g2_mul_signed(Q, xp * xp - xp - 1),
        eng.g2.add(
            h.psi(h._g2_mul_signed(Q, xp - 1)), h.psi(h.psi(eng.g2.add(Q, Q)))
        ),
    )
    assert bp == eng.g2.mul(Q, iso.G2["BLS12_381"]["h_eff"])


def test_bn254_fuentes_castaneda_r_torsion():
    """BN254 G2 cofactor clearing via [x]P + psi([3x]P) + psi^2([x]P) +
    psi^3(P) (Fuentes-Castaneda, gnark's BN254 method) lands in the
    r-torsion from arbitrary twist points."""
    import random

    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.host.engine import get_engine
    from mathlib_tpu.host.hash_to_curve import get_hasher

    spec = get_spec("BN254")
    eng, h = get_engine(spec), get_hasher(spec)
    t, rng = eng.tw, random.Random(11)
    while True:
        x = (rng.randrange(spec.p), rng.randrange(spec.p))
        y = t.f2_sqrt(t.f2_add(t.f2_mul(t.f2_mul(x, x), x), spec.b2))
        if y is not None:
            break
    out = h._clear_cofactor_g2((x, y))
    assert out is not None
    assert eng.g2.mul(out, spec.r) is None


def test_amcl_legacy_bls_hash():
    """FP256BN legacy Bls_hash (SHAKE-256 + ECP_mapit, even-y): on curve,
    deterministic, self-pinned against regression."""
    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.host.engine import get_engine
    from mathlib_tpu.host.hash_to_curve import get_hasher

    spec = get_spec("FP256BN")
    eng, h = get_engine(spec), get_hasher(spec)
    P = h.amcl_bls_hash(b"abc")
    assert eng.g1.is_on_curve(P)
    assert P[1] % 2 == 0  # even-y selection (NewECPbigint(x, 0))
    assert P[0] == 0x483366601360A8771C6863080CC4114D8DB44530F8F1E1EE4F94EA37E78B5739
    assert h.amcl_bls_hash(b"abc") == P
    assert h.amcl_bls_hash(b"abd") != P
