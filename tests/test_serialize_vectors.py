"""Known-answer serialization pins from public standards.

The BLS12-381 generator encodings below are the canonical public values from
the BLS12-381 ciphersuite (as used by ZCash / Ethereum 2.0 / the IETF BLS
signature draft); kilic and gnark both produce these bytes, so they pin our
codec against the reference backends without running Go."""

from mathlib_tpu.api import CurveID, Curves

G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)
G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
    "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
    "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)


def test_bls12_381_generator_encodings():
    for cid in (CurveID.BLS12_381, CurveID.BLS12_381_GURVY, CurveID.BLS12_381_BBS):
        c = Curves[cid]
        assert c.GenG1.Compressed() == G1_GEN_COMPRESSED
        assert c.GenG2.Compressed() == G2_GEN_COMPRESSED
        # uncompressed = compressed with C flag cleared, plus y
        assert c.GenG1.Bytes()[0] == G1_GEN_COMPRESSED[0] & 0x1F
        assert c.GenG1.Bytes()[:48][1:] == G1_GEN_COMPRESSED[1:]


def test_zcash_infinity_flags():
    c = Curves[CurveID.BLS12_381]
    inf = c.NewG1()
    assert inf.Compressed()[0] == 0xC0
    assert inf.Bytes()[0] == 0x40
    assert all(b == 0 for b in inf.Compressed()[1:])


def test_scalar_negative_twos_complement():
    """driver/common/big.go:25-39: negative scalars canonicalize mod r."""
    c = Curves[CurveID.BLS12_381]
    r = c.GroupOrder.BigInt()
    m1 = c.NewZrFromInt(-1)
    assert int.from_bytes(m1.Bytes(), "big") == r - 1
    # GroupOrder itself serializes as r (the > vs >= quirk, big.go:104)
    assert int.from_bytes(c.GroupOrder.Bytes(), "big") == r


def test_gnark_uncompressed_infinity_all_zero():
    c = Curves[CurveID.BN254]
    assert c.NewG1().Bytes() == bytes(64)
    assert c.NewG1().Compressed()[0] == 0x40
    c377 = Curves[CurveID.BLS12_377_GURVY]
    assert c377.NewG1().Bytes() == bytes(96)


def test_amcl_prefixes():
    c = Curves[CurveID.FP256BN_AMCL]
    b = c.GenG1.Bytes()
    assert b[0] == 0x04 and len(b) == 65
    comp = c.GenG1.Compressed()
    assert comp[0] in (0x02, 0x03) and len(comp) == 33


def test_bls12_377_g2_generator_pinned():
    """The G2 generator is the published zexe/arkworks value that gnark's
    bls12377.Generators() returns (driver/gurvy/bls12-377.go:266-273),
    validated on-twist and order-r at spec build; these bytes pin the gnark
    wire encoding of it."""
    c = Curves[CurveID.BLS12_377_GURVY]
    assert c.GenG2.Compressed().hex() == (
        "c0ea6040e700403170dc5a51b1b140d5532777ee6651cecbe7223ece0799c9de"
        "5cf89984bff76fe6b26bfefa6ea16afe018480be71c785fec89630a2a3841d01"
        "c565f071203e50317ea501f557db6b9b71889f52bb53540274e3e48f7c005196"
    )
    assert c.GenG2.Bytes().hex().startswith(
        "00ea6040e700403170dc5a51b1b140d5532777ee6651cecbe7223ece0799c9de"
    )
    assert len(c.GenG2.Bytes()) == 192


def test_miracl_g2_wire_format():
    """fp256bn_miracl.go:110-125: G2 4*MODBYTES+1 / 2*MODBYTES+1 with
    miracl-core's 0x04 / 0x02|sgn0 prefixes; the legacy AMCL ID keeps the
    bare 128-byte layout — the two FP256BN IDs genuinely differ."""
    m = Curves[CurveID.FP256BN_AMCL_MIRACL]
    a = Curves[CurveID.FP256BN_AMCL]
    assert (m.G2ByteSize, m.CompressedG2ByteSize) == (129, 65)
    assert (a.G2ByteSize, a.CompressedG2ByteSize) == (128, 128)
    g = m.GenG2.Mul(m.NewZrFromInt(9))
    b, cb = g.Bytes(), g.Compressed()
    assert len(b) == 129 and b[0] == 0x04
    assert len(cb) == 65 and cb[0] in (0x02, 0x03)
    for raw in (b, cb):
        got, err = m.NewG2FromBytes(raw) if len(raw) == 129 else m.NewG2FromCompressed(raw)
        assert err is None and got.Equals(g)
    # same point, different bytes on the legacy ID
    ga = a.GenG2.Mul(a.NewZrFromInt(9))
    assert ga.Bytes() != b and len(ga.Bytes()) == 128


def test_bls12_381_generator_uncompressed_full():
    """Full uncompressed generator bytes incl. the y coordinates — the
    published BLS12-381 ciphersuite values (IETF BLS signatures draft /
    RFC 9380 curve parameters).  Pins y-recovery and the G2 Fp2
    coordinate order (c1 || c0 per coordinate, ZCash convention) that the
    compressed-only pins above cannot see."""
    c = Curves[CurveID.BLS12_381]
    assert c.GenG1.Bytes().hex() == (
        "17f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
        "6c55e83ff97a1aeffb3af00adb22c6bb"
        "08b3f481e3aaa0f1a09e30ed741d8ae4fcf5e095d5d00af600db18cb2c04b3ed"
        "d03cc744a2888ae40caa232946c5e7e1"
    )
    assert c.GenG2.Bytes().hex() == (
        # x = c1 || c0
        "13e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
        "334cf11213945d57e5ac7d055d042b7e"
        "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647ae3d177"
        "0bac0326a805bbefd48056c8c121bdb8"
        # y = c1 || c0
        "0606c4a02ea734cc32acd2b02bc28b99cb3e287e85a763af267492ab572e99ab"
        "3f370d275cec1da1aaa9075ff05f79be"
        "0ce5d527727d6e118cc9cdc6da2e351aadfd9baa8cbdd3a76d429a695160d12c"
        "923ac9cc3baca289e193548608b82801"
    )


def test_bn254_eip196_add_vector():
    """[2](1, 2) on alt_bn128 equals the public EIP-196 precompile test
    vector (x = 13680151794899547013904003590785796930435194473311139789
    18064868415326638035, y = 9918110051302171585080402603319702774565515
    993150576347155970296011118125764) — an external pin on BN254 group
    arithmetic AND the gnark uncompressed wire layout (32-byte BE x || y,
    bn254.go:307-329)."""
    c = Curves[CurveID.BN254]
    two = c.GenG1.Mul(c.NewZrFromInt(2))
    assert two.Bytes().hex() == (
        "030644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd3"
        "15ed738c0e0a7c92e7845f96b2ae9c0a68a6a449e3538fc7ff3ebf7a5a18a2c4"
    )
    # additive consistency: G + G == [2]G through the API add
    g = c.GenG1.Copy()
    g.Add(c.GenG1)
    assert g.Bytes() == two.Bytes()


def test_gnark_compressed_flag_bytes():
    """gnark-crypto BN254/BLS12-377 compressed flags (driver seam:
    bn254.go:307-329): top two bits 10 = compressed-smallest-y,
    11 = compressed-largest-y, 01 = compressed infinity, 00 =
    uncompressed.  The generator (1, 2) has y = 2 < p - 2, so its
    compressed form is exactly 0x80 || 31 zero bytes || 0x01."""
    c = Curves[CurveID.BN254]
    assert c.GenG1.Compressed().hex() == (
        "8000000000000000000000000000000000000000000000000000000000000001"
    )
    assert c.NewG1().Compressed()[0] == 0x40  # compressed infinity
    # -G has the lexicographically larger y -> 0xC0 flag, same x bytes
    neg = c.GenG1.Copy()
    neg.Neg()
    nb = neg.Compressed()
    assert nb[0] == 0xC0 and nb[1:] == c.GenG1.Compressed()[1:]
    # round-trips through the flag decoder
    got, err = c.NewG1FromCompressed(nb)
    assert err is None and got.Equals(neg)
    c377 = Curves[CurveID.BLS12_377_GURVY]
    n377 = c377.GenG1.Copy()
    n377.Neg()
    assert (c377.GenG1.Compressed()[0] & 0xC0, n377.Compressed()[0] & 0xC0) in (
        ((0x80, 0xC0)),
        ((0xC0, 0x80)),
    )


def test_gt_bytes_format_frozen():
    """Gt wire format: 576 B = 12 Fp coefficients for BLS12-381 (the kilic
    layout, driver/kilic/bls12-381.go:330-334).  The digest below freezes
    the round-3 bytes against regression.  Since round 4 the layout and the
    pairing value are ALSO pinned by an algorithmically independent oracle
    (tests/test_independent_pairing.py: polynomial-basis Fp12, integer
    final exp, its own byte emitter) — a coefficient-order swap fails
    there even if this digest were regenerated."""
    import hashlib

    k = Curves[CurveID.BLS12_381]
    b = k.GenGt.Bytes()
    assert len(b) == 576
    assert (
        hashlib.sha256(b).hexdigest()
        == "300e47c99502f3af33ad2080847d528cabd90365a90ab98bc174565c27928591"
    )
    # first coefficient is nonzero (a sanity guard for all-zero layouts)
    assert any(b[:48])
    got, err = k.NewGtFromBytes(b)
    assert err is None and got.Equals(k.GenGt)
