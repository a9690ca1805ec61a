"""Device-side SSWU hash-to-G1 vs the exact host path (and RFC 9380).

The host path is itself pinned byte-for-byte against RFC 9380 J.9.1 in
test_hash_vectors.py; proving device == host therefore pins the device
pipeline to the RFC vectors transitively.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.host.hash_to_curve import get_hasher
from mathlib_tpu.ops.hash import get_hash_g1_ctx, hash_to_g1_batch

SPEC = get_spec("BLS12_381")
DST = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"
MSGS = [b"", b"abc", b"abcdef0123456789", b"q128_" + b"q" * 128]


def test_device_hash_to_g1_matches_host():
    hasher = get_hasher(SPEC)
    ctx = get_hash_g1_ctx(SPEC)
    out = hash_to_g1_batch(SPEC, MSGS, DST)
    got = ctx.g1.decode_points(np.asarray(out))
    want = [hasher.hash_to_g1(m, DST) for m in MSGS]
    assert got == want


def test_device_sswu_map_matches_host():
    """The bare map (pre-isogeny) against the host SswuMap on E'."""
    hasher = get_hasher(SPEC)
    ctx = get_hash_g1_ctx(SPEC)
    m, _iso = hasher._g1_sswu
    us = [0, 1, 5, SPEC.p - 1, 0xDEADBEEF % SPEC.p, pow(7, 99, SPEC.p)]
    u = ctx.fp.encode(us)
    x, y = jax.jit(ctx.sswu)(u)
    got = list(zip(ctx.fp.decode(np.asarray(x)), ctx.fp.decode(np.asarray(y))))
    want = [m.map(v) for v in us]
    assert [(int(a), int(b)) for a, b in got] == want


def test_device_hash_to_g1_bbs_sign():
    """The big-endian-sign variant agrees with the host BBS mapping."""
    hasher = get_hasher(SPEC)
    ctx = get_hash_g1_ctx(SPEC)
    dst = b"BBS_BLS12381G1_XMD:BLAKE2B_SSWU_RO_"
    msgs = [b"", b"hello bbs", b"x" * 100]
    # reproduce the host from64Bytes embedding, then run the device map
    from mathlib_tpu.host.hash_to_curve import expand_message_xmd

    u0s, u1s = [], []
    for msg in msgs:
        uniform = expand_message_xmd(msg, dst, 128, "blake2b512")
        us = []
        for i in range(2):
            chunk = uniform[i * 64 : (i + 1) * 64]
            e0 = int.from_bytes(chunk[:32], "big")
            e1 = int.from_bytes(chunk[32:], "big")
            us.append((e1 + e0 * (1 << 256)) % SPEC.p)
        u0s.append(us[0])
        u1s.append(us[1])
    out = jax.jit(lambda a, b: ctx.hash_to_g1(a, b, "be"), static_argnums=())(
        ctx.fp.encode(u0s), ctx.fp.encode(u1s)
    )
    got = ctx.g1.decode_points(np.asarray(out))
    want = [hasher.hash_to_g1_bbs(m, dst) for m in msgs]
    assert got == want


def test_device_hash_gate_rejects_non_sswu():
    with pytest.raises(ValueError):
        get_hash_g1_ctx(get_spec("BLS12_377"))  # p % 4 == 1: host-only


# ------------------------------------------------------------------ G2 ------

DST_G2 = b"QUUX-V01-CS02-with-BLS12381G2_XMD:SHA-256_SSWU_RO_"


def test_device_f2_sqrt_candidate():
    """Branchless Fp2 sqrt candidate == a true square root on squares."""
    import random

    from mathlib_tpu.host.fields import get_tower
    from mathlib_tpu.ops.hash import get_hash_g2_ctx

    ctx = get_hash_g2_ctx(SPEC)
    ht = get_tower(SPEC)
    rng = random.Random(11)
    roots = [
        (rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(6)
    ] + [(5, 0), (0, 7), (1, 1)]
    squares = [ht.f2_mul(r, r) for r in roots]
    a = np.concatenate([ctx.tw.f2_encode(s) for s in squares], axis=-1)
    cand = jax.jit(ctx.f2_sqrt_candidate)(jnp.asarray(a))
    got = ctx.tw.f2_decode(np.asarray(cand))
    for i, (s, r) in enumerate(zip(squares, roots)):
        assert ht.f2_mul(got[i], got[i]) == s, f"lane {i}: cand^2 != a"


def test_device_hash_to_g2_matches_host():
    """Device G2 pipeline == host hash_to_g2 (RFC 9380 J.10.1 transitively;
    the host path is pinned against the J.10.1 vectors in
    test_hash_vectors.py)."""
    from mathlib_tpu.ops.hash import get_hash_g2_ctx, hash_to_g2_batch

    hasher = get_hasher(SPEC)
    ctx = get_hash_g2_ctx(SPEC)
    msgs = [b"", b"abc", b"abcdef0123456789"]
    out = hash_to_g2_batch(SPEC, msgs, DST_G2)
    got = ctx.g2.decode_points(np.asarray(out))
    want = [hasher.hash_to_g2(m, DST_G2) for m in msgs]
    assert got == want


def test_device_hash_to_g1_bbs_batch_entry():
    """The public BBS batch entry point == host hash_to_g1_bbs exactly
    (XMD + from64Bytes + BE-sign SSWU + isogeny + cofactor)."""
    from mathlib_tpu.ops.hash import hash_to_g1_bbs_batch

    hasher = get_hasher(SPEC)
    ctx = get_hash_g1_ctx(SPEC)
    dst = b"BBS_BLS12381G1_XMD:BLAKE2B_SSWU_RO_"
    msgs = [b"", b"hello bbs", b"x" * 100, b"Chase!"]
    out = hash_to_g1_bbs_batch(SPEC, msgs, dst)
    got = ctx.g1.decode_points(np.asarray(out))
    want = [hasher.hash_to_g1_bbs(m, dst) for m in msgs]
    assert got == want
