"""Device pairing vs the exact host engine: bilinearity and batching.

Mirrors the reference's pairing properties (runPairingTest,
math_test.go:423-455) with the host engine as the bit-exact oracle.
"""

import random

import jax
import numpy as np
import pytest

from mathlib_tpu.host.engine import get_engine
from mathlib_tpu.ops.pairing import get_pairing_ctx


@pytest.fixture(params=["BLS12_381", "BN254"])
def curve(request):
    from mathlib_tpu.curves.params import get_spec

    return get_spec(request.param)


def _encode_pairs(ctx, pairs):
    """pairs of host ((P affine), (Q affine)) -> device coordinate arrays."""
    fp, tw = ctx.tw.fp, ctx.tw
    xP = np.concatenate([fp.encode(P[0]) for P, _ in pairs], axis=-1)
    yP = np.concatenate([fp.encode(P[1]) for P, _ in pairs], axis=-1)
    Qx = np.concatenate([tw.f2_encode(Q[0]) for _, Q in pairs], axis=-1)
    Qy = np.concatenate([tw.f2_encode(Q[1]) for _, Q in pairs], axis=-1)
    return xP, yP, Qx, Qy


@pytest.mark.slow  # full Miller+final-exp compile per curve
def test_pairing_matches_host(curve):
    eng = get_engine(curve)
    ctx = get_pairing_ctx(curve)
    rng = random.Random(1)
    a, b = rng.randrange(2, curve.r), rng.randrange(2, curve.r)
    P = eng.g1.mul(eng.gen_g1, a)
    Q = eng.g2.mul(eng.gen_g2, b)
    pairs = [(eng.gen_g1, eng.gen_g2), (P, Q)]
    xP, yP, Qx, Qy = _encode_pairs(ctx, pairs)
    out = ctx.tw.f12_decode(jax.jit(ctx.pairing)(xP, yP, Qx, Qy))
    assert out[0] == eng.pairing(eng.gen_g1, eng.gen_g2), "e(G1, G2) mismatch"
    assert out[1] == eng.pairing(P, Q), "e([a]G1, [b]G2) mismatch"
    # bilinearity through the host Gt: e([a]P, [b]Q) == e(P, Q)^(ab)
    assert out[1] == eng.gt_exp(out[0], a * b % curve.r)


@pytest.mark.slow  # full Miller+final-exp compile per curve
def test_miller_product_shared_final_exp(curve):
    """Batched pairing product (the Pairing2 seam, math.go:869-871):
    multiply Miller values, one shared final exp."""
    eng = get_engine(curve)
    ctx = get_pairing_ctx(curve)
    rng = random.Random(2)
    a = rng.randrange(2, curve.r)
    P = eng.g1.mul(eng.gen_g1, a)
    Pneg = eng.g1.neg(P)
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, curve.r))
    # e(P, Q) * e(-P, Q) == 1  (BLS-verify shape)
    pairs = [(P, Q), (Pneg, Q)]
    xP, yP, Qx, Qy = _encode_pairs(ctx, pairs)

    def verify(xp, yp, qx, qy):
        f = ctx.miller_loop(xp, yp, qx, qy)
        prod = ctx.tw.f12_mul(f[..., :1], f[..., 1:])
        return ctx.tw.f12_is_one(ctx.final_exp(prod))

    ok = np.asarray(jax.jit(verify)(xP, yP, Qx, Qy))
    assert bool(ok[0]) is True
